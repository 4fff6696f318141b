package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Jaccard coefficient of two DISTINCT-element string arrays in one
  * fused pass: hash-set the left, count right-side hits,
  * |A∪B| = |A|+|B|-|A∩B| — vs size(array_intersect)/size(array_union)
  * which materializes two intermediate arrays per pair. Inputs must
  * already be distinct (shingle/token sets are); duplicate elements
  * would overcount.
  */
case class JaccardCoeff(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"arguments must be array<string>, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardCoeff.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardCoeff.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaccardCoeff {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < nb) { if (set.contains(b.getUTF8String(j))) inter += 1; j += 1 }
    inter.toDouble / (na + nb - inter)
  }

  def jaccard_coeff(a: Column, b: Column): Column =
    Bridge.column(JaccardCoeff(Bridge.expression(a), Bridge.expression(b)))
}
