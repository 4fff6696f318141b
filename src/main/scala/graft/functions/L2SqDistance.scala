package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for SQUARED L2 distance of two float or
  * double vectors: one fused codegen loop — versus the HOF
  * formulation `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0,
  * _+_)`, which materializes an intermediate array per evaluation and
  * interprets two lambdas per element (HigherOrderFunctions never
  * enter whole-stage codegen). The PQ/IVF+PQ quantizer kernels
  * evaluate this k=64 times per subvector behind broadcast joins —
  * profiled r17: the two kernel stages of q_sim_ann_ivf_pq carried
  * 27 s + 22 s of task time at sf0.1, almost all of it zip_with
  * allocation + lambda interpretation (the CosineSimilarity lesson,
  * SURVEY.md §4 item 3, applied to the ADC distance).
  *
  * Semantics pinned bit-for-bit to the HOF twin (and so to the DuckDB
  * oracle): each element widens to double BEFORE the subtract, terms
  * accumulate sequentially left-to-right from 0.0 ((x−y)² is never
  * −0.0, so the 0.0 seed is absorbing exactly as in the fold), length
  * mismatch → null (zip_with pads with null, nulling the whole fold),
  * null element → null.
  */
case class L2SqDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // The kernel introduces nulls (length mismatch, null element)
  // regardless of input nullability; without this override, codegen
  // under non-nullable children assigns `ev.isNull = true` to a
  // constant-folded `false` slot and Janino rejects the class.
  override def nullable: Boolean = true

  private def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t               => t
  }
  private def mayContainNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }
  private def okType(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!okType(left.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"left argument must be array<float|double>, got ${left.dataType}")
    else if (!okType(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right argument must be array<float|double>, got ${right.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private def getD(x: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => x.getFloat(i).toDouble
    case _         => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    if (mayContainNullElems(left) || mayContainNullElems(right)) {
      var k = 0
      while (k < n) {
        if (x.isNullAt(k) || y.isNullAt(k)) return null
        k += 1
      }
    }
    val lt = elemOf(left); val rt = elemOf(right)
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = getD(x, lt, i) - getD(y, rt, i)
      acc += d * d; i += 1
    }
    acc
  }

  private def getExpr(arr: String, t: DataType, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dd = ctx.freshName("dd")
      val k = ctx.freshName("k")
      val nullScan =
        if (mayContainNullElems(left) || mayContainNullElems(right))
          s"""for (int $k = 0; $k < $a.numElements() && !${ev.isNull}; $k++) {
             |  if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; }
             |}""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |}
         |$nullScan
         |if (!${ev.isNull}) {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $dd = ${getExpr(a, elemOf(left), i)} - ${getExpr(b, elemOf(right), i)};
         |    $acc += $dd * $dd;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object L2SqDistance {
  /** Column-API entry point. */
  def l2sq_dist(a: Column, b: Column): Column =
    Bridge.column(L2SqDistance(Bridge.expression(a), Bridge.expression(b)))
}
