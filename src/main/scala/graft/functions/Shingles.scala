package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct n-token shingles of a string array: one pass, one
  * UTF8String concat per shingle, hash-set dedup — vs the HOF
  * formulation's sequence + per-index slice + array_join +
  * array_distinct (O(n²) per row, and hazardous when Catalyst
  * duplicates the tree into every consumer; see MinHashSignature).
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"argument must be array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Shingles.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Shingles.compute($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Shingles {
  private val Space = UTF8String.fromString(" ")

  /** Matches the HOF semantics: windows of size n joined with a
    * space; inputs shorter than n yield the whole-input join (the
    * HOF's greatest(size-n+1, 1) guard); result distinct, first
    * occurrence order. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val nOut = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](nOut * 2)
    var i = 0
    while (i < nOut) {
      val w = math.min(n, len - i)
      val parts = new Array[UTF8String](math.max(w, 0))
      var j = 0
      while (j < w) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def shingles(c: Column, n: Int): Column =
    Bridge.column(Shingles(Bridge.expression(c), n))
}
