package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: k min-hashes of a string array in ONE
  * pass — one xxhash64 per element plus k universal-hash mixes
  * (h·A_i + B_i with odd multipliers), versus the HOF formulation's
  * k full transform+array_min passes.
  *
  * Exists for plan-shape robustness as much as raw speed: a
  * single-node Expression stays cheap even when Catalyst's
  * CollapseProject duplicates it into every consumer (LSH banding
  * references the signature 8+ times — with the HOF tree that
  * exploded into hundreds of passes per row; SURVEY.md §4 item 2
  * predicted exactly this operator needs a custom Expression).
  *
  * Deterministic: fixed seed, mixers derived from splitmix64
  * constants. Empty input yields an array of Long.MaxValue sentinels.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
    MinHashSignature.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($a, $k);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  private final val Seed = 42L
  // splitmix64 increment / mix constants; multipliers forced odd
  final val MulBase = 0x9E3779B97F4A7C15L
  final val AddBase = 0xBF58476D1CE4E5B9L

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
      var i = 0
      while (i < k) {
        val m = h * (MulBase * (2 * i + 1)) + AddBase * i
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  def minhash_signature(c: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), k))
}
