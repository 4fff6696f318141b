package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: k min-hashes of a string array in ONE
  * pass — one spec-stated element hash plus k universal-hash mixes
  * ((A_i·h + B_i) mod P), versus the HOF formulation's k full
  * transform+array_min passes.
  *
  * Exists for plan-shape robustness as much as raw speed: a
  * single-node Expression stays cheap even when Catalyst's
  * CollapseProject duplicates it into every consumer (LSH banding
  * references the signature 8+ times — with the HOF tree that
  * exploded into hundreds of passes per row; SURVEY.md §4 item 2
  * predicted exactly this operator needs a custom Expression).
  *
  * The arithmetic is deliberately spec-stated (r7, was
  * xxhash64+splitmix mixes): element hash = SimHash64.tokenHash's
  * double Horner, mixers (A_i, B_i) = (131^(i+1), 137^(i+1)) mod the
  * Mersenne prime 2³¹−1 — a classic universal family, reproducible
  * in any engine from the constants alone, which is what lets the
  * DuckDB oracle restate the whole MinHash-LSH pipeline and
  * hash-match q_dedup_near. Empty input yields Long.MaxValue
  * sentinels.
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
  /** Universal-hash modulus: the Mersenne prime 2³¹−1. Mix products
    * A_i·h stay < 2⁶² — exact in Long AND in DuckDB BIGINT. */
  final val P = 2147483647L
  private final val MaxK = 64
  private def powTable(base: Long): Array[Long] = {
    val out = new Array[Long](MaxK)
    var v = 1L; var i = 0
    while (i < MaxK) { v = v * base % P; out(i) = v; i += 1 }
    out
  }
  /** A_i = 131^(i+1) mod P, B_i = 137^(i+1) mod P. */
  private val A = powTable(131L)
  private val B = powTable(137L)

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    require(k <= MaxK, s"minhash k must be <= $MaxK; got $k")
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = SimHash64.tokenHashU(arr.getUTF8String(j)) % P
      var i = 0
      while (i < k) {
        val m = (A(i) * h + B(i)) % P
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
