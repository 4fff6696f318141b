package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash of a token array: one spec-stated hash per
  * token, 64 sign counters updated bitwise, packed into a long — a
  * single pass, vs the HOF formulation's per-token 64-wide zip_with
  * folds (TextSim.simhash64, kept as the semantic reference).
  *
  * The token hash is deliberately NOT an engine builtin (r7, was
  * xxhash64): two code-point Horner hashes mod 2147483647 / 2147483629
  * packed (h1 << 31) | h2 — the q_split_train auditability argument
  * applied to near-dup candidates. Any engine reproduces the
  * signature from the constants alone; the DuckDB oracle restates it
  * set-wise as Σ cp·m^(n−i) mod p, which is what moved
  * q_dedup_simhash from rows-only to a full hash-match.
  *
  * Multiset-weighted like the HOF twin: permuted token lists hash
  * identically. Deterministic (no seed needed — the constants ARE
  * the spec).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

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
    SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  private final val P1 = 2147483647L
  private final val M1 = 131L
  private final val P2 = 2147483629L
  private final val M2 = 137L

  /** Spec-stated token hash: Horner fold of the token's code points
    * under two (multiplier, prime) pairs, packed into one long. The
    * primes sit just under 2³¹, so each hash is near-uniform on its
    * full 31-bit field (a smaller prime would leave its top packed
    * bits biased toward 0 — measured to double the spurious
    * hamming-collision rate); every Horner intermediate stays < 2³⁸
    * and the packed value < 2⁶² (bits 62/63 always clear — their
    * sign counters only ever decrement, harmless). */
  private[functions] def tokenHash(t: String): Long = {
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      h1 = (h1 * M1 + cp) % P1
      h2 = (h2 * M2 + cp) % P2
      i += Character.charCount(cp)
    }
    (h1 << 31) | h2
  }

  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = tokenHashU(arr.getUTF8String(j))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))

  /** Column form of [[tokenHash]] — usable inside HOF lambdas (e.g.
    * q_fingerprint's min-of-shingle-hashes) with native codegen. */
  def token_hash(c: Column): Column = Bridge.column(TokenHash64(Bridge.expression(c)))

  /** UTF8String overload of [[tokenHash]] — the hot path for the
    * SimHash/MinHash kernels and the TokenHash64 codegen. Decodes
    * code points straight from the UTF-8 buffer (no String
    * allocation); agreement with the String form is pinned by a
    * multi-byte test in FunctionsSpec. Surrogate pairs cannot occur:
    * UTF-8 encodes supplementary characters as one 4-byte sequence =
    * one code point, exactly what String.codePointAt yields. */
  def tokenHashU(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = s.numBytes()
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) {
        cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); len = 2
      } else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); len = 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F); len = 4
      }
      h1 = (h1 * M1 + cp) % P1
      h2 = (h2 * M2 + cp) % P2
      i += len
    }
    (h1 << 31) | h2
  }
}

/** Scalar spec-stated string hash (SimHash64.tokenHash as a Catalyst
  * expression): the double code-point Horner mod the two largest
  * 31-bit primes, packed (h1 << 31) | h2. Shared by the SimHash
  * signature and q_fingerprint's min-shingle-hash, and restated in
  * SQL by their DuckDB oracles. */
case class TokenHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"argument must be string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    SimHash64.tokenHashU(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.tokenHashU($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
