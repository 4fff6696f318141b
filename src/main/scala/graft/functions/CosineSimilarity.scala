package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity of two FLOAT
  * vectors (SURVEY.md §4 item 3): one fused loop computing dot and
  * both norms, with whole-stage codegen via doGenCode — vs the HOF
  * formulation's three separate fold passes over zip_with copies.
  *
  * Semantics pinned to the HOF/DuckDB-oracle version: each float is
  * widened to double BEFORE multiply, accumulation is sequential
  * left-to-right, so results are bit-identical to
  * TextSim.cosine / the DuckDB list_sum oracle.
  *
  * Elements are assumed non-null (embedding vectors); a null array
  * yields null via BinaryExpression's default null handling.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // The kernel introduces nulls (length mismatch, null element)
  // regardless of input nullability; without this override, codegen
  // under non-nullable children assigns `ev.isNull = true` to a
  // constant-folded `false` slot and Janino rejects the class.
  override def nullable: Boolean = true

  private def mayContainNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(FloatType, false) ||
        left.dataType == ArrayType(FloatType, true)) {
      if (right.dataType == ArrayType(FloatType, false) ||
          right.dataType == ArrayType(FloatType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right argument must be array<float>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"left argument must be array<float>, got ${left.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch -> null, matching the HOF twin (zip_with pads
    // with null, nulling the whole fold) — a corrupt embedding must
    // fail loudly, not yield a plausible truncated similarity
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    if (mayContainNullElems(left) || mayContainNullElems(right)) {
      // null element -> null result (getFloat on a null slot reads
      // 0.0 and would fabricate a plausible truncated similarity)
      var k = 0
      while (k < n) {
        if (x.isNullAt(k) || y.isNullAt(k)) return null
        k += 1
      }
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
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
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
