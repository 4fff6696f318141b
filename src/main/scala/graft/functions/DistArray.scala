package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst kernel for the k-means assignment hot loop: the
  * k-element array of squared Euclidean distances from one FLOAT
  * embedding to k broadcast centroids (k×dims doubles riding the
  * closure as a codegen reference object).
  *
  * This replaces the HOF formulation `transform(typedlit(centroids),
  * c => aggregate(zip_with(x, c, ...), ...))`, whose lambda functions
  * are interpreted per element — n·k·dims boxed closure calls per
  * assignment pass, and a plan literal of k·dims doubles re-analyzed
  * per Lloyd round. Here the inner product is one fused primitive
  * loop under whole-stage codegen.
  *
  * Semantics pinned to the HOF twin (and the driver-side differential
  * in SimilaritySpec): each float widens to double BEFORE the
  * subtract, accumulation is sequential left-to-right per centroid,
  * so distances are bit-identical. A null or wrong-width embedding
  * yields null (the HOF twin nulls every element through zip_with's
  * padding; downstream array_min is null either way).
  */
case class DistArray(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // The kernel itself introduces nulls (wrong-width or null-element
  // input) regardless of the child's nullability. Without this,
  // Catalyst narrows the slot to non-nullable downstream of an
  // isnotnull filter and the generated `ev.isNull = true` assigns to
  // the literal `false` — Janino rejects the class and the whole
  // stage silently falls back to interpreted eval.
  override def nullable: Boolean = true

  // True when the child's array type admits null elements; the
  // null-element scan below is emitted only in that case, so plans
  // over containsNull=false embeddings pay nothing for it.
  private def childMayContainNullElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == ArrayType(FloatType, false) ||
        child.dataType == ArrayType(FloatType, true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"argument must be array<float>, got ${child.dataType}")

  private def dims: Int = if (centroids.isEmpty) 0 else centroids(0).length

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dims) return null
    if (childMayContainNullElems) {
      // null element -> null result, matching the HOF twin where
      // zip_with propagates the null through the fold (getFloat on a
      // null slot would silently read 0.0 and fabricate a distance)
      var i = 0
      while (i < dims) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Double](centroids.length)
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var acc = 0.0; var i = 0
      while (i < dims) {
        val d = x.getFloat(i).toDouble - c(i)
        acc += d * d; i += 1
      }
      out(j) = acc; j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val nullScan = if (childMayContainNullElems)
        s"""for (int $k = 0; $k < $dims && !${ev.isNull}; $k++) {
           |  if ($a.isNullAt($k)) { ${ev.isNull} = true; }
           |}""".stripMargin
      else ""
      s"""
         |if ($a.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |}
         |$nullScan
         |if (!${ev.isNull}) {
         |  double[] $out = new double[${centroids.length}];
         |  for (int $j = 0; $j < ${centroids.length}; $j++) {
         |    double[] $c = $mat[$j];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      double $d = (double) $a.getFloat($i) - $c[$i];
         |      $acc += $d * $d;
         |    }
         |    $out[$j] = $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DistArray =
    copy(child = newChild)
}

object DistArray {
  def dist_array(x: Column, centroids: Seq[Seq[Double]]): Column =
    Bridge.column(DistArray(Bridge.expression(x),
      centroids.map(_.toArray).toArray))
}
