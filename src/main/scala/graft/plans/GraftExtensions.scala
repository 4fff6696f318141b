package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}

/** The engine's SparkSessionExtensions (SURVEY.md §4 "custom pieces"):
  *
  * 1. injectFunction — the native codegen Expressions
  *    (cosine_sim, jaccard_coeff, simhash64, shingles,
  *    minhash_signature) registered under SQL names, so the
  *    SQL-string surface (q_sql_tpch-style users) gets them without
  *    touching the Scala DSL.
  * 2. injectOptimizerRule — [[FuseHofCosine]], which rewrites the
  *    three-pass higher-order-function cosine formulation
  *    (aggregate ∘ zip_with for dot and both norms) into the fused
  *    single-pass CosineSimilarity kernel whenever a plan contains
  *    it. Users can write the declarative HOF version and still run
  *    the codegen'd loop.
  *
  * Activate with `.withExtensions(new GraftExtensions)` at session
  * build, or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("jaccard_coeff"),
      new ExpressionInfo(classOf[JaccardCoeff].getName, "jaccard_coeff"),
      (args: Seq[Expression]) => JaccardCoeff(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (args: Seq[Expression]) => Shingles(args(0), litInt(args(1), "shingles n"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) =>
        MinHashSignature(args(0), litInt(args(1), "minhash k"))))
    ext.injectOptimizerRule(_ => FuseHofCosine)
    // 3. RewriteToMaterializedView — exact-fingerprint MV rewriting
    //    (see plans/MaterializedViews.scala); inert until a view is
    //    registered.
    ext.injectOptimizerRule(s => new RewriteToMaterializedView(s))
  }
}

/** Rewrites TextSim.cosine's declarative HOF tree —
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (s,x)->s+x)` for the dot
  * product and both norms, divided — into the single-pass fused
  * [[CosineSimilarity]] Expression. Three array traversals (plus
  * Catalyst's possible per-consumer duplication of each) become one
  * codegen'd loop with identical arithmetic order, so results are
  * bit-identical (proven by q_sim_search vs q_sim_search_native
  * sharing one oracle).
  */
object FuseHofCosine extends Rule[LogicalPlan] {

  /** Strips the double-widening casts TextSim.dot inserts (they
    * survive on float inputs, are simplified away on double ones). */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case other => other
  }

  private def isLambdaVar(e: Expression): Boolean =
    stripCast(e).isInstanceOf[NamedLambdaVariable]

  /** Matches the aggregate∘zip_with dot-product shape and yields the
    * two array operands. */
  private object Dot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(mul: Multiply, _, _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(add: Add, _, _),
            LambdaFunction(finish, _, _))
          if zero == 0.0 &&
            isLambdaVar(mul.left) && isLambdaVar(mul.right) &&
            isLambdaVar(add.left) && isLambdaVar(add.right) &&
            finish.isInstanceOf[NamedLambdaVariable] =>
        Some((l, r))
      case _ => None
    }
  }

  /** CosineSimilarity reads elements via ArrayData.getFloat, and the
    * optimizer does not re-run checkInputDataTypes on rewritten
    * output — so the fusion must only fire on ARRAY<FLOAT> operands.
    * stripCast removes the double-widening casts, which makes the
    * structural pattern also match double-array inputs; without this
    * guard those would be silently miscompiled. */
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case Divide(Dot(a, b), Multiply(Sqrt(Dot(a2, a3)), Sqrt(Dot(b2, b3)), _), _)
          if a2.semanticEquals(a) && a3.semanticEquals(a) &&
            b2.semanticEquals(b) && b3.semanticEquals(b) &&
            isFloatArray(a) && isFloatArray(b) =>
        CosineSimilarity(a, b)
    }
}
