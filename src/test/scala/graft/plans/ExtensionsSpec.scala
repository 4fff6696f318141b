package graft.plans

import graft.SparkSpec
import graft.functions.TextSim
import org.apache.spark.sql.functions._

/** GraftExtensions: SQL-name resolution of the native Expressions and
  * the FuseHofCosine optimizer rewrite. The shared test session is
  * built with the extensions (SparkTestBase), so these run against
  * the same wiring Verify/Bench use.
  */
class ExtensionsSpec extends SparkSpec {

  test("native expressions resolve by SQL name via injectFunction") {
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(3.0D, 4.0D) AS ARRAY<FLOAT>),
        |                  CAST(array(3.0D, 4.0D) AS ARRAY<FLOAT>)) AS c,
        |       jaccard_coeff(array('a','b'), array('b','c')) AS j,
        |       size(minhash_signature(array('a','b'), 8)) AS m,
        |       size(shingles(array('a','b','c'), 2)) AS sh,
        |       simhash64(array('x','y')) AS s""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-12)
    assert(r.getInt(2) == 8)
    assert(r.getInt(3) == 2) // shingles: "a b", "b c"
    // simhash value is checked for determinism elsewhere; here just typed
    assert(!r.isNullAt(4))
  }

  test("FuseHofCosine rewrites the HOF cosine into the fused kernel") {
    val df = graft.Tables.embeddings(spark, sf)
    val probe = df.filter(col("vec_id") === 0).select(col("embedding").as("probe"))
    val hof = df.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        TextSim.cosine(col("embedding"), col("probe")).as("cos"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosinesimilarity") || optimized.contains("CosineSimilarity"),
      s"HOF cosine not fused:\n$optimized")
    assert(!optimized.toLowerCase.contains("aggregate(zip_with"),
      s"HOF tree survived:\n$optimized")
    // results bit-identical to the explicitly-native formulation
    val native = df.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        graft.functions.CosineSimilarity.cosine_sim(col("embedding"), col("probe")).as("cos"))
    assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty)
  }

  test("FuseHofCosine does not fire on double arrays (kernel is float-only)") {
    // Same HOF shape over ARRAY<DOUBLE>: the fused kernel reads via
    // getFloat, so the rule must leave the HOF tree alone — and the
    // un-rewritten HOF must still compute the right value.
    val df = spark.sql("SELECT array(3.0D, 4.0D) AS a, array(4.0D, 3.0D) AS b")
      .select(TextSim.cosine(col("a"), col("b")).as("cos"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("cosinesimilarity"),
      s"rule fired on ARRAY<DOUBLE>:\n$optimized")
    assert(math.abs(df.head().getDouble(0) - 24.0 / 25.0) < 1e-12)
  }

  test("FuseHofCosine leaves a bare dot product untouched") {
    val df = graft.Tables.embeddings(spark, sf).limit(5)
      .select(TextSim.dot(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("cosinesimilarity"), optimized)
    assert(df.collect().forall(_.getDouble(0) > 0))
  }
}
