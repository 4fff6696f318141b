package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The MV registry's plan-render KEY must carry relation identity: a
  * canonicalized LogicalRelation prints `Relation [attrs] parquet`
  * with no location, so without the leaf-identity suffix two
  * different parquet datasets with identical column types render the
  * same — and a query over one would silently answer from a view
  * materialized over the OTHER (observed: a partitioned re-write of
  * orders matched a view registered on orders.parquet itself). */
class MvRenderIdentitySpec extends SparkSpec {
  test("renders of same-shape plans over different datasets differ") {
    val orders = graft.Tables.orders(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_rid_").toString
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    val sink = spark.read.parquet(out)

    def baseRenderOf(df: org.apache.spark.sql.DataFrame): String = {
      val agg = df.queryExecution.optimizedPlan.canonicalized match {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case other => fail(s"not an aggregate: $other")
      }
      val (base, _, _) = MaterializedViews.peel(agg.child).get
      MaterializedViews.render(base)
    }

    val overOrders = orders
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"))
    val overSink = sink
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(baseRenderOf(overOrders) != baseRenderOf(overSink),
      "two different relations must not share a containment index key")

    // same dataset read twice still matches itself (the rewrite's
    // transparency depends on it)
    val again = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"))
    assert(baseRenderOf(overOrders) == baseRenderOf(again))
  }
}
