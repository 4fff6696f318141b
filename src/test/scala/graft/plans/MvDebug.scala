package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MvDebug extends SparkSpec {
  test("dump plans") {
    val q = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
    println("=== OPTIMIZED ===")
    println(q.queryExecution.optimizedPlan.treeString)
    println("=== CANONICAL ===")
    println(q.queryExecution.optimizedPlan.canonicalized.treeString)
    val v = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
    println("=== VIEW CANONICAL ===")
    println(v.queryExecution.optimizedPlan.canonicalized.treeString)
  }
}
