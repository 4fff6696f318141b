package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q_table_evolve_rename's value contract, recomputed declaratively
  * in-engine (the driver's DuckDB hash is the real gate — this guards
  * the query/oracle pair's semantics before it leaves the repo). */
class EvolveRenameOracleSpec extends SparkSpec {
  test("q_table_evolve_rename equals its oracle's declarative recompute") {
    val got = graft.SparkEntry.queries("q_table_evolve_rename")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val b = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    val snap = b.unionAll(
      b.filter(col("k") % 103 === 0)
        .select((col("k") + 6000000L).as("k"), (col("price") + 1000.0).as("price")))
    val expect = snap.filter(col("k") % 97 =!= 0)
      .groupBy((col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("price"), 2).as("total"))
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(got == expect)
  }
}
