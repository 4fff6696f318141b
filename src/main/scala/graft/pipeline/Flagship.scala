package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship pipeline: the reference's dataflow shape
  * (/root/reference/task.ts:93-286) replayed over the testdata star
  * schema — scan → filter (A6, task.ts:122) → broadcast hash join
  * (A11, task.ts:114-125/228) → nested GeoJSON-style Feature
  * projection (A8, task.ts:168-195) → keyed dedup (A7,
  * task.ts:121-125) → summary aggregate.
  *
  * Dims (orders per key, customer) are broadcast so the fact scan
  * streams through a single stage; dedup is the only shuffle.
  */
object Flagship {
  def apply(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)

    val joined = li
      .join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))

    // camera→Feature analog: renames, constants, nested structs,
    // array-packed coordinates, whole-row-ish metadata embed.
    val features = joined.select(
      concat(lit("item-"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("id"),
      lit("Feature").as("type"),
      struct(
        lit("b-m-p-s-p-loc").as("type"),
        lit("m-g").as("how"),
        col("c_name").as("callsign"),
        (col("l_discount") * 3600).as("course"),
        struct(
          lit(50).as("range"),
          (col("l_tax") * 3600).as("azimuth"),
          lit("Verkada").as("type")).as("sensor"),
        concat_ws(",", array().cast("array<string>")).as("remarks"),
        struct(col("l_orderkey"), col("l_partkey"), col("o_totalprice"),
          col("c_mktsegment")).as("metadata")).as("properties"),
      struct(
        lit("Point").as("type"),
        array(col("o_totalprice") / 10000, col("c_acctbal") / 1000)
          .as("coordinates")).as("geometry"))

    features
      .dropDuplicates("id")
      .groupBy(col("properties.callsign").as("callsign"))
      .agg(count(lit(1)).as("n_features"))
      .orderBy(col("n_features").desc, col("callsign"))
  }
}
