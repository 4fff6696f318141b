package graft.ops

import graft.{QueryPack, Tables}
import graft.functions.{CosineSimilarity, WeightedAvg}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Custom-function surface: the typed Aggregator UDAF and the native
  * codegen Expression, each exercised through a query.
  */
object Custom extends QueryPack {

  /** Weighted average via Aggregator UDAF (partial+final merge like a
    * built-in). Oracle: SUM(x*w)/SUM(w). The quotient normalizes the
    * FP summation-order noise to ~1e-10 relative, far inside the
    * ROUND(4) guard band. */
  private def udafWavg(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(new WeightedAvg(),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(graft.Det.r4(wavg(col("l_extendedprice"), col("l_quantity"))).as("wavg_price"))
      .orderBy("l_returnflag")
  }

  /** q_sim_search twin through the native CosineSimilarity expression
    * (single fused codegen loop) — same oracle as the HOF version,
    * proving bit-identical semantics. */
  private def simSearchNative(s: SparkSession, d: String): DataFrame = {
    val probe = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    Tables.embeddings(s, d)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        graft.Det.r4(CosineSimilarity.cosine_sim(col("embedding"), col("probe"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
  }

  /** q_topk's semantics through the bounded-heap TopK Aggregator:
    * partial buffers of k rows -> shuffle carries k rows per
    * group×partition, not the whole table. Shares q_topk's oracle —
    * two physical strategies, one verified result. */
  private def topkAgg(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKByPrice(3),
      Encoders.product[graft.functions.LineRef])
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(topk(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber")).as("top"))
      .select(col("l_returnflag"), col("l_linestatus"),
        posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("pos") + 1).cast("int").as("rk"),
        col("r.okey").as("l_orderkey"), col("r.lineno").as("l_linenumber"),
        col("r.price").as("l_extendedprice"))
      .orderBy("l_returnflag", "l_linestatus", "rk")
  }

  override val queries: Map[String, Q] = Map(
    "q_udaf_wavg"        -> udafWavg,
    "q_sim_search_native" -> simSearchNative,
    "q_topk_agg"         -> topkAgg,
  )

  override val oracles: Map[String, String] = Map(
    "q_udaf_wavg" ->
      s"""SELECT l_returnflag,
        |       ${graft.Det.r4Sql("SUM(l_extendedprice * l_quantity) / SUM(l_quantity)")} AS wavg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_sim_search_native" -> Similarity.oracles("q_sim_search"),
    "q_topk_agg"          -> Core.oracles("q_topk"),
  )
}
