package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial operators. The engine has no geometry type; points are
  * planar integer coordinates derived deterministically from keys
  * (the same construction the oracle states), and distance is exact
  * integer arithmetic — the operator of interest is the JOIN
  * decomposition, not trigonometry.
  *
  *  - q_grid_join: radius join — for every customer point, the
  *    suppliers within distance R — via uniform-grid bucketing with
  *    cell size R: each supplier is replicated to its 3×3 neighbor
  *    cells, each customer probes exactly its own cell, and any pair
  *    within R is guaranteed co-bucketed (|Δcell| ≤ 1 per axis when
  *    point distance < cell size). The per-pair exact d² ≤ R² filter
  *    then removes false candidates. This is the standard distributed
  *    spatial-join plan (grid/PBSM): candidate cost is density-
  *    bounded (cells × local occupancy), never |C|×|S|, and the
  *    replicate-the-small-side choice keeps the build side 9×|S|
  *    rows — broadcastable here, a keyed shuffle join at 100 TB. The
  *    DuckDB oracle runs the brute-force quadratic join, so the
  *    hash-compare PROVES the grid decomposition loses no pair.
  */
object Geo extends QueryPack {

  /** World size (coordinates in [0, L)²) and join radius. */
  private val L = 1000L
  private val R = 100L

  private def points(df: DataFrame, key: String, m1: Long, m2: Long): DataFrame =
    df.select(col(key),
      (col(key) * m1 % L).as("x"), (col(key) * m2 % L).as("y"))

  private def gridJoin(s: SparkSession, d: String): DataFrame = {
    val cust = points(Tables.customer(s, d), "c_custkey", 131L, 9973L)
      .withColumn("jx", (col("x") / R).cast("long"))
      .withColumn("jy", (col("y") / R).cast("long"))
    val supp = points(Tables.supplier(s, d), "s_suppkey", 137L, 9967L)
      .select(col("s_suppkey"), col("x").as("sx"), col("y").as("sy"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("s_suppkey"), col("sx"), col("sy"),
        ((col("sx") / R).cast("long") + col("dx")).as("jx"),
        ((col("sy") / R).cast("long") + col("dy")).as("jy"))
    val pairs = cust.join(broadcast(supp), Seq("jx", "jy"))
      .withColumn("d2",
        (col("x") - col("sx")) * (col("x") - col("sx")) +
          (col("y") - col("sy")) * (col("y") - col("sy")))
      .filter(col("d2") <= R * R)
    pairs.groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_within"),
        min(col("d2")).as("min_d2"),
        min(struct(col("d2"), col("s_suppkey"))).as("nearest_pair"))
      .select(col("c_custkey"), col("n_within"), col("min_d2"),
        col("nearest_pair.s_suppkey").as("nearest_supp"))
      .orderBy(col("n_within").desc, col("c_custkey"))
      .limit(100)
  }

  private def gridJoinOracle: String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_custkey * 131 % $L AS x, c_custkey * 9973 % $L AS y
       |  FROM customer),
       |s AS (
       |  SELECT s_suppkey, s_suppkey * 137 % $L AS sx, s_suppkey * 9967 % $L AS sy
       |  FROM supplier),
       |p AS (
       |  SELECT c_custkey, s_suppkey,
       |         (x - sx) * (x - sx) + (y - sy) * (y - sy) AS d2
       |  FROM c CROSS JOIN s
       |  WHERE (x - sx) * (x - sx) + (y - sy) * (y - sy) <= ${R * R}),
       |agg AS (
       |  SELECT c_custkey, COUNT(*) AS n_within, MIN(d2) AS min_d2
       |  FROM p GROUP BY c_custkey),
       |near AS (
       |  SELECT c_custkey, s_suppkey AS nearest_supp
       |  FROM p
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY d2, s_suppkey) = 1)
       |SELECT a.c_custkey, n_within, min_d2, nearest_supp
       |FROM agg a JOIN near n ON a.c_custkey = n.c_custkey
       |ORDER BY n_within DESC, a.c_custkey
       |LIMIT 100""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_grid_join" -> gridJoin,
  )

  override val oracles: Map[String, String] = Map(
    "q_grid_join" -> gridJoinOracle,
  )
}
