package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.ops.* packs; each pack pairs its Spark
  * implementation with its DuckDB oracle SQL.
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    ops.Core, ops.Joins, ops.Aggregates, ops.Windows, ops.Funcs,
    ops.Dedup, ops.Similarity, ops.TextStats, ops.Multimodal, ops.StreamTwins,
    ops.Custom, ops.Advanced, ops.Reshape, ops.Curation, ops.TrainPrep,
    ops.Search, ops.Formats, ops.SqlSuite, ops.Analytics, ops.Graph,
    ops.Stats, ops.Geo, ops.ScaleOps, ops.TableOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.Flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * Key uniqueness is ENFORCED: `toMap` would otherwise silently
    * keep the last pack's definition — a cross-pack name collision
    * once shadowed Advanced's q_merge_upsert with a new Analytics
    * operator and the registry count never moved (caught only by a
    * full-audit dir diff). Fail loudly instead. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    val dups = all.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate query keys across packs: ${dups.mkString(", ")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = packs.flatMap(_.oracles).toMap
}
