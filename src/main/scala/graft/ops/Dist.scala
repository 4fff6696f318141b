package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed formulations of operations that are single-partition
  * scale-killers in their naive window form.
  */
object Dist {

  /** Monotone range-bucket id in [0, p) for `o` ∈ [lo, hi].
    *
    * All arithmetic is forced into DOUBLE space BEFORE the subtract/
    * multiply: `(o - lo) * p` in the column's native integral type
    * wraps Long for key ranges near 2⁶³/p (silently non-monotone
    * buckets → wrong prefix sums), and a decimal cast would overflow
    * for double order columns beyond 1e38. Double ops never wrap and
    * every step (cast, −lo, ×p, ÷range, int-truncate of a
    * non-negative) is monotone non-decreasing — which is the ONLY
    * property bucketing needs: assignment may collapse adjacent huge
    * keys into one bucket (double granularity), but the downstream
    * within-bucket window + cross-bucket offsets reconstruct the
    * exact global order regardless of where boundaries fall. The
    * least() guard pins the top value into bucket p-1 when rounding
    * lands the quotient exactly on p.
    */
  private def bucketOf(o: Column, lo: Column, hi: Column, p: Int): Column =
    least(
      ((o.cast("double") - lo.cast("double")) * p /
        (hi.cast("double") - lo.cast("double") + 1d)).cast("int"),
      lit(p - 1))

  /** Two-phase distributed prefix sum: inclusive running total of
    * `valCol` (integral) in `orderCol` order, as `cumCol` — without a
    * global single-partition window at any point.
    *
    * Phase 0 buckets rows by a DATA-DERIVED monotone range bucket of
    * `orderCol` (against a broadcast 1-row min/max aggregate), so the
    * assignment is deterministic regardless of physical partitioning
    * or exchange reuse. Phase 1 computes running sums within each
    * bucket (keyed window = one hash shuffle); phase 2 broadcasts the
    * P-row per-bucket totals, turns them into exclusive offsets with
    * a P-row window, and adds them back. P = defaultParallelism.
    *
    * Requires `orderCol` values unique (they define the total order).
    */
  def prefixSum(df: DataFrame, orderCol: String, valCol: String,
      cumCol: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val bounds = df.agg(min(col(orderCol)).as("__lo"), max(col(orderCol)).as("__hi"))
    val parted = df.crossJoin(broadcast(bounds))
      .withColumn("__pid", bucketOf(col(orderCol), col("__lo"), col("__hi"), p))
      .drop("__lo", "__hi")
    val wIn = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = parted.withColumn("__in_sum", sum(col(valCol)).over(wIn))
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("__pid").agg(sum(col(valCol)).as("__psum"))
      .withColumn("__offset", coalesce(sum(col("__psum")).over(wOff), lit(0L)))
      .select("__pid", "__offset")
    withIn.join(broadcast(offsets), "__pid")
      .withColumn(cumCol, col("__in_sum") + col("__offset"))
      .drop("__pid", "__in_sum", "__offset")
  }

  /** Keyed twin of [[prefixSum]]: running total of `valCol` in
    * `orderCol` order WITHIN each group of `keyCols` — grouped
    * cumulative sums without ever windowing a whole group in one
    * task. Same two-phase shape: range-bucket the order column,
    * window within (key, bucket), then add back per-(key, bucket)
    * exclusive offsets computed from a (|keys|·P)-row broadcast
    * table (tiny whenever the key domain is category-bounded). The
    * sum type follows `valCol` (LONG or DECIMAL both exact).
    * Requires `orderCol` unique within each key group.
    */
  def prefixSumKeyed(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valCol: String, cumCol: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val bounds = df.agg(min(col(orderCol)).as("__lo"), max(col(orderCol)).as("__hi"))
    val parted = df.crossJoin(broadcast(bounds))
      .withColumn("__pid", bucketOf(col(orderCol), col("__lo"), col("__hi"), p))
      .drop("__lo", "__hi")
    val keyed = keyCols.map(col)
    val wIn = Window.partitionBy((keyed :+ col("__pid")): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = parted.withColumn("__in_sum", sum(col(valCol)).over(wIn))
    val wOff = Window.partitionBy(keyed: _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy((keyed :+ col("__pid")): _*)
      .agg(sum(col(valCol)).as("__psum"))
      .withColumn("__offset", sum(col("__psum")).over(wOff))
      .select((keyed :+ col("__pid") :+ col("__offset")): _*)
    withIn.join(broadcast(offsets), keyCols :+ "__pid")
      .withColumn(cumCol, col("__in_sum") + coalesce(col("__offset"), lit(0)))
      .drop("__pid", "__in_sum", "__offset")
  }
}
