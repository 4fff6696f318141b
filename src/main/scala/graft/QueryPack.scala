package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** A family of named queries plus their DuckDB oracle SQL.
  * SparkEntry concatenates all packs. Keys registered in `queries`
  * but absent from `oracles` get the driver's weaker rows-only check
  * (allowed for non-SQL-expressible ops).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}

/** Determinism helpers for the DuckDB hash-compare (SURVEY.md §2).
  *
  * FP summation order differs between Spark (parallel partial aggs)
  * and DuckDB (its own vectorized order), so raw SUM(double) is not
  * hash-stable. Casting each addend to DECIMAL makes the sum exact
  * and order-independent in both engines; the final cast back to
  * DOUBLE is correctly rounded on both sides, hence bit-identical.
  */
object Det {
  /** Order-independent exact sum of a double column: per-row cast to
    * DECIMAL(18,scale) (half-up, same in Spark and DuckDB), exact
    * decimal addition, correctly-rounded cast back to double. */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Oracle-side twin of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Deterministic average: exact decimal sum divided by count, both
    * sides perform the identical double division. */
  def davg(c: Column, scale: Int = 6): Column =
    (sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c))

  def davgSql(expr: String, scale: Int = 6): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($expr))"

  /** Cross-engine-deterministic 4-decimal rounding: floor(x·10⁴+0.5)
    * /10⁴ — every step is an IEEE op on a bit-identical double, so
    * both engines agree ALWAYS, including at .00005 ties where
    * Spark's exact HALF_UP and DuckDB's multiply-based ROUND can
    * split (observed on ratio-valued columns at sf0.1). Use for
    * rounded ratios/products of ratios; plain ROUND is fine for
    * decimal-exact sums. */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000

  def r4Sql(expr: String): String = s"(FLOOR(($expr) * 10000 + 0.5) / 10000)"
}
