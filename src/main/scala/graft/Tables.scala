package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md /
  * FIXTURES.md). One parquet file per table under the sf directory.
  *
  * Scale posture: these are plain parquet scans — Catalyst handles
  * column pruning and predicate pushdown into the vectorized reader,
  * so every query should express filters/projections on top of these
  * rather than materializing intermediates.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts is physically TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects. Read it as raw nanos (legacy conf,
    * owned by [[GraftSession]] at session build) and truncate to
    * microseconds — the same ns→µs truncation DuckDB applies on read,
    * so oracle values agree. `div` keeps the arithmetic integral (a
    * double roundtrip would lose precision on 1.7e18-scale nanos). */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): build the session via " +
        "GraftSession.builder (sets spark.sql.legacy.parquet.nanosAsLong)")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Registers `name` as a temp view whose view NAME is keyed by the
    * data dir, and returns that name for SQL interpolation. A
    * session-global fixed name ("v_orders") is a shared mutable
    * binding: two queries planned concurrently against different
    * scale-factor dirs would clobber each other. Dir-keyed names make
    * registration idempotent per (table, dir) and collision-free
    * across dirs. */
  def view(s: SparkSession, d: String, name: String): String = {
    val v = s"v_${name}_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    table(s, d, name).createOrReplaceTempView(v)
    v
  }
}
