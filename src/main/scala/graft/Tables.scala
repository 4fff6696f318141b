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
  /** events.ts has shipped in two physical forms across fixture
    * generations: TIMESTAMP(NANOS) (readable only as raw-nanos BIGINT
    * under the legacy conf [[GraftSession]] sets) and, since the
    * round-6 refresh, plain TIMESTAMP(MICROS) (surfacing as NTZ — no
    * tz metadata in the file). Dispatch on the observed type so the
    * loader — not every downstream query — owns the difference, and
    * normalize to session-local TimestampType either way (UTC
    * session, so NTZ→LTZ is value-preserving and the µs values match
    * what DuckDB reads for the oracle). The nanos arm keeps `div`
    * integral: a double roundtrip would lose precision on
    * 1.7e18-scale nanos. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        // Fail fast: an unanticipated physical encoding (INT96, millis,
        // …) flowing through unnormalized would silently skew every
        // downstream time query. New fixture encodings must be added
        // here, where the loader owns the normalization.
        throw new IllegalStateException(
          s"events.ts has unexpected physical type $other; " +
            "add an explicit normalization arm in Tables.events")
    }
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
