package graft.ops

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-operations tier: the queries an operator of a 100 TB
  * lakehouse runs ABOUT the data rather than on it — data-layout
  * clustering, compaction planning, partition-skew diagnosis,
  * equi-depth binning, deterministic dataset splits, and robust
  * (MAD-based) outlier detection. Every query is oracle-checked
  * (exact integer / pinned-double arithmetic on both sides), and
  * every rank/percentile/cumulative construction rides
  * [[Dist.prefixSum]] / [[Dist.prefixSumKeyed]] — no query here ever
  * windows unbounded data in one task.
  *
  *  - q_zorder: Morton (Z-order) interleaving of two dimensions into
  *    one clustering key — the standard multi-dimensional layout
  *    trick (Bayer/Markl UB-tree lineage; used by modern lakehouse
  *    OPTIMIZE ZORDER): sorting by the interleaved key gives files
  *    whose min/max ranges are TIGHT IN BOTH dimensions, so scans
  *    filtered on either column prune row groups. The query computes
  *    the key with pure bit arithmetic and PROVES the locality: per
  *    z-tile spans are bounded by construction (top 2k z-bits pin k
  *    high bits of each dimension).
  *  - q_skew_audit: join-key skew diagnosis over per-key counts —
  *    top-1/top-10 share, max/mean ratio, and the exact Gini
  *    coefficient. Gini needs every key's rank by count; at 100 TB
  *    the key domain itself is billions of rows, so ranks come from
  *    the distributed prefix sum over per-key counts (the q_spearman
  *    machinery), never a global window.
  *  - q_file_compaction: bin-packing planner for small-file
  *    compaction — files in layout order are assigned to
  *    target-sized output groups by exclusive-prefix-sum division
  *    (group = ⌊excl_cum / target⌋). One pass, no loop over files on
  *    the driver; the group id is a pure function of the running
  *    total, so the plan is deterministic and the assignment
  *    parallelizes with the prefix sum.
  *  - q_length_buckets: equi-depth (NTILE) token-length bucketing of
  *    documents — the binning step of length-aware batch packing for
  *    LLM training. Spark's ntile() is a window function requiring a
  *    global sort+window at full width; here the bucket id is
  *    computed ARITHMETICALLY from the distributed rank (SQL NTILE's
  *    exact remainder-to-early-buckets rule), checked against
  *    DuckDB's native NTILE.
  *  - q_split_train: deterministic train/val/test split via a
  *    mixed-congruential hash of the document id — reproducible on
  *    any engine from the spec alone (no engine hash function), so
  *    the oracle states the identical arithmetic. Map-side only: at
  *    100 TB the split adds zero shuffles to a pipeline.
  *  - q_mad: per-group robust outlier detection via the median
  *    absolute deviation — median by distributed rank-selection
  *    (per-value counts + keyed prefix sum, the q_winsorize shape),
  *    then the SAME machinery again on |x − median|, then a
  *    broadcast-bounds outlier count. ONE scan of the fact table
  *    total (deviations and outliers ride the per-value counts) and
  *    no per-group buffering anywhere, vs the textbook
  *    two-nested-medians which buffers a group twice.
  */
object ScaleOps extends QueryPack {

  // ---- q_zorder ---------------------------------------------------

  /** Bits per dimension; coordinates live in [0, 2^ZBits). */
  private val ZBits = 10
  /** Tile = top TileBits of the z-value: fixes TileBits/2 high bits
    * of each dimension → per-tile span ≤ 2^(ZBits − TileBits/2). */
  private val TileBits = 6

  /** Morton-interleave two ZBits-wide non-negative ints: bit i of x
    * lands at z-bit 2i, bit i of y at 2i+1. Sum of disjoint powers of
    * two — plain + is bit-OR here, and every term is codegen'd
    * integer arithmetic (no UDF, no loop at runtime: the fold builds
    * ONE expression tree of 2·ZBits shift/mask terms). */
  private[ops] def morton(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  private def mortonSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Derived planar coordinates (same key-spreading construction as
    * Geo): deterministic, stated identically in the oracle. */
  private def zorder(s: SparkSession, d: String): DataFrame = {
    val side = 1L << ZBits
    val pts = Tables.part(s, d).select(
      col("p_partkey"),
      (col("p_partkey") * 131L % side).as("x"),
      (col("p_partkey") * 9973L % side).as("y"))
    val tiled = pts
      .withColumn("z", morton(col("x"), col("y")))
      .withColumn("tile", shiftright(col("z"), 2 * ZBits - TileBits))
    // Per-tile extent proves the layout property a scan planner
    // exploits: max−min span in EACH dimension is ≤ 2^(ZBits −
    // TileBits/2) (128 here), vs ~full-range spans under any
    // single-column or hash layout — i.e. z-sorted files prune on
    // both columns. LayoutSpec asserts the bound for every tile.
    tiled.groupBy(col("tile"))
      .agg(count(lit(1)).as("n_parts"),
        min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
        min(col("y")).as("y_lo"), max(col("y")).as("y_hi"),
        min(col("z")).as("z_lo"), max(col("z")).as("z_hi"))
      .withColumn("x_span", col("x_hi") - col("x_lo"))
      .withColumn("y_span", col("y_hi") - col("y_lo"))
      .orderBy(col("tile"))
  }

  private def zorderOracle: String = {
    val side = 1L << ZBits
    s"""WITH pts AS (
       |  SELECT p_partkey,
       |         p_partkey * 131 % $side AS x,
       |         p_partkey * 9973 % $side AS y
       |  FROM part),
       |z AS (
       |  SELECT p_partkey, x, y, ${mortonSql("x", "y")} AS z
       |  FROM pts),
       |t AS (
       |  SELECT x, y, z, z >> ${2 * ZBits - TileBits} AS tile FROM z)
       |SELECT tile, COUNT(*) AS n_parts,
       |       MIN(x) AS x_lo, MAX(x) AS x_hi,
       |       MIN(y) AS y_lo, MAX(y) AS y_hi,
       |       MIN(z) AS z_lo, MAX(z) AS z_hi,
       |       MAX(x) - MIN(x) AS x_span,
       |       MAX(y) - MIN(y) AS y_span
       |FROM t
       |GROUP BY tile
       |ORDER BY tile""".stripMargin
  }

  // ---- q_skew_audit -----------------------------------------------

  /** Exact Gini + share diagnostics over lineitem's supplier-key
    * frequency distribution. The rank of every key by (count, key)
    * comes from [[Dist.prefixSum]] of a constant-1 column over the
    * packed order key count·(maxKey+1)+key — unique, monotone in
    * (count, key), and data-derived (no fixed-width assumption; the
    * packing is exact while totalRows·maxKey < 2^63, far beyond any
    * real key-frequency table since this runs on per-key COUNTS, not
    * rows). Gini = 2·Σ(rank·cnt)/(n·total) − (n+1)/n over
    * ascending-count ranks — single shuffle to per-key counts, then
    * prefix-sum machinery on the (much smaller) key domain. */
  private def skewAudit(s: SparkSession, d: String): DataFrame = {
    val cnts = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
    val maxKey = cnts.agg(max(col("l_suppkey")).as("__mk"))
    // DECIMAL(38,0) pack: cnt·(maxKey+1)+key in Long wraps once
    // totalRows·maxKey crosses 2^63 (conceivable for a key-frequency
    // table over a 100 TB fact with a wide key domain); decimal is
    // exact to 10^38 and stays a valid window order key
    val ordered = cnts.crossJoin(broadcast(maxKey))
      .withColumn("ord",
        col("cnt").cast("decimal(38,0)") * (col("__mk") + 1L) + col("l_suppkey"))
      .withColumn("one", lit(1L))
      .drop("__mk")
    val ranked = Dist.prefixSum(ordered, "ord", "one", "rank")
    val audit = ranked.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"),
      sum(col("rank") * col("cnt")).as("src"))
    val top10 = ranked.crossJoin(broadcast(audit.select(col("n_keys").as("__nk"))))
      .filter(col("rank") > col("__nk") - 10)
      .agg(sum(col("cnt")).as("top10_rows"))
    val nkD = col("n_keys").cast("double")
    val totD = col("total_rows").cast("double")
    audit.crossJoin(broadcast(top10)).select(
      col("n_keys"), col("total_rows"),
      Det.r4(col("max_cnt").cast("double") / totD).as("top1_share"),
      Det.r4(col("top10_rows").cast("double") / totD).as("top10_share"),
      Det.r4(col("max_cnt").cast("double") * nkD / totD).as("max_over_avg"),
      Det.r4(col("src").cast("double") * 2 / (nkD * totD) -
        (nkD + 1) / nkD).as("gini"))
  }

  private def skewAuditOracle: String =
    s"""WITH c AS (
       |  SELECT l_suppkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
       |r AS (
       |  SELECT k, cnt, ROW_NUMBER() OVER (ORDER BY cnt, k) AS rnk FROM c),
       |a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       |         CAST(SUM(cnt) AS BIGINT) AS total_rows,
       |         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
       |         CAST(SUM(rnk * cnt) AS BIGINT) AS src
       |  FROM r),
       |t AS (
       |  SELECT CAST(SUM(cnt) AS BIGINT) AS top10_rows
       |  FROM r, a WHERE rnk > n_keys - 10)
       |SELECT n_keys, total_rows,
       |       ${Det.r4Sql("CAST(max_cnt AS DOUBLE) / CAST(total_rows AS DOUBLE)")} AS top1_share,
       |       ${Det.r4Sql("CAST(top10_rows AS DOUBLE) / CAST(total_rows AS DOUBLE)")} AS top10_share,
       |       ${Det.r4Sql("CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(total_rows AS DOUBLE)")} AS max_over_avg,
       |       ${Det.r4Sql("CAST(src AS DOUBLE) * 2 / (CAST(n_keys AS DOUBLE) * CAST(total_rows AS DOUBLE)) - (CAST(n_keys AS DOUBLE) + 1) / CAST(n_keys AS DOUBLE)")} AS gini
       |FROM a, t""".stripMargin

  // ---- q_file_compaction ------------------------------------------

  /** Target output size for one compacted group (bytes). */
  private val CompactTarget = 4L << 20
  /** Modeled bytes per row (the planner's input is a file listing; in
    * the fixture each order-DAY stands in for one small file). */
  private val BytesPerRow = 4096L

  /** Sorted-fill compaction plan: files (per-day row groups) in day
    * order fill 4 MiB output groups; a file belongs to group
    * ⌊exclusive_cum / target⌋. The running total comes from the
    * distributed prefix sum, so planning 10M files is a prefix-sum,
    * not a driver loop; groups are contiguous in layout order (what
    * keeps min/max pruning intact after compaction). Oversize by at
    * most one file per group — the standard accepted slack. */
  private def fileCompaction(s: SparkSession, d: String): DataFrame = {
    val files = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"))
      .groupBy(col("day")).agg((count(lit(1)) * BytesPerRow).as("bytes"))
      .withColumn("ordday", datediff(col("day"), to_date(lit("1970-01-01"))))
    // integer `div` of the exclusive prefix — exact at ANY scale (the
    // former double-floor was exact only below 2^53 cumulative bytes;
    // `/` on longs would be double division again)
    val cum = Dist.prefixSum(files, "ordday", "bytes", "cum")
      .withColumn("grp", expr(s"(cum - bytes) div ${CompactTarget}L"))
    cum.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("bytes")).as("group_bytes"),
        min(col("day")).as("day_lo"), max(col("day")).as("day_hi"))
      .orderBy(col("grp"))
  }

  private def fileCompactionOracle: String =
    s"""WITH f AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |         COUNT(*) * $BytesPerRow AS bytes
       |  FROM orders GROUP BY 1),
       |c AS (
       |  SELECT day, bytes,
       |         CAST(SUM(bytes) OVER (ORDER BY day) AS BIGINT) AS cum
       |  FROM f),
       |g AS (
       |  SELECT day, bytes,
       |         CAST((cum - bytes) // $CompactTarget AS BIGINT) AS grp
       |  FROM c)
       |SELECT grp, COUNT(*) AS n_files,
       |       CAST(SUM(bytes) AS BIGINT) AS group_bytes,
       |       MIN(day) AS day_lo, MAX(day) AS day_hi
       |FROM g
       |GROUP BY grp
       |ORDER BY grp""".stripMargin

  // ---- q_length_buckets -------------------------------------------

  private val NBuckets = 8

  /** Equi-depth length bucketing with SQL NTILE's exact semantics,
    * computed arithmetically ON THE VALUE DOMAIN: NTILE orders by
    * (n_tokens, doc_id), but the doc_id tie-break only decides WHICH
    * doc of an equal-length run lands in which bucket — never the
    * per-bucket token aggregates. So per-value counts carry the whole
    * answer (the q_winsorize/q_mad construction): group to
    * (n_tokens → cnt), prefix-sum cumulative counts over the token
    * domain (≪ doc count), derive each bucket's 1-based rank range
    * [lo, hi] from NTILE's remainder rule (n div k buckets of q+1
    * first, q after), and intersect value rank-runs with bucket
    * ranges via an 8-row broadcast — overlap-weighted aggregates
    * reproduce NTILE bitwise. NO per-document rank materialization,
    * NO ntile() window (a full-corpus single-task sort at 100 TB). */
  private def lengthBuckets(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // value-domain counts: |distinct n_tokens| ≪ corpus rows
    val vCounts = docs.groupBy(col("n_tokens")).agg(count(lit(1)).as("cnt"))
    val cum = Dist.prefixSum(vCounts, "n_tokens", "cnt", "cum")
    // NTILE remainder rule: first r = n mod k buckets take q+1 rows
    // (q = n div k); bucket b covers ranks [lo_b, hi_b]. Buckets past
    // the row count (n < k) get lo > hi and join to nothing — exactly
    // NTILE's behavior of emitting only buckets 1..n.
    val q = expr(s"__n div $NBuckets")
    val r = col("__n") % NBuckets.toLong
    val buckets = vCounts.agg(sum(col("cnt")).as("__n"))
      .select(explode(sequence(lit(1L), lit(NBuckets.toLong))).as("bucket"),
        q.as("q"), r.as("r"))
      .withColumn("lo", when(col("bucket") <= col("r"),
          (col("bucket") - 1L) * (col("q") + 1L) + 1L)
        .otherwise(col("r") * (col("q") + 1L) +
          (col("bucket") - col("r") - 1L) * col("q") + 1L))
      .withColumn("hi", when(col("bucket") <= col("r"),
          col("bucket") * (col("q") + 1L))
        .otherwise(col("r") * (col("q") + 1L) +
          (col("bucket") - col("r")) * col("q")))
      .select(col("bucket"), col("lo"), col("hi"))
    // value v occupies ranks (cum-cnt+1)..cum; intersect with each
    // bucket's range (8-row broadcast nested-loop — trivially small)
    cum.join(broadcast(buckets),
        col("cum") - col("cnt") + 1L <= col("hi") && col("cum") >= col("lo"))
      .withColumn("overlap",
        least(col("cum"), col("hi")) -
          greatest(col("cum") - col("cnt") + 1L, col("lo")) + 1L)
      .groupBy(col("bucket"))
      .agg(sum(col("overlap")).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens") * col("overlap")).as("sum_tokens"))
      .orderBy(col("bucket"))
  }

  private def lengthBucketsOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |b AS (
       |  SELECT n_tokens,
       |         CAST(NTILE($NBuckets) OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS bucket
       |  FROM d)
       |SELECT bucket, COUNT(*) AS n_docs,
       |       MIN(n_tokens) AS min_tokens,
       |       MAX(n_tokens) AS max_tokens,
       |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
       |FROM b
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  // ---- q_split_train ----------------------------------------------

  /** Split-hash parameters: a mixed-congruential scramble mod a
    * prime. Deliberately spec-stated arithmetic (NOT an engine hash
    * builtin): any engine — and the oracle — reproduces the split
    * from the constants alone, which is what makes a dataset split
    * auditable years later. The pre-mod keeps every intermediate
    * < 2^52, so the arithmetic is exact in int64 AND in a
    * double-based engine. */
  private val SplitPrime = 1000003L
  private val SplitMult = 2654435761L
  private val SplitInc = 40503L

  private def splitTrain(s: SparkSession, d: String): DataFrame = {
    val pct = ((col("doc_id") % SplitPrime) * SplitMult + SplitInc) % SplitPrime % 100L
    val split = when(pct < 80, "train").when(pct < 90, "val").otherwise("test")
    val byk = Tables.documents(s, d)
      .select(split.as("split"), col("n_chars"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
    // total via a global window OVER THE 3-ROW AGGREGATE (the waived
    // bounded pattern), not a second aggregate over byk — whose
    // un-persisted lineage would re-scan and re-shuffle the corpus
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    byk
      .select(col("split"), col("n_docs"), col("n_chars_total"),
        Det.r4(col("n_docs").cast("double") / sum(col("n_docs")).over(w))
          .as("share"))
      .orderBy(col("split"))
  }

  private def splitTrainOracle: String =
    s"""WITH s AS (
       |  SELECT CASE
       |           WHEN ((doc_id % $SplitPrime) * $SplitMult + $SplitInc) % $SplitPrime % 100 < 80 THEN 'train'
       |           WHEN ((doc_id % $SplitPrime) * $SplitMult + $SplitInc) % $SplitPrime % 100 < 90 THEN 'val'
       |           ELSE 'test' END AS split,
       |         n_chars
       |  FROM documents),
       |b AS (
       |  SELECT split, COUNT(*) AS n_docs,
       |         CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
       |  FROM s GROUP BY split),
       |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot FROM b)
       |SELECT split, n_docs, n_chars_total,
       |       ${Det.r4Sql("CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE)")} AS share
       |FROM b, t
       |ORDER BY split""".stripMargin

  // ---- q_mad ------------------------------------------------------

  /** Rank-select the discrete p-quantile per group from per-value
    * counts: the first value whose cumulative count reaches
    * ⌈p·n⌉ — percentile_disc semantics, no group ever buffered. */
  private def quantileByRank(counted: DataFrame, key: String, valc: String,
      p: String, out: String): DataFrame = {
    val cum = Dist.prefixSumKeyed(counted, Seq(key), valc, "cnt", "cum")
    val totals = counted.groupBy(col(key)).agg(sum(col("cnt")).as("n_tot"))
    cum.join(broadcast(totals), key)
      .groupBy(col(key))
      .agg(min(when(
        col("cum") >= greatest(ceil(col("n_tot") * lit(new java.math.BigDecimal(p))), lit(1)),
        col(valc))).as(out),
        first(col("n_tot")).as(s"${out}_n"))
  }

  /** Per-event-type MAD outlier audit: median via keyed rank-select
    * over per-value counts, then EVERYTHING ELSE on the distinct-
    * value table — |x − median| with multiplicity cnt gives the
    * deviation distribution without touching the fact again, the MAD
    * is a second rank-select on it, and the outlier count is a
    * cnt-weighted sum against the broadcast (median, mad) bounds.
    * ONE scan of the fact table total; every join broadcast
    * (group- or value-domain-sized); zero buffering aggregates —
    * robust z-scoring that survives a 100 TB fact table whose value
    * domain is millions, not trillions. */
  private def mad(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("value").isNotNull) // pin NULL semantics explicitly
      .select(col("event_type"), col("value"))
    // value-domain-sized; consumed by med, dev, and the outlier count.
    // Lazy localCheckpoint (r16): the three consumers sit in SEPARATE
    // broadcast-subquery jobs (med/bounds broadcast before the final
    // plan exists), so ReuseExchange never sees them side by side and
    // the scan+aggregate re-executed per consumer — measured as ~6
    // serialized single-task jobs of 0.2-0.35 s each. The checkpoint
    // computes the value-domain table once; it is value-domain-sized
    // (≪ fact table) at any scale.
    val vCounts = ev.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val med = quantileByRank(vCounts, "event_type", "value", "0.5", "med")
    val dCounts = vCounts.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), abs(col("value") - col("med")).as("dv"))
      .agg(sum(col("cnt")).as("cnt"))
    val madT = quantileByRank(dCounts, "event_type", "dv", "0.5", "mad")
    val bounds = med.join(madT, "event_type")
      .select(col("event_type"), col("med_n").as("n"), col("med"), col("mad"))
    vCounts.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"), col("n"), col("med"), col("mad"))
      .agg(sum(when(abs(col("value") - col("med")) > lit(3d) * col("mad"),
        col("cnt")).otherwise(lit(0L))).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  private def madOracle: String =
    s"""WITH e AS (
       |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
       |m AS (
       |  SELECT event_type, COUNT(*) AS n,
       |         QUANTILE_DISC(value, 0.5) AS med
       |  FROM e GROUP BY event_type),
       |dv AS (
       |  SELECT e.event_type, ABS(value - med) AS dv, med
       |  FROM e JOIN m USING (event_type)),
       |md AS (
       |  SELECT event_type, QUANTILE_DISC(dv, 0.5) AS mad
       |  FROM dv GROUP BY event_type)
       |SELECT m.event_type, n, med, mad,
       |       (SELECT COUNT(*) FROM dv
       |        WHERE dv.event_type = m.event_type AND dv.dv > 3 * mad) AS n_outliers
       |FROM m JOIN md ON m.event_type = md.event_type
       |ORDER BY m.event_type""".stripMargin

  // ---- registration ----------------------------------------------

  override val queries: Map[String, Q] = Map(
    "q_zorder" -> zorder,
    "q_skew_audit" -> skewAudit,
    "q_file_compaction" -> fileCompaction,
    "q_length_buckets" -> lengthBuckets,
    "q_split_train" -> splitTrain,
    "q_mad" -> mad,
  )

  override val oracles: Map[String, String] = Map(
    "q_zorder" -> zorderOracle,
    "q_skew_audit" -> skewAuditOracle,
    "q_file_compaction" -> fileCompactionOracle,
    "q_length_buckets" -> lengthBucketsOracle,
    "q_split_train" -> splitTrainOracle,
    "q_mad" -> madOracle,
  )
}
