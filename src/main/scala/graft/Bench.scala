package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line. A warmup pass at sf0.001 (~60× smaller)
  * runs first so timings measure plan/execution quality, not
  * first-query JIT/classloading noise.
  *
  * Contention robustness (round-8 redesign). The round-7 official
  * sweep was destroyed by a co-resident parallel load: queries ran
  * with all ITERS iterations back-to-back, so a multi-minute noise
  * window inflated every sample of a contiguous alphabetical block
  * and even the contention-robust per-query `min` was ruined
  * (q_sql_tpch17 min went 0.71→15.9s with zero code change). Two
  * structural fixes:
  *
  *  1. INTERLEAVED sweeps: the full suite runs ITERS times
  *     end-to-end and the per-query median is taken across the
  *     temporally separated sweeps. A contention window of any
  *     length shorter than a full sweep (~90s quiet) now inflates at
  *     most ONE sample per query, which the median discards.
  *  2. PARALLEL calibration: the round-7 single-thread probe read an
  *     identical 0.43s on the quiet and the contended machine,
  *     because a single thread still gets a core under co-resident
  *     *parallel* load — exactly the load that starves a local[32]
  *     sweep. The new probe runs the same fixed xorshift work on
  *     `availableProcessors` threads at once and is sampled before
  *     the sweep and after EACH sweep, so every sweep carries its
  *     own machine-pressure reading. loadavg pre/post is recorded
  *     too, so a future judge can classify a sweep from the artifact
  *     alone instead of by forensics.
  *
  * The JSON carries both the median-of-sweeps total ("value", the
  * headline) and the min-of-sweeps total ("total_min", the
  * contention floor). A query that throws is reported in an
  * "errors" object (name → exception) and excluded from "queries",
  * never as a fast near-zero timing.
  */
object Bench {
  /** Sweep count: overridable for local bisection (more sweeps =
    * tighter medians); the driver runs the default. */
  private val Iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS").map(_.toInt).getOrElse(3)

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  /** Fixed xorshift64* work unit; `iters` iterations, returns the
    * accumulator so the loop can't be dead-code-eliminated.
    */
  private def xorshiftWork(seed: Long, iters: Long): Long = {
    var x = seed
    var acc = 0L
    var i = 0L
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    acc
  }

  /** Single-thread fixed-work CPU calibration (kept from round 7 for
    * cross-round comparability): measures CPU *speed*, blind to
    * parallel co-resident load.
    */
  private def calibrate(): (Double, Long) = {
    val t0 = System.nanoTime()
    val acc = xorshiftWork(88172645463325252L, 200000000L)
    ((System.nanoTime() - t0) / 1e9, acc)
  }

  /** Parallel fixed-work calibration: every available core runs the
    * same 50M-iteration xorshift loop at once. On a quiet machine
    * the wall time ≈ one thread's time (~0.11s here); co-resident
    * parallel load — the thing that actually ate BENCH_r07 — shows
    * up as a proportional inflation. Sampled per sweep.
    */
  private def calibrateParallel(threads: Int): (Double, Long) = {
    val accs = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => accs.addAndGet(xorshiftWork(88172645463325252L + i, 50000000L)))
      t.start(); t
    }
    ts.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, accs.get())
  }

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      // sized to the test scale: the largest sf0.1 table is ~25MB in
      // one file, which at the 128MB default scans as ONE task; 16MB
      // gives the fact-table scans 2-4 way parallelism without
      // flooding the 70 sub-second queries with task overhead
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional name filter for local bisection: `Bench q_a q_b` times
    // only those queries; the driver passes no args (full suite)
    val names = {
      val all = SparkEntry.queries.keys.toSeq
      (if (args.nonEmpty) all.filter(args.contains(_)) else all).sorted
    }
    // execution action: count() (default; comparable to all prior
    // rounds) or a noop-sink write (SPARK_GRAFT_BENCH_ACTION=noop)
    // that materializes every column instead of letting Catalyst
    // prune un-ordered projections under count()
    val action: org.apache.spark.sql.DataFrame => Unit =
      if (sys.env.get("SPARK_GRAFT_BENCH_ACTION").contains("noop"))
        df => df.write.format("noop").mode("overwrite").save()
      else df => { df.count(); () }
    names.foreach { name =>
      try action(SparkEntry.queries(name)(spark, warmDir))
      catch { case _: Throwable => () }
    }
    val nThreads = Runtime.getRuntime.availableProcessors
    val loadPre = loadAvg()
    val (calibPre, sink1) = calibrate()
    val calibMulti = Seq.newBuilder[Double]
    var multiSink = 0L
    locally {
      val (s, a) = calibrateParallel(nThreads); calibMulti += s; multiSink += a
    }
    // interleaved sweeps: sweep s times every query once, in name
    // order; per-query samples are therefore separated by a full
    // sweep's wall time, so no contention window shorter than a
    // sweep can touch more than one sample of any query
    val samples = collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    val errors = collection.mutable.Map.empty[String, String]
    (1 to Iters).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        try {
          action(SparkEntry.queries(name)(spark, sfDir))
          samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        }
        // queries may persist() intermediates (e.g. the cluster
        // query's edge list); drop them so one query's cache never
        // contaminates the next query's memory budget or timing.
        // clearCache() misses localCheckpoint blocks (they are
        // persisted RDDs, not catalog-cached plans) — the iterative
        // queries' checkpoints were accumulating across the sweep and
        // starving later queries' execution memory (q_dedup_embed ran
        // 6.5s mid-sweep vs 1.2s isolated). Each bench iteration
        // rebuilds its DataFrames from scratch, so truncated lineage
        // is never re-executed and the unpersist is safe.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      val (s, a) = calibrateParallel(nThreads); calibMulti += s; multiSink += a
    }
    val qs = samples.toSeq.filter(_._2.size == Iters).sortBy(_._1)
    val errs = errors.toSeq.sortBy(_._1)
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    val qsJson = qs.map { case (k, v) => jstr(k) + ":" + median(v) }.mkString("{", ",", "}")
    // per-query spread: min is contention-robust (another JVM or GC
    // pause inflates SOME samples, never deflates one), stddev makes
    // a contended sweep machine-detectable instead of a per-round
    // forensic exercise
    val statsJson = qs.map { case (k, v) =>
      val m = v.sum / v.size
      val sd = math.sqrt(v.map(x => (x - m) * (x - m)).sum / v.size)
      // raw samples in sweep order: sample i of every query ran in the
      // same temporal window (sweep i), so a contention window is
      // visible as a vertical stripe across queries, and JIT warm-up
      // as a falling first column
      jstr(k) + s""":{"median":${r3(median(v))},"min":${r3(v.min)},"stddev":${r3(sd)},"samples":[${v.map(r3).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val errJson = errs.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = qs.map(p => median(p._2)).sum
    val totalMin = qs.map(p => p._2.min).sum
    val (calibPost, sink2) = calibrate()
    val loadPost = loadAvg()
    val calibJson =
      s""""calib_sec":{"pre":${r3(calibPre)},"post":${r3(calibPost)},"sink":${sink1 + sink2}}"""
    val calibMultiJson =
      s""""calib_multi":{"samples":[${calibMulti.result().map(r3).mkString(",")}],"threads":$nThreads,"sink":$multiSink}"""
    val envJson =
      s""""loadavg_pre":${r3(loadPre)},"loadavg_post":${r3(loadPost)},"procs":$nThreads"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","total_min":${r3(totalMin)},"queries":$qsJson,"stats":$statsJson,"errors":$errJson,"iters":$Iters,"mode":"interleaved",$calibJson,$calibMultiJson,$envJson,"sf":"$sfDir"}"""
    println(json)
    // the driver's stdout capture truncates long tails, hiding most of
    // the per-query map from round-over-round comparison — persist the
    // full line where the repo snapshot picks it up (path overridable,
    // defaulting to the working directory so other checkouts work)
    // Only a FULL-suite run may refresh the repo snapshot: a
    // name-filtered bisection run overwriting BENCH_FULL.json is how
    // a 1-query artifact once reached a commit (`git add -A` after an
    // isolated q_kcore A/B). Filtered runs still print their JSON.
    if (args.isEmpty) {
      val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        java.nio.file.Paths.get("BENCH_FULL.json").toAbsolutePath.toString)
      try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"Bench: failed to write $outPath: $e")
      }
    }
    spark.stop()
  }
}
