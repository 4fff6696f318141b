package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Executable demonstrations of the 100 TB scale patterns the README
  * documents: bucketed co-located joins (no exchange), skew salting
  * (same result, bounded per-task keys), and partition-count
  * hygiene. These are plan-shape assertions — the point is the
  * absence of shuffles, not the row values.
  */
class ScalePatternsSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // spark.sql.warehouse.dir is static config — use external tables
    // with explicit paths under a temp dir instead
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    graft.Tables.orders(spark, sf)
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders")
      .mode("overwrite").saveAsTable("b_orders")
    graft.Tables.customer(spark, sf)
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer")
      .mode("overwrite").saveAsTable("b_customer")
    // co-located: both sides pre-bucketed on the join key
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ==
        graft.Tables.orders(spark, sf).join(graft.Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.Tables.events(spark, sf)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = back.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning),
    // not as a data filter over all partitions
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    val expected = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(back.count() == expected)
  }

  test("csv, json, and orc sources round-trip the relational subset") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val src = graft.Tables.customer(spark, sf)
    src.write.option("header", "true").mode("overwrite").csv(s"$dir/csv")
    src.write.mode("overwrite").json(s"$dir/json")
    src.write.mode("overwrite").orc(s"$dir/orc")
    val csvBack = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$dir/csv")
    val jsonBack = spark.read.schema(src.schema).json(s"$dir/json")
    val orcBack = spark.read.orc(s"$dir/orc")
    assert(csvBack.exceptAll(src).isEmpty && src.exceptAll(csvBack).isEmpty)
    assert(jsonBack.exceptAll(src).isEmpty && src.exceptAll(jsonBack).isEmpty)
    assert(orcBack.exceptAll(src).isEmpty && src.exceptAll(orcBack).isEmpty)
  }

  test("xml source round-trips markup-hostile strings (escaping, unicode, embedded newlines)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    // every XML metacharacter class the writer must escape, plus
    // multi-byte unicode and embedded structure-looking text; values
    // avoid leading/trailing whitespace (the reader's
    // ignoreSurroundingSpaces default trims it — an XML-source
    // contract, not a bug, and the graft tables never depend on it)
    val src = Seq(
      (1L, "a & b < c > d"),
      (2L, "quotes \" and ' inside"),
      (3L, "tags <row>nested</row> &amp; entities"),
      (4L, "unicode éß中文 😀"),
      (5L, "line\nbreak and\ttab"),
      (6L, "]]> cdata terminator")).toDF("id", "s")
    src.write.mode("overwrite").option("rowTag", "row").format("xml").save(dir)
    val back = spark.read.schema("id BIGINT, s STRING")
      .option("rowTag", "row").format("xml").load(dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      s"xml round-trip diverged: ${back.collect().toSeq} vs ${src.collect().toSeq}")
  }

  test("seeded sample and sampleBy are deterministic across runs") {
    val c = graft.Tables.customer(spark, sf)
    // Bernoulli sample with a fixed seed: identical row set on re-run
    val s1 = c.sample(withReplacement = false, 0.2, seed = 42).collect().toSeq
    val s2 = c.sample(withReplacement = false, 0.2, seed = 42).collect().toSeq
    assert(s1 == s2 && s1.nonEmpty)
    // stratified sampleBy: same guarantee per stratum, fractions honored loosely
    val fracs = Map("BUILDING" -> 0.5, "MACHINERY" -> 0.1)
    val b1 = c.stat.sampleBy("c_mktsegment", fracs, 7L).collect().toSeq
    val b2 = c.stat.sampleBy("c_mktsegment", fracs, 7L).collect().toSeq
    assert(b1 == b2 && b1.nonEmpty)
    assert(b1.forall(r => fracs.contains(r.getString(4))))
  }

  test("salted aggregation equals direct aggregation") {
    // two-phase salt-then-merge for skewed keys: results identical
    val li = graft.Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
    val salted = li
      .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
      .groupBy("l_returnflag", "salt")
      .agg(sum("l_quantity").as("ps"), count(lit(1)).as("pn"))
      .groupBy("l_returnflag")
      .agg(sum("ps").as("s"), sum("pn").as("n"))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("sort+limit plans as TakeOrderedAndProject, not a global sort") {
    val plan = Core.queries("q_sort_limit")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("broadcast hint is honored in the dimension join") {
    val plan = Joins.queries("q_join_broadcast")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  /** Runs `df` to completion and returns the FINAL adaptive plan
    * (AQE re-plans during execution; the pre-execution plan is only
    * the starting point). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("AQE splits a skewed join partition at runtime") {
    // one hot key (0) carrying ~100x the rows of every other key;
    // thresholds lowered so local-scale bytes trigger the same
    // skew-split decision a 100 TB hot key would
    val conf = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // incompressible per-row payload — shuffle sizes are measured on
      // lz4-compressed bytes, so a constant pad would defeat the demo
      val pad = sha2(concat(lit("pad"), col("id").cast("string")), 512)
      // key 0 carries ~98% of the table; the other ~100 keys share the rest
      val skewed = spark.range(0, 500000)
        .select(when(col("id") < 490000, lit(0L)).otherwise(col("id") % 100).as("k"), pad.as("p"))
      val dim = spark.range(0, 100).select(col("id").as("k"), pad.as("d"))
      val joined = skewed.join(dim, "k")
      val plan = finalPlan(joined)
      assert(plan.contains("skew=true"), s"expected a skew-split join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces excess shuffle partitions at runtime") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      // 6-group aggregate through 64 declared partitions: AQE folds
      // the nearly-empty outputs back together instead of launching
      // 64 reduce tasks
      val agg = graft.Tables.lineitem(spark, sf)
        .groupBy("l_returnflag", "l_linestatus").count()
      val plan = finalPlan(agg)
      assert(plan.contains("AQEShuffleRead coalesced"), plan)
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("AQE switches a planned sort-merge join to broadcast at runtime") {
    // static threshold off -> initial plan is SortMergeJoin; AQE's own
    // threshold (explicit, since it defaults to the static one) sees
    // the small runtime size of the filtered side -> broadcast join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
    try {
      val smallSide = graft.Tables.customer(spark, sf)
        .filter(col("c_acctbal") > 9000) // a handful of rows at runtime
      val joined = graft.Tables.orders(spark, sf)
        .join(smallSide, col("o_custkey") === col("c_custkey"))
      val initial = joined.queryExecution.executedPlan.toString
      assert(initial.contains("SortMergeJoin"), initial)
      val plan = finalPlan(joined)
      assert(plan.contains("BroadcastHashJoin"), s"AQE should have switched:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("runtime Bloom-filter join pruning injects a might_contain probe into the fact side") {
    // Spark's runtime row-level filtering: a selective dimension join
    // plants a Bloom filter built from the dim keys INTO the fact
    // scan stage, so fact rows that cannot match die before the
    // shuffle — at 100 TB this is the difference between shuffling
    // the full fact table and shuffling the ~matching slice. Only
    // fires on shuffle joins (a broadcast join already prunes via the
    // hash table), hence the thresholds; creation-side limits dropped
    // to make the tiny local dim eligible — on a real cluster the
    // 10MB/10GB defaults gate it to genuinely selective dims.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val dim = graft.Tables.customer(spark, sf)
        .filter(col("c_acctbal") > 9000) // selective: few surviving keys
        .select(col("c_custkey"))
      val fact = graft.Tables.orders(spark, sf)
      val joined = fact.join(dim, col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime Bloom filter not injected:\n$plan")
      // the probe must sit on the FACT side's scan subtree, and the
      // result must equal the unfiltered join (pruning is lossless)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = fact.join(dim, col("o_custkey") === col("c_custkey")).count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }
}
