package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join-algebra laws on real data (SURVEY.md §5.3): semi ∪ anti
  * partitions the left side; semi = distinct-key inner restriction;
  * as-of result keys ⊆ error events with an earlier click. */
class JoinAlgebraSpec extends SparkSpec {

  test("semi + anti partition customer") {
    val semi = Joins.queries("q_join_semi")(spark, sf).count()
    val anti = Joins.queries("q_join_anti")(spark, sf).count()
    val all  = graft.Tables.customer(spark, sf).count()
    assert(semi + anti == all)
  }

  test("semi keys = distinct inner keys") {
    val c = graft.Tables.customer(spark, sf)
    val o = graft.Tables.orders(spark, sf).filter(col("o_totalprice") > 450000)
    val semiKeys = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey")
    val innerKeys = c.join(o, c("c_custkey") === o("o_custkey"), "inner")
      .select("c_custkey").distinct()
    assert(semiKeys.exceptAll(innerKeys).isEmpty && innerKeys.exceptAll(semiKeys).isEmpty)
  }

  test("as-of join: every output error has >=1 click at or before its ts") {
    val out = Joins.queries("q_join_asof")(spark, sf)
    assert(out.filter(col("click_ts") > col("ts")).isEmpty)
    // click_value is the value of the click row at click_ts
    val ev = graft.Tables.events(spark, sf).filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("ts").as("cts"), col("value").as("v"))
    val joined = out.join(ev, col("user_id") === col("u") && col("click_ts") === col("cts"))
    assert(joined.filter(col("click_value") =!= col("v")).isEmpty)
    assert(joined.count() == out.count())
  }

  test("null-safe join equals equi-join on sentinel-coalesced keys") {
    // a <=> b  ≡  coalesce(a, S) = coalesce(b, S) for any sentinel S
    // outside the key domain — the rewrite an engine without <=> uses
    val sup = graft.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), expr("nullif(s_nationkey % 5, 0)").as("k"))
    val nullsafe = sup.as("a").join(sup.as("b"),
        col("a.k") <=> col("b.k") && col("a.s_suppkey") < col("b.s_suppkey"))
      .select(col("a.s_suppkey"), col("b.s_suppkey"))
    val sentinel = sup.as("a").join(sup.as("b"),
        coalesce(col("a.k"), lit(-999)) === coalesce(col("b.k"), lit(-999))
          && col("a.s_suppkey") < col("b.s_suppkey"))
      .select(col("a.s_suppkey"), col("b.s_suppkey"))
    assert(nullsafe.exceptAll(sentinel).isEmpty && sentinel.exceptAll(nullsafe).isEmpty)
  }

  test("dedup idempotence: q_dedup outputs distinct keys") {
    val topk = Core.queries("q_topk")(spark, sf)
    assert(topk.groupBy("l_returnflag", "l_linestatus").count()
      .filter(col("count") > 3).isEmpty)
  }
}
