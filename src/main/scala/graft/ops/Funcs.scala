package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families: string, date/time, math, array
  * (higher-order), and JSON/map extraction.
  *
  * Reference analogs: string concat is the remarks join
  * (/root/reference/task.ts:183-185, A9); URL construction
  * (/root/reference/task.ts:216-226, A13) is the same concat/format
  * family; epoch-seconds handling mirrors the reference's
  * date_added/last_online integers (/root/reference/task.ts:55-58).
  *
  * All functions here are Catalyst built-ins — whole-stage-codegen
  * friendly, no UDFs in the hot path. Dialect care for the DuckDB
  * oracle: 1-based list indexing on both sides, `weekday()+1` =
  * DuckDB `isodow`, explicit DOUBLE casts on float lists.
  */
object Funcs extends QueryPack {

  private def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_type")).as("type_lower"),
        substring(col("p_name"), 1, 5).as("name_pre5"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        element_at(split(col("p_name"), " "), 1).as("first_tok"),
        element_at(split(col("p_name"), " "), -1).as("last_tok"),
        col("p_name").like("%red%").as("is_red"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        regexp_replace(col("p_brand"), "Brand#", "B").as("brand_short"),
        trim(lit("  pad  ")).as("trimmed"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"))
      .orderBy("p_partkey")

  private def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        (weekday(col("o_orderdate")) + 1).as("isodow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
        last_day(col("o_orderdate")).as("month_end"),
        unix_timestamp(col("o_orderdate")).as("epoch_sec"),
        timestamp_seconds(unix_timestamp(col("o_orderdate"))).as("roundtrip_ts"))
      .orderBy("o_orderkey")

  private def mathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        graft.Det.r4(col("l_extendedprice") / 7).as("div7"),
        abs(col("l_discount") - 0.05).as("abs_off"),
        ceil(col("l_quantity") / 3).as("ceil3"),
        floor(col("l_quantity") / 3).as("floor3"),
        graft.Det.r4(log(col("l_extendedprice"))).as("ln_price"),
        graft.Det.r4(exp(col("l_discount"))).as("exp_disc"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        (col("l_orderkey") % 7).as("mod7"),
        graft.Det.r4(sqrt(col("l_extendedprice"))).as("sqrt_price"),
        signum(col("l_discount") - 0.05).as("sign_off"))
      // (l_orderkey, l_linenumber) non-unique: div7/exp_disc/qty_sq are
      // injective in extendedprice/discount/quantity, pinning all
      // remaining derived columns for a total order.
      .orderBy("l_orderkey", "l_linenumber", "div7", "exp_disc", "qty_sq")

  private def arrayFuncs(s: SparkSession, d: String): DataFrame = {
    val asDouble = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("n_dims"),
        graft.Det.r4(element_at(col("embedding"), 1).cast("double")).as("e1"),
        graft.Det.r4(aggregate(asDouble, lit(0.0), (acc, x) => acc + x)).as("sum_all"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        graft.Det.r4(aggregate(transform(slice(col("embedding"), 1, 4), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("first4_sum"),
        graft.Det.r4(array_max(col("embedding")).cast("double")).as("max_e"))
      .orderBy("vec_id")
  }

  private def mapJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod10"),
        // schema-full parse -> MapType, then key access (A5 analog)
        element_at(from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")), "k").as("map_k"))
      .orderBy("event_id")

  /** Second string family: case/charset transforms, edit distance
    * (levenshtein — the character-level near-dup primitive),
    * format_string (reference A13's URL-building family). */
  private def stringFuncs2(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        initcap(lower(col("c_mktsegment"))).as("seg_title"),
        translate(col("c_name"), "#0", "-x").as("name_trans"),
        levenshtein(col("c_name"), lit("Customer#000000000")).as("edit_dist"),
        format_string("%s/%d", col("c_mktsegment"), col("c_custkey")).as("seg_key"),
        reverse(col("c_name")).as("name_rev"),
        repeat(lit("ab"), 3).as("rep"),
        instr(col("c_name"), "#").as("hash_pos"),
        left(col("c_name"), lit(8)).as("name_left"),
        right(col("c_name"), lit(4)).as("name_right"))
      .orderBy("c_custkey")

  /** Conditional / null-handling family: CASE, nullif, coalesce,
    * greatest/least, if. */
  private def condFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 400000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("bucket"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_filled"),
        greatest(col("o_totalprice"), lit(250000.0)).as("floor_price"),
        least(col("o_custkey") % 100, col("o_orderkey") % 100).as("min_mod"),
        expr("IF(o_orderstatus = 'F', 1, 0)").as("is_final"))
      .orderBy("o_orderkey")

  /** Second array family: sort, containment, zip, flatten, sequence,
    * reverse, distinct-count — over the token arrays of documents. */
  private def arrayFuncs2(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        element_at(array_sort(toks), 1).as("first_sorted"),
        array_contains(toks, "spark").as("has_spark"),
        size(array_distinct(toks)).as("n_uniq"),
        element_at(reverse(toks), 1).as("last_tok"),
        size(flatten(array(slice(toks, 1, 3), slice(toks, 1, 2)))).as("flat5"),
        size(sequence(lit(1), col("n_chars") % 10 + 1)).as("seq_n"),
        array_position(toks, "the").cast("int").as("the_pos"))
      .orderBy("doc_id")
  }

  /** Regex family (patterns kept dialect-portable). */
  private def regexFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        col("c_name").rlike("0{3}").as("has_000"),
        regexp_count(col("c_name"), lit("0")).as("n_zeros"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"))
      .orderBy("c_custkey")

  /** Spark 4 VARIANT type over the semi-structured props column:
    * parse once into the binary variant encoding, then typed path
    * extraction — the open-schema path a pipeline takes when JSON
    * shapes drift (vs the fixed-schema from_json in q_map_json). */
  private def variantFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", parse_json(col("props")))
      .select(
        col("event_id"),
        try_variant_get(col("v"), "$.k", "int").as("k_int"),
        try_variant_get(col("v"), "$.k", "string").as("k_str"),
        try_variant_get(col("v"), "$.missing", "int").as("absent"))
      .orderBy("event_id")

  override val queries: Map[String, Q] = Map(
    "q_variant"       -> variantFuncs,
    "q_string_funcs"  -> stringFuncs,
    "q_string_funcs2" -> stringFuncs2,
    "q_cond_funcs"    -> condFuncs,
    "q_date_funcs"    -> dateFuncs,
    "q_math_funcs"    -> mathFuncs,
    "q_array_funcs"   -> arrayFuncs,
    "q_array_funcs2"  -> arrayFuncs2,
    "q_regex_funcs"   -> regexFuncs,
    "q_map_json"      -> mapJson,
  )

  override val oracles: Map[String, String] = Map(
    "q_variant" ->
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS INT) AS k_int,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(NULL AS INT) AS absent
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_array_funcs2" ->
      """SELECT doc_id,
        |       list_sort(string_split(text, ' '))[1] AS first_sorted,
        |       list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |       CAST(LEN(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
        |       list_reverse(string_split(text, ' '))[1] AS last_tok,
        |       CAST(LEN(flatten([string_split(text,' ')[1:3], string_split(text,' ')[1:2]])) AS INT) AS flat5,
        |       CAST(LEN(range(1, n_chars % 10 + 2)) AS INT) AS seq_n,
        |       CAST(COALESCE(list_position(string_split(text, ' '), 'the'), 0) AS INT) AS the_pos
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_regex_funcs" ->
      """SELECT c_custkey,
        |       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |       regexp_matches(c_name, '0{3}') AS has_000,
        |       CAST(LEN(regexp_extract_all(c_name, '0')) AS INT) AS n_zeros,
        |       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q_string_funcs2" ->
      """SELECT c_custkey,
        |       UPPER(LEFT(c_mktsegment, 1)) || LOWER(SUBSTRING(c_mktsegment, 2)) AS seg_title,
        |       TRANSLATE(c_name, '#0', '-x') AS name_trans,
        |       CAST(LEVENSHTEIN(c_name, 'Customer#000000000') AS INT) AS edit_dist,
        |       FORMAT('{}/{}', c_mktsegment, c_custkey) AS seg_key,
        |       REVERSE(c_name) AS name_rev,
        |       REPEAT('ab', 3) AS rep,
        |       CAST(INSTR(c_name, '#') AS INT) AS hash_pos,
        |       LEFT(c_name, 8) AS name_left,
        |       RIGHT(c_name, 4) AS name_right
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q_cond_funcs" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 400000 THEN 'high'
        |            WHEN o_totalprice > 100000 THEN 'mid'
        |            ELSE 'low' END AS bucket,
        |       NULLIF(o_orderstatus, 'P') AS status_or_null,
        |       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
        |       GREATEST(o_totalprice, 250000.0) AS floor_price,
        |       LEAST(o_custkey % 100, o_orderkey % 100) AS min_mod,
        |       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |       UPPER(p_name) AS name_upper,
        |       LOWER(p_type) AS type_lower,
        |       SUBSTRING(p_name, 1, 5) AS name_pre5,
        |       LENGTH(p_name) AS name_len,
        |       CONCAT_WS('-', p_brand, p_type) AS brand_type,
        |       string_split(p_name, ' ')[1] AS first_tok,
        |       string_split(p_name, ' ')[-1] AS last_tok,
        |       p_name LIKE '%red%' AS is_red,
        |       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |       regexp_replace(p_brand, 'Brand#', 'B') AS brand_short,
        |       TRIM('  pad  ') AS trimmed,
        |       LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(YEAR(o_orderdate) AS INT) AS y,
        |       CAST(MONTH(o_orderdate) AS INT) AS m,
        |       CAST(DAYOFMONTH(o_orderdate) AS INT) AS dom,
        |       CAST(QUARTER(o_orderdate) AS INT) AS q,
        |       CAST(ISODOW(o_orderdate) AS INT) AS isodow,
        |       DATE_TRUNC('month', o_orderdate) AS month_start,
        |       CAST(DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since,
        |       LAST_DAY(o_orderdate) AS month_end,
        |       CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_sec,
        |       CAST(TO_TIMESTAMP(CAST(EPOCH(o_orderdate) AS BIGINT)) AS TIMESTAMP) AS roundtrip_ts
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       ROUND(l_extendedprice / 7, 4) AS div7,
        |       ABS(l_discount - 0.05) AS abs_off,
        |       CAST(CEIL(l_quantity / 3) AS BIGINT) AS ceil3,
        |       CAST(FLOOR(l_quantity / 3) AS BIGINT) AS floor3,
        |       ROUND(LN(l_extendedprice), 4) AS ln_price,
        |       ROUND(EXP(l_discount), 4) AS exp_disc,
        |       POW(l_quantity, 2) AS qty_sq,
        |       l_orderkey % 7 AS mod7,
        |       ROUND(SQRT(l_extendedprice), 4) AS sqrt_price,
        |       CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS sign_off
        |FROM lineitem
        |WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber, div7, exp_disc, qty_sq""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |       CAST(LEN(embedding) AS INT) AS n_dims,
        |       ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e1,
        |       ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_all,
        |       CAST(LEN(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |       ROUND(list_sum(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))), 4) AS first4_sum,
        |       ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_e
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
    "q_map_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |       CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod10,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS map_k
        |FROM events
        |ORDER BY event_id""".stripMargin,
  )
}
