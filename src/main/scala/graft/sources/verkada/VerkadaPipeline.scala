package graft.sources.verkada

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The reference pipeline (/root/reference/task.ts:93-286) re-expressed
  * as a Spark job over the DSv2 sources. Stage map (SURVEY.md §3.3):
  *
  *  1. OAuth + stream-token fetches (task.ts:97-106, 129-141) —
  *     driver-side setup, results broadcast via literals/isin.
  *  2. Lease scan (A2) — LeaseSource, parallel page partitions;
  *     filter to this layer + non-null source_id (A6, task.ts:122);
  *     last-page-wins dedup per source_id (A7, task.ts:121-125).
  *  3. Camera scan (A3) — CameraSource cursor reader; FAILFAST
  *     from_json decode (A5).
  *  4. GeoJSON Feature projection (A8, task.ts:168-195).
  *  5. Permission semi-join (A10, task.ts:209-212).
  *  6. Left join against leases (A11) → upsert PATCH-or-POST per
  *     camera (A15, task.ts:228-271) inside mapPartitions — the
  *     reference's 20-concurrent fan-out (A14) becomes partition
  *     parallelism: repartition(concurrency) gives N parallel
  *     sequential HTTP streams across the cluster.
  *  7. HLS enrichment of the feature (A16, task.ts:245-249).
  *  8. submit(): POST the FeatureCollection (A17, task.ts:280-285).
  */
object VerkadaPipeline {

  case class Config(
    apiBase: String,       // Verkada API base (reference API_Region host)
    serverBase: String,    // CloudTAK server base
    apiKey: String,
    layerId: Long,
    concurrency: Int = 20, // reference batch size, task.ts:201
    leasePageSize: Int = 50, // reference page size, task.ts:119
    orgId: String = "org")

  case class StreamGrant(accessibleCameras: Seq[String], accessibleSites: Seq[String], jwt: String)

  /** A1: OAuth token fetch (task.ts:97-106). */
  def fetchToken(cfg: Config): String = {
    val body = Json.parse(Json.send(Json.httpClient(), "POST", s"${cfg.apiBase}/token", "{}",
      Map("x-api-key" -> cfg.apiKey)))
    body.get("token").asText()
  }

  /** A4: stream-token fetch → permission sets + jwt (task.ts:129-141). */
  def fetchStreamGrant(cfg: Config): StreamGrant = {
    val body = Json.parse(Json.get(Json.httpClient(),
      s"${cfg.apiBase}/cameras/v1/footage/token", Map("x-api-key" -> cfg.apiKey)))
    StreamGrant(
      body.get("accessibleCameras").elements().asScala.map(_.asText()).toSeq,
      body.get("accessibleSites").elements().asScala.map(_.asText()).toSeq,
      body.get("jwt").asText())
  }

  /** A2+A6+A7: lease scan, filter to layer, last-page-wins dedup. */
  def leases(spark: SparkSession, cfg: Config, token: String): DataFrame = {
    val raw = spark.read.format(classOf[LeaseSource].getName)
      .option("url", s"${cfg.serverBase}/video/lease")
      .option("token", token)
      .option("pageSize", cfg.leasePageSize)
      .load()
    val w = Window.partitionBy("source_id").orderBy(col("page").desc, col("id").desc)
    raw
      .filter(col("layer") === cfg.layerId && col("source_id").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id").as("lease_id"), col("source_id"))
  }

  /** A3+A5: camera scan + FAILFAST schema-validated decode. */
  def cameras(spark: SparkSession, cfg: Config, token: String): DataFrame =
    spark.read.format(classOf[CameraSource].getName)
      .option("url", s"${cfg.apiBase}/cameras/v1/devices")
      .option("token", token)
      .load()
      .select(from_json(col("json"), CameraSource.cameraSchema,
        Map("mode" -> "FAILFAST").asJava).as("c"))
      .select(col("c.*"))

  /** A5 PERMISSIVE twin of [[cameras]]: schema-mismatching records
    * are QUARANTINED (decoded struct null, raw json retained in a
    * side output) instead of failing the job — the posture a 100 TB
    * scan needs when one bad record must not kill the run. Returns
    * (valid decoded rows, quarantined raw rows). */
  def camerasQuarantine(spark: SparkSession, cfg: Config, token: String)
      : (DataFrame, DataFrame) = {
    // PERMISSIVE marks partially-decodable records via the declared
    // corrupt-record column (a bad field alone does NOT null the
    // whole struct, so a sentinel field test would miss it)
    val schema = CameraSource.cameraSchema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val decoded = spark.read.format(classOf[CameraSource].getName)
      .option("url", s"${cfg.apiBase}/cameras/v1/devices")
      .option("token", token)
      .load()
      .select(col("json"),
        from_json(col("json"), schema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record").asJava).as("c"))
    val valid = decoded.filter(col("c._corrupt_record").isNull)
      .select(col("c.*")).drop("_corrupt_record")
    val quarantined = decoded.filter(col("c._corrupt_record").isNotNull)
      .select(col("json"))
    (valid, quarantined)
  }

  /** A8: camera → GeoJSON Feature projection (task.ts:168-195). */
  def toFeatures(cams: DataFrame): DataFrame =
    cams.select(
      col("camera_id").as("id"),
      lit("Feature").as("type"),
      struct(
        lit("b-m-p-s-p-loc").as("type"),
        lit("m-g").as("how"),
        col("name").as("callsign"),
        col("location_angle").as("course"),
        struct(
          lit(50).as("range"),
          col("location_angle").as("azimuth"),
          lit("Verkada").as("type"),
          col("model").as("model")).as("sensor"),
        concat_ws(",", array(lit(""))).as("remarks"),
        struct(cams.columns.map(col): _*).as("metadata")).as("properties"),
      struct(
        lit("Point").as("type"),
        array(col("location_lon"), col("location_lat")).as("coordinates")).as("geometry"),
      col("site_id"), col("model"), col("name").as("cam_name"))

  /** A10: streamable iff site or camera is in the grant
    * (task.ts:209-212). Small sets → isin compiles to a broadcast
    * membership test; for unbounded sets switch to a left-semi
    * broadcast join on the union of keys. */
  def streamable(features: DataFrame, grant: StreamGrant): DataFrame =
    features.filter(
      col("site_id").isin(grant.accessibleSites: _*) ||
      col("id").isin(grant.accessibleCameras: _*))

  /** A13: the stream proxy URL — 6 constant params + url-encoded jwt,
    * camera_id, org_id (task.ts:216-226) — built as a codegen'd
    * column expression, evaluated per row on executors. */
  def proxyUrl(cfg: Config, jwt: String): org.apache.spark.sql.Column =
    concat(
      lit(s"${cfg.apiBase}/stream/cameras/v1/footage/stream/stream.m3u8" +
        "?start_time=0&end_time=0&codec=hevc&resolution=high_res" +
        "&type=stream&transcode=false&jwt="),
      url_encode(lit(jwt)),
      lit("&camera_id="), url_encode(col("id")),
      lit("&org_id="), url_encode(lit(cfg.orgId)))

  /** A18: schema discovery — the input (camera) schema for the
    * incoming flow, empty for outgoing (task.ts:78-91). */
  def discoverSchema(flow: String): org.apache.spark.sql.types.StructType =
    if (flow == "incoming") CameraSource.cameraSchema
    else new org.apache.spark.sql.types.StructType()

  /** A11+A14+A15+A16: left-join leases, PATCH-or-POST upsert per
    * camera with per-partition HTTP, enrich the feature with the HLS
    * URL when the response carries one. Failures are counted and
    * surfaced (the reference swallows them — task.ts:276 TODO). */
  def upsertAndEnrich(features: DataFrame, leasesDf: DataFrame, cfg: Config,
      token: String, jwt: String): (DataFrame, org.apache.spark.util.LongAccumulator) = {
    val spark = features.sparkSession
    import spark.implicits._
    // the reference swallows upsert failures (task.ts:276 TODO);
    // we count them in an accumulator and surface the tally
    val failures = spark.sparkContext.longAccumulator("graft.verkada.upsertFailures")
    val joined = features
      .join(broadcast(leasesDf), features("id") === leasesDf("source_id"), "left_outer")
      .withColumn("proxy", proxyUrl(cfg, jwt))
      .repartition(cfg.concurrency)

    val schema = org.apache.spark.sql.types.StructType(
      joined.schema.fields :+
        org.apache.spark.sql.types.StructField("hls_url",
          org.apache.spark.sql.types.StringType, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(schema)

    joined.mapPartitions { rows =>
      val client = Json.httpClient()
      val headers = Map("Authorization" -> s"Bearer $token")
      rows.map { r =>
        val camId = r.getAs[String]("id")
        val model = r.getAs[String]("model")
        val name = r.getAs[String]("cam_name")
        val leaseId = Option(r.getAs[String]("lease_id"))
        // identical 7-field body for PATCH and POST (task.ts:230-260)
        val body = Json.mapper.createObjectNode()
        body.put("name", name)
        body.put("duration", 3600L)
        body.put("source_id", camId)
        body.put("source_type", "fixed")
        body.put("source_model", s"Verkada $model")
        body.put("proxy", r.getAs[String]("proxy"))
        val resp =
          try {
            val out = leaseId match {
              case Some(idv) => Json.send(client, "PATCH",
                s"${cfg.serverBase}/video/lease/$idv", body.toString, headers)
              case None => Json.send(client, "POST",
                s"${cfg.serverBase}/video/lease", body.toString, headers)
            }
            val node = Json.parse(out)
            if (node.has("protocols") && node.get("protocols").hasNonNull("hls"))
              node.get("protocols").get("hls").get("url").asText()
            else null
          } catch { case _: Exception => failures.add(1); null }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ resp)
      }
    }(enc)
      .withColumn("properties",
        col("properties").withField("video",
          when(col("hls_url").isNotNull, struct(col("hls_url").as("url")))
            .otherwise(lit(null).cast("struct<url:string>"))))
      .select("id", "type", "properties", "geometry") -> failures
  }

  /** A17: submit the FeatureCollection to the layer endpoint
    * (task.ts:280-285). Driver-side POST of the collected features —
    * the reference's sink is a single HTTP call; a scale deployment
    * would swap this for a partitioned writer. */
  def submit(features: DataFrame, cfg: Config, token: String): Int = {
    val rows = features.toJSON.collect()
    val fc = s"""{"type":"FeatureCollection","features":[${rows.mkString(",")}]}"""
    Json.send(Json.httpClient(), "POST", s"${cfg.serverBase}/layer/${cfg.layerId}/features",
      fc, Map("Authorization" -> s"Bearer $token"))
    rows.length
  }

  /** Full control() replay. Returns the enriched features. */
  def run(spark: SparkSession, cfg: Config): DataFrame = {
    val token = fetchToken(cfg)
    val grant = fetchStreamGrant(cfg)
    val ls = leases(spark, cfg, token)
    val cams = cameras(spark, cfg, token)
    val feats = toFeatures(cams)
    val live = streamable(feats, grant)
    val (enrichedRaw, failures) = upsertAndEnrich(live, ls, cfg, token, grant.jwt)
    val enriched = enrichedRaw.cache()
    submit(enriched, cfg, token)
    // always set (including 0) so a clean run clears a prior tally
    spark.sparkContext.setLocalProperty("graft.verkada.lastFailures",
      failures.value.toString)
    enriched
  }

  /** Last run's upsert-failure tally (0 if none). */
  def lastFailures(spark: SparkSession): Long =
    Option(spark.sparkContext.getLocalProperty("graft.verkada.lastFailures"))
      .map(_.toLong).getOrElse(0L)
}
