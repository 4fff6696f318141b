package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL surface of the persisted ANN index: `CALL ann_build`
  * materializes the IVF index as two ordinary catalog tables, and
  * `CALL ann_probe` answers top-k from it. The index participates in
  * the whole table ecosystem — SELECT, DESCRIBE-style procedures,
  * versioning — because it IS tables. */
class AnnProcedureSpec extends SparkSpec {

  test("CALL ann_build materializes the index as catalog tables; ann_probe answers top-k") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_ann_proc_")
    spark.conf.set("spark.sql.catalog.annproc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.annproc.root", catRoot.toString)
    try {
      // a docs table carrying embeddings, with a PLANTED DUPLICATE:
      // row 900001 is row 1's vector — its cosine to the probe is
      // exactly 1.0 and it must surface as the top neighbor
      val base = graft.Tables.embeddings(spark, sf)
        .select(col("vec_id").as("id"), col("embedding").as("emb"))
      val planted = base.filter(col("id") === 1L)
        .select(lit(900001L).as("id"), col("emb"))
      val t = new SnapshotTable(spark, catRoot.resolve("docs").toString)
      t.commit(base.unionAll(planted))

      val built = spark.sql(
        "CALL annproc.ann_build(table => 'docs', id_col => 'id', " +
          "vec_col => 'emb', k => 8)").head
      assert(built.getString(0) == "docs__ann_vectors")
      assert(built.getString(1) == "docs__ann_centroids")
      // the index is ordinary catalog tables: SELECTable, and the
      // vectors table covers every row exactly once
      val nVec = spark.sql("SELECT count(*) FROM annproc.docs__ann_vectors")
        .head.getLong(0)
      assert(nVec == t.read().count())
      val nCent = spark.sql("SELECT count(*) FROM annproc.docs__ann_centroids")
        .head.getLong(0)
      assert(nCent >= 1 && nCent <= 8, s"centroids: $nCent")

      // probe by member id 1: the planted duplicate ranks first with
      // cosine exactly 1.0
      val top = spark.sql(
        "CALL annproc.ann_probe(table => 'docs', probe_id => 1, " +
          "nprobe => 2, k => 5)").collect()
      assert(top.length == 5, top.mkString("; "))
      assert(top.head.getLong(0) == 900001L, top.mkString("; "))
      assert(top.head.getDouble(1) == 1.0, top.head.toString)
      // scores ranked descending, genuine cosines
      val scores = top.map(_.getDouble(1)).toSeq
      assert(scores == scores.sorted.reverse)
      assert(scores.forall(s => s >= -1.0 && s <= 1.0))

      // INCREMENTAL ingest from a staging table: a second planted
      // duplicate lands through CALL ann_ingest (no Lloyd) and the
      // next probe surfaces it; replaying the same batch_id is a
      // no-op (exactly-once), not a duplicate entry
      val staging = new SnapshotTable(spark, catRoot.resolve("stage").toString)
      staging.commit(base.filter(col("id") === 1L)
        .select(lit(900002L).as("id"), col("emb")))
      val vIngest = spark.sql(
        "CALL annproc.ann_ingest(table => 'docs', source_table => 'stage', " +
          "id_col => 'id', vec_col => 'emb', batch_id => 7)").head.getLong(0)
      val top2 = spark.sql(
        "CALL annproc.ann_probe(table => 'docs', probe_id => 1, " +
          "nprobe => 2, k => 5)").collect()
      assert(top2.take(2).map(_.getLong(0)).toSet == Set(900001L, 900002L),
        top2.mkString("; "))
      assert(top2.take(2).forall(_.getDouble(1) == 1.0))
      val vReplay = spark.sql(
        "CALL annproc.ann_ingest(table => 'docs', source_table => 'stage', " +
          "id_col => 'id', vec_col => 'emb', batch_id => 7)").head.getLong(0)
      assert(vReplay == vIngest, "batch_id replay must be a no-op")
      val replayTop = spark.sql(
        "CALL annproc.ann_probe(table => 'docs', probe_id => 1, " +
          "nprobe => 2, k => 5)").collect()
      assert(replayTop.count(_.getLong(0) == 900002L) == 1)

      // probing without an index refuses loudly
      val e = intercept[Exception](spark.sql(
        "CALL annproc.ann_probe(table => 'nosuch', probe_id => 1, " +
          "nprobe => 2, k => 5)").collect())
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("ann_build")), e.toString)

      // a non-float vector column refuses loudly (no silent narrowing)
      val bad = new SnapshotTable(spark, catRoot.resolve("bad").toString)
      bad.commit(spark.sql(
        "SELECT 1L AS id, array(CAST(1.0 AS DOUBLE)) AS emb"))
      val e2 = intercept[Exception](spark.sql(
        "CALL annproc.ann_build(table => 'bad', id_col => 'id', " +
          "vec_col => 'emb', k => 2)").collect())
      assert(chain(e2).exists(_.contains("ARRAY<FLOAT>")), e2.toString)
    } finally {
      spark.conf.unset("spark.sql.catalog.annproc")
      SnapshotTable.deleteRecursively(catRoot)
    }
  }
}
