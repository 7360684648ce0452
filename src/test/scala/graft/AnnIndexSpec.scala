package graft

import graft.operators.{AnnIndex, CommitLog, Compact, DeleteVectors,
  Similarity}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Committed ANN index ([[AnnIndex]] — `#ann` records + `#meta
  * ann.<col>.centroids`): train once, catch up incrementally, probe
  * from committed postings with results equal by construction to the
  * inline [[Similarity.ivfTopKWith]] recompute, deletion vectors
  * filtered, orphaned sidecars vacuum-swept. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vectors(ids: Seq[Long]): DataFrame =
    ids.map(i => (i,
      Array.tabulate(8)(d => math.sin(i * (d + 1) + 1).toFloat)))
      .toDF("vec_id", "embedding")

  private def key(df: DataFrame): Set[(Long, Long, Int)] =
    df.select(col("qid").cast("long"), col("did").cast("long"),
      col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("train once, incremental catch-up, probe ≡ inline recompute, " +
    "DV-filtered, vacuum sweeps retired postings") {
    val root = java.nio.file.Files.createTempDirectory("ann1").toString
    val sink = s"$root/t"
    val fs = fsOf(sink); val hp = new Path(sink)
    val all = (0L until 120L)
    vectors(all.filter(_ % 3 != 2)).repartition(3)
      .write.parquet(sink)
    CommitLog.ensureLoggedAt(fs, hp)
    val filesBefore = CommitLog.ensureLoggedAt(fs, hp)._2.size
    // build: trains centroids + indexes every file, ONE commit
    val n1 = AnnIndex.build(spark, sink, numCentroids = 6, iters = 2)
    assert(n1 == filesBefore.toLong, s"indexed $n1 of $filesBefore")
    val centRel = CommitLog.metaRecords(fs, hp)("ann.embedding.centroids")
    def cents = spark.read.parquet(new Path(hp, centRel).toString)
    val queries = vectors(0L until 5L)
    def indexed = AnnIndex.topK(spark, sink, queries,
      nProbe = 2, k = 3)
    def inline = Similarity.ivfTopKWith(queries,
      CommitLog.read(spark, sink)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("embedding")),
      cents, nProbe = 2, k = 3)
    assert(key(indexed) == key(inline))
    // append: the unindexed files refuse the probe loudly, then
    // catch-up indexes EXACTLY them without retraining
    vectors(all.filter(_ % 3 == 2)).repartition(2)
      .write.format("graft").mode("append").option("path", sink).save()
    val e = intercept[IllegalArgumentException] {
      AnnIndex.topK(spark, sink, queries, 2, 3)
    }
    assert(e.getMessage.contains("#ann"), e.getMessage)
    val newFiles =
      CommitLog.ensureLoggedAt(fs, hp)._2.size - filesBefore
    val n2 = AnnIndex.build(spark, sink, numCentroids = 6, iters = 2)
    assert(n2 == newFiles.toLong,
      s"catch-up must index only the $newFiles new files, got $n2")
    assert(CommitLog.metaRecords(fs, hp)("ann.embedding.centroids")
      == centRel, "catch-up must NOT retrain the centroids")
    assert(key(indexed) == key(inline))
    // deletes: DV'd rows never surface as candidates
    DeleteVectors.deleteWhere(spark, sink, col("vec_id") % 7 === 0)
    assert(key(indexed) == key(inline),
      "indexed probe must exclude DV'd rows exactly like the scan")
    assert(!indexed.collect().exists(_.getLong(1) % 7 == 0))
    // rewrite: compaction retires every record; probe refuses, a
    // rebuild catches up, and the ORPHANED postings become vacuum
    // debris while the referenced ones survive
    graft.operators.DeleteVectors.applyDeletes(spark, sink)
    Compact.compactSink(spark, sink)
    intercept[IllegalArgumentException] {
      AnnIndex.topK(spark, sink, queries, 2, 3)
    }
    AnnIndex.build(spark, sink, numCentroids = 6, iters = 2)
    assert(key(indexed) == key(inline))
    val annDir = new Path(hp, CommitLog.AnnDirName)
    val entriesBefore = fs.listStatus(annDir).length
    // expire (which vacuums internally) sweeps the orphaned postings
    CommitLog.expireGenerations(fs, hp, 1)
    val entriesAfter = fs.listStatus(annDir).length
    assert(entriesAfter < entriesBefore,
      s"orphaned ann postings must be reclaimed: " +
        s"$entriesBefore -> $entriesAfter")
    // the index still serves after the sweep (its sidecars were live)
    assert(key(indexed) == key(inline))
    assert(fs.exists(new Path(hp, centRel)),
      "referenced centroids must survive vacuum")
  }

  test("CALL system.build_ann builds and catches up the committed " +
    "index from SQL") {
    val root = java.nio.file.Files.createTempDirectory("ann2").toString
    spark.conf.set("spark.sql.catalog.ann2",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ann2.warehouse", root)
    spark.sql("CREATE NAMESPACE ann2.db")
    vectors(0L until 60L).repartition(2)
      .write.format("graft").mode("append").saveAsTable("ann2.db.e")
    val r = spark.sql(
      "CALL ann2.system.build_ann('db.e', num_centroids => 4)").head
    assert(r.getLong(0) == 2L, r.toString)
    // catch-up after an append indexes only the new file
    vectors(60L until 80L).coalesce(1)
      .write.format("graft").mode("append")
      .option("path", s"$root/db/e").save()
    val r2 = spark.sql(
      "CALL ann2.system.build_ann('db.e', num_centroids => 4)").head
    assert(r2.getLong(0) == 1L, r2.toString)
    val got = AnnIndex.topK(spark, s"$root/db/e",
      vectors(0L until 3L), nProbe = 2, k = 2)
    assert(got.count() == 6L)
  }
}
