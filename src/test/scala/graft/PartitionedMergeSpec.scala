package graft

import graft.operators.{CommitLog, Merge}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The row-level merge family on HIVE-PARTITIONED sinks: the rewrite
  * lands under the same partition scheme (recursive swap preserving
  * `k=v` levels), untouched partitions stay byte-identical, and the
  * erasure MERGE — the right-to-be-forgotten path a partitioned
  * 100 TB corpus actually runs — touches only the partitions holding
  * the keys. Previously the family was flat-only (a partitioned sink
  * failed loudly at the schema check because partition columns never
  * materialized without basePath). */
class PartitionedMergeSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** pt=a holds k 1..4, pt=b holds k 5..8, two files per partition. */
  private def mkSink(root: String): String = {
    val sink = s"$root/t"
    Seq(1L, 2L, 5L, 6L).zip(Seq("a", "a", "b", "b"))
      .toDF("k", "pt").withColumn("v", col("k") * 10)
      .repartition(col("pt"))
      .write.partitionBy("pt").mode("append").parquet(sink)
    Seq(3L, 4L, 7L, 8L).zip(Seq("a", "a", "b", "b"))
      .toDF("k", "pt").withColumn("v", col("k") * 10)
      .repartition(col("pt"))
      .write.partitionBy("pt").mode("append").parquet(sink)
    CommitLog.ensureLoggedAt(fsOf(sink), new Path(sink))
    sink
  }

  private def state(sink: String): Seq[(Long, Long, String)] =
    CommitLog.read(spark, sink).select("k", "v", "pt").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq

  test("mergeParquet on a partitioned sink: updates and inserts land " +
    "under their partition dirs, untouched partitions keep their " +
    "exact files, partition values survive the rewrite") {
    val root = java.nio.file.Files.createTempDirectory("pm1").toString
    val sink = mkSink(root)
    val fs = fsOf(sink); val hp = new Path(sink)
    val (_, liveBefore) = CommitLog.ensureLoggedAt(fs, hp)
    val bFilesBefore = liveBefore.filter(_.startsWith("pt=b/")).toSet
    // update k=1 (pt=a), insert k=9 into pt=b
    val st = Merge.mergeParquet(spark,
      Seq((1L, "a", 111L), (9L, "b", 90L)).toDF("k", "pt", "v"),
      Seq("k"), sink)
    assert(st.rowsUpdated == 1L && st.rowsInserted == 1L)
    assert(state(sink) == Seq((1L, 111L, "a"), (2L, 20L, "a"),
      (3L, 30L, "a"), (4L, 40L, "a"), (5L, 50L, "b"), (6L, 60L, "b"),
      (7L, 70L, "b"), (8L, 80L, "b"), (9L, 90L, "b")))
    val (_, liveAfter) = CommitLog.ensureLoggedAt(fs, hp)
    assert(liveAfter.forall(_.matches("pt=[ab]/.*\\.parquet")),
      s"every live file must sit under a partition dir: $liveAfter")
    // pt=b's ORIGINAL files are untouched (k=9 is a fresh file there)
    assert(bFilesBefore.subsetOf(liveAfter.toSet),
      "untouched partition files must keep their exact names")
  }

  test("eraseParquet on a partitioned corpus: only the partitions " +
    "holding the keys are rewritten; the rest stay byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("pm2").toString
    val sink = mkSink(root)
    val fs = fsOf(sink); val hp = new Path(sink)
    val (_, liveBefore) = CommitLog.ensureLoggedAt(fs, hp)
    val bBefore = liveBefore.filter(_.startsWith("pt=b/")).toSet
    val es = Merge.eraseParquet(spark,
      Seq(Tuple1(2L), Tuple1(3L)).toDF("k"), Seq("k"), sink)
    assert(es.rowsDeleted == 2L)
    // both erased keys live in pt=a; pt=b never touched
    val (_, liveAfter) = CommitLog.ensureLoggedAt(fs, hp)
    assert(liveAfter.filter(_.startsWith("pt=b/")).toSet == bBefore)
    assert(state(sink).map(_._1) == Seq(1L, 4L, 5L, 6L, 7L, 8L))
    assert(state(sink).forall { case (k, v, pt) =>
      v == k * 10 && pt == (if (k <= 4) "a" else "b") })
  }

  test("applyCdcParquet on a partitioned sink: tri-branch MERGE in " +
    "one pass, partition layout preserved") {
    val root = java.nio.file.Files.createTempDirectory("pm3").toString
    val sink = mkSink(root)
    val changes = Seq(
      (1L, "a", 11L, "U"),  // matched update
      (9L, "b", 90L, "U"),  // insert
      (6L, "b", 0L, "D")    // delete
    ).toDF("k", "pt", "v", "op")
    val st = Merge.applyCdcParquet(spark, changes, Seq("k"), "op", sink)
    assert(st.rowsUpdated == 1L && st.rowsInserted == 1L &&
      st.rowsDeleted == 1L)
    assert(state(sink) == Seq((1L, 11L, "a"), (2L, 20L, "a"),
      (3L, 30L, "a"), (4L, 40L, "a"), (5L, 50L, "b"), (7L, 70L, "b"),
      (8L, 80L, "b"), (9L, 90L, "b")))
    val fs = fsOf(sink)
    val (_, live) = CommitLog.ensureLoggedAt(fs, new Path(sink))
    assert(live.forall(_.startsWith("pt=")))
  }

  test("a sink mixing partitioned and root-level data files is " +
    "refused loudly, not silently merged") {
    val root = java.nio.file.Files.createTempDirectory("pm4").toString
    val sink = mkSink(root)
    // sneak a flat file next to the partition dirs
    Seq((99L, "a", 990L)).toDF("k", "pt", "v").coalesce(1)
      .write.mode("append").parquet(sink)
    val fs = fsOf(sink); val hp = new Path(sink)
    val (g, _) = CommitLog.ensureLoggedAt(fs, hp)
    CommitLog.commitNext(fs, hp, g, CommitLog.listDataFiles(fs, hp))
    val e = intercept[IllegalArgumentException] {
      Merge.mergeParquet(spark,
        Seq((1L, "a", 111L)).toDF("k", "pt", "v"), Seq("k"), sink)
    }
    assert(e.getMessage.contains("inconsistent partition layouts"))
  }
}
