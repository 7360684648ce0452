package graft

import graft.operators.{Cluster, CommitLog, DeleteVectors, TableStats}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}

/** OPTIMIZE ZORDER BY ([[Cluster.zorderBy]]): after the rewrite, the
  * manifest's per-file bounds are tight on EVERY clustering column,
  * so a selective band on ANY of them prunes files — which a linear
  * sort can only do for its leading column. The rewrite is also a
  * debt paydown: DV'd rows stay deleted, rows are preserved exactly. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("zorderBy: both clustered dimensions prune after the rewrite, " +
    "a linear sort serves only its leading column, and rows + DV " +
    "deletions survive the rewrite exactly") {
    val root = java.nio.file.Files.createTempDirectory("zo1").toString
    // uniform uncorrelated 2-D cloud: x walks 0..999, y is a
    // coprime-multiplier shuffle of the same range
    def cloud = spark.range(100000).select(
      (col("id") % 1000).as("x"),
      (col("id") * 7919 % 1000).as("y"),
      col("id").as("payload"))
    val sink = s"$root/z"
    cloud.repartition(8).write.parquet(sink)
    val fs = fsOf(sink); val hp = new Path(sink)
    CommitLog.ensureLoggedAt(fs, hp)
    // pre-existing coverage on a NON-clustering column must survive
    // the rewrite (records leave with files; the re-analyze unions)
    TableStats.analyze(spark, sink, Seq("payload"))
    DeleteVectors.deleteWhere(spark, sink, col("x") === 5L)
    val want = CommitLog.read(spark, sink)
      .agg(count(lit(1)), sum("x"), sum("y"), sum("payload")).head
    val (before, after) = Cluster.zorderBy(spark, sink,
      Seq("x", "y"), nFiles = 16)
    assert(before == 8L && after == 16L)
    // rows preserved exactly, deletions included (debt paydown)
    val got = CommitLog.read(spark, sink)
      .agg(count(lit(1)), sum("x"), sum("y"), sum("payload")).head
    assert(got == want, s"rewrite must preserve rows: $got vs $want")
    assert(CommitLog.read(spark, sink).filter(col("x") === 5L)
      .count() == 0L, "DV'd rows must stay deleted after the rewrite")
    assert(CommitLog.dvRecords(fs, hp).isEmpty,
      "the rewrite replaces DV'd files — no records remain")
    // the non-clustering column's stats coverage survived the rewrite
    assert(CommitLog.statsRecords(fs, hp).values
      .forall(_.contains("payload")),
      "zorderBy must re-analyze previously covered columns too")
    // BOTH dimensions prune: a 5%-wide band on either column skips
    // at least half the 16 hypercube files, manifest-only
    val (keptX, skippedX) = TableStats.pruneFiles(fs, hp, Seq(
      GreaterThanOrEqual("x", 100L), LessThanOrEqual("x", 150L)))
    val (keptY, skippedY) = TableStats.pruneFiles(fs, hp, Seq(
      GreaterThanOrEqual("y", 100L), LessThanOrEqual("y", 150L)))
    assert(skippedX.size >= 8,
      s"x band must prune hypercubes: kept=${keptX.size} " +
        s"skipped=${skippedX.size}")
    assert(skippedY.size >= 8,
      s"y band must prune hypercubes: kept=${keptY.size} " +
        s"skipped=${skippedY.size}")
    // exactness above the pruned scan
    assert(CommitLog.read(spark, sink)
      .filter(col("x").between(100L, 150L)).count() ==
      cloud.filter(col("x").between(100L, 150L) && col("x") =!= 5L)
        .count())

    // the linear-sort baseline: same data range-sorted by x ONLY —
    // x prunes fine, y cannot prune at all (every x-slab spans y)
    val lin = s"$root/lin"
    cloud.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(lin)
    val lfs = fsOf(lin); val lhp = new Path(lin)
    CommitLog.ensureLoggedAt(lfs, lhp)
    TableStats.analyze(spark, lin, Seq("x", "y"))
    val (_, linSkipX) = TableStats.pruneFiles(lfs, lhp, Seq(
      GreaterThanOrEqual("x", 100L), LessThanOrEqual("x", 150L)))
    val (_, linSkipY) = TableStats.pruneFiles(lfs, lhp, Seq(
      GreaterThanOrEqual("y", 100L), LessThanOrEqual("y", 150L)))
    assert(linSkipX.size >= 12, "linear serves its leading column")
    assert(linSkipY.size == 0,
      s"a linear sort is blind on the second column " +
        s"(skipped ${linSkipY.size}) — the property Z-ordering adds")
  }

  test("zorderBy refusals are loud: single column, hive layouts, " +
    "unknown columns, all-null columns") {
    val root = java.nio.file.Files.createTempDirectory("zo2").toString
    val flat = s"$root/flat"
    spark.range(100).select(col("id").as("x"), (col("id") % 7).as("y"),
        lit(null).cast("long").as("z"))
      .coalesce(1).write.parquet(flat)
    CommitLog.ensureLoggedAt(fsOf(flat), new Path(flat))
    intercept[IllegalArgumentException] {
      Cluster.zorderBy(spark, flat, Seq("x"), 4)
    }
    intercept[IllegalArgumentException] {
      Cluster.zorderBy(spark, flat, Seq("x", "nope"), 4)
    }
    intercept[IllegalArgumentException] {
      Cluster.zorderBy(spark, flat, Seq("x", "z"), 4) // all-null
    }
    val hive = s"$root/hive"
    spark.range(100).select(col("id").as("x"), (col("id") % 3).as("p"),
        (col("id") % 7).as("y"))
      .write.partitionBy("p").parquet(hive)
    CommitLog.ensureLoggedAt(fsOf(hive), new Path(hive))
    intercept[IllegalArgumentException] {
      Cluster.zorderBy(spark, hive, Seq("x", "y"), 4)
    }
  }
}
