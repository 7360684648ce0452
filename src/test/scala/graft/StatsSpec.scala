package graft

import graft.operators.{CommitLog, DeleteVectors, SchemaEvolve,
  TableStats}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Manifest-resident per-file column statistics
  * ([[graft.operators.TableStats]]): ANALYZE computes `#stats` bounds
  * in one grouped scan, band reads prune their file list from the
  * manifest alone, pruning is pure I/O elision (always exact), and
  * the records compose with appends, deletion vectors, and column
  * mapping conservatively. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Range-clustered sink: one file per decade bucket of k. */
  private def mkSink(root: String): String = {
    val sink = s"$root/t"
    (0 until 5).foreach { b =>
      (0 until 10).map(i => (b * 10L + i, f"s${b * 10 + i}%03d"))
        .toDF("k", "s").coalesce(1)
        .write.mode("append").parquet(sink)
    }
    CommitLog.ensureLoggedAt(fsOf(sink), new Path(sink))
    sink
  }

  test("analyze + band read: bounds land per (file, column), the " +
    "pruned read equals the plain filter, and exactly the " +
    "out-of-band files are skipped") {
    val root = java.nio.file.Files.createTempDirectory("st1").toString
    val sink = mkSink(root)
    val fs = fsOf(sink); val hp = new Path(sink)
    assert(TableStats.analyze(spark, sink, Seq("k", "s")) == 5L)
    val stats = CommitLog.statsRecords(fs, hp)
    assert(stats.size == 5 &&
      stats.values.forall(m => m.contains("k") && m.contains("s")))
    // numeric band spanning two buckets
    val (keep, skip) = TableStats.pruneBand(fs, hp, "k", 15L, 25L)
    assert(keep.size == 2 && skip.size == 3,
      s"expected 2 kept / 3 skipped, got $keep / $skip")
    val pruned = TableStats.readBand(spark, sink, "k", 15L, 25L)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(pruned == (15L to 25L))
    // string band (lexical bounds)
    val (k2, s2) = TableStats.pruneBand(fs, hp, "s", "s012", "s018")
    assert(k2.size == 1 && s2.size == 4)
    assert(TableStats.readBand(spark, sink, "s", "s012", "s018")
      .count() == 7L)
    // a band no file can hold plans an empty exact read
    assert(TableStats.readBand(spark, sink, "k", 900L, 999L)
      .count() == 0L)
  }

  test("appends stay exact unpruned until the incremental analyze " +
    "catches up; onlyMissing touches only the new file") {
    val root = java.nio.file.Files.createTempDirectory("st2").toString
    val sink = mkSink(root)
    val fs = fsOf(sink); val hp = new Path(sink)
    TableStats.analyze(spark, sink, Seq("k"))
    // logged append of an out-of-band file, NOT yet analyzed
    val tmp = new Path(sink + "__st")
    Seq((100L, "x")).toDF("k", "s").coalesce(1).write.parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(part, new Path(sink, part.getName)))
    fs.delete(tmp, true)
    val (g, live) = CommitLog.ensureLoggedAt(fs, hp)
    CommitLog.commitAppend(fs, hp, g, live, Seq(part.getName))
    // conservative: the unknown file survives every band (exactness)
    val (keep, _) = TableStats.pruneBand(fs, hp, "k", 0L, 5L)
    assert(keep.contains(part.getName))
    assert(TableStats.readBand(spark, sink, "k", 95L, 105L)
      .collect().map(_.getLong(0)).toSeq == Seq(100L))
    // incremental catch-up: exactly the one new file analyzed
    assert(TableStats.analyze(spark, sink, Seq("k")) == 1L)
    val (keep2, _) = TableStats.pruneBand(fs, hp, "k", 0L, 5L)
    assert(!keep2.contains(part.getName),
      "the analyzed append must now prune")
    assert(TableStats.analyze(spark, sink, Seq("k")) == 0L)
  }

  test("encode/compare ordering is exact over adversarial domains: " +
    "negative longs, fractional doubles, and pre-epoch timestamps " +
    "never misprune across a band sweep") {
    val root = java.nio.file.Files.createTempDirectory("st4").toString
    // longs spanning signs and magnitudes, one file per bucket
    val lsink = s"$root/l"
    Seq(Seq(-1000000007L, -999999L), Seq(-5L, 3L),
      Seq(1000L, 4611686018427387904L)).foreach { vs =>
      vs.toDF("k").coalesce(1).write.mode("append").parquet(lsink)
    }
    CommitLog.ensureLoggedAt(fsOf(lsink), new Path(lsink))
    TableStats.analyze(spark, lsink, Seq("k"))
    Seq((-1000000L, 0L), (-10L, -6L), (4L, 999L),
      (Long.MinValue, Long.MaxValue)).foreach { case (lo, hi) =>
      val pruned = TableStats.readBand(spark, lsink, "k", lo, hi)
        .collect().map(_.getLong(0)).toSet
      val plain = CommitLog.read(spark, lsink)
        .filter(col("k") >= lo && col("k") <= hi)
        .collect().map(_.getLong(0)).toSet
      assert(pruned == plain, s"long band [$lo,$hi]")
    }
    // doubles with fractions and exponents (a lexical compare would
    // order "-0.25" and "12.5" wrong)
    val dsink = s"$root/d"
    Seq(Seq(-1.5e9, -0.25), Seq(0.001, 0.75), Seq(12.5, 3.25e8))
      .foreach { vs =>
        vs.toDF("x").coalesce(1).write.mode("append").parquet(dsink)
      }
    CommitLog.ensureLoggedAt(fsOf(dsink), new Path(dsink))
    TableStats.analyze(spark, dsink, Seq("x"))
    Seq((-1.0, 1.0), (-2e9, -1.0), (12.0, 13.0)).foreach {
      case (lo, hi) =>
        val pruned = TableStats.readBand(spark, dsink, "x", lo, hi)
          .collect().map(_.getDouble(0)).toSet
        val plain = CommitLog.read(spark, dsink)
          .filter(col("x") >= lo && col("x") <= hi)
          .collect().map(_.getDouble(0)).toSet
        assert(pruned == plain, s"double band [$lo,$hi]")
    }
    // timestamps spanning the epoch (pre-1970 = NEGATIVE micros)
    val tsink = s"$root/t"
    Seq(Seq("1969-06-01 00:00:00", "1969-12-31 23:59:59"),
      Seq("1970-01-01 00:00:01", "1999-01-01 00:00:00"),
      Seq("2030-01-01 00:00:00", "2031-01-01 00:00:00")).foreach { vs =>
      vs.map(java.sql.Timestamp.valueOf).toDF("ts")
        .coalesce(1).write.mode("append").parquet(tsink)
    }
    CommitLog.ensureLoggedAt(fsOf(tsink), new Path(tsink))
    TableStats.analyze(spark, tsink, Seq("ts"))
    Seq(("1969-01-01 00:00:00", "1969-12-31 23:59:59"),
      ("1969-12-01 00:00:00", "1970-06-01 00:00:00"),
      ("2029-01-01 00:00:00", "2030-06-01 00:00:00")).foreach {
      case (lo, hi) =>
        val (tlo, thi) = (java.sql.Timestamp.valueOf(lo),
          java.sql.Timestamp.valueOf(hi))
        val pruned = TableStats.readBand(spark, tsink, "ts", tlo, thi)
          .count()
        val plain = CommitLog.read(spark, tsink)
          .filter(col("ts") >= lit(tlo) && col("ts") <= lit(thi))
          .count()
        assert(pruned == plain, s"ts band [$lo,$hi]")
    }
  }

  test("bounds stay sound under deletion vectors (raw superset) and " +
    "a mapped sink reads exactly with pruning disabled on mapped " +
    "files") {
    val root = java.nio.file.Files.createTempDirectory("st3").toString
    val sink = mkSink(root)
    val fs = fsOf(sink); val hp = new Path(sink)
    TableStats.analyze(spark, sink, Seq("k"))
    // delete every in-band row of bucket 1; the file still carries
    // its (now loose) bounds, the DV-applied band read stays exact
    DeleteVectors.deleteWhere(spark, sink,
      col("k") >= 15L && col("k") <= 19L)
    assert(TableStats.readBand(spark, sink, "k", 15L, 25L)
      .orderBy("k").collect().map(_.getLong(0)).toSeq == (20L to 25L))
    // rename: stats stay keyed by the physical name → mapped files
    // stop pruning (conservative) but the logical band read is exact
    SchemaEvolve.renameColumn(spark, sink, "k", "key")
    val (keep, skip) = TableStats.pruneBand(fs, hp, "key", 15L, 25L)
    assert(skip.isEmpty, "mapped files must never be skipped")
    assert(TableStats.readBand(spark, sink, "key", 15L, 25L)
      .orderBy("key").collect().map(_.getLong(0)).toSeq ==
      (20L to 25L))
    // analyze on the mapped sink is a loud no-op target-wise
    assert(TableStats.analyze(spark, sink, Seq("key"),
      onlyMissing = false) == 0L)
  }
}
