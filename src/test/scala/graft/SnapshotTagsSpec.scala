package graft

import graft.operators.CommitLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Snapshot TAGS (Iceberg refs, the immutable kind): a `#meta
  * ref.tag.<name>` record pins a name to a committed generation;
  * tagged generations are protected from expire (and through
  * vacuum's retained-manifest liveness, their files stay on disk);
  * `versionAsOf` / SQL `VERSION AS OF` accept tag names. */
class SnapshotTagsSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkSink(root: String): String = {
    val sink = s"$root/t"
    (1 to 10).map(i => (i.toLong, s"g0_$i")).toDF("k", "s")
      .coalesce(1).write.mode("append").parquet(sink)
    CommitLog.ensureLoggedAt(fsOf(sink), new Path(sink))
    sink
  }

  private def append(sink: String, gen: Int): Unit =
    (1 to 10).map(i => (gen * 100L + i, s"g${gen}_$i"))
      .toDF("k", "s").coalesce(1)
      .write.format("graft").mode("append")
      .option("path", sink).save()

  test("create/resolve/read/drop: a tag reads the pinned snapshot " +
    "through the V2 option and refuses bad names, duplicates, and " +
    "unknown or unretained generations") {
    val root = java.nio.file.Files.createTempDirectory("tag1").toString
    val sink = mkSink(root)
    val fs = fsOf(sink); val hp = new Path(sink)
    val g0 = CommitLog.generations(fs, hp).last
    append(sink, 1)
    CommitLog.createTag(fs, hp, "baseline", Some(g0))
    append(sink, 2)
    // tag resolution + tag read ≡ generation read
    assert(CommitLog.tags(fs, hp) == Map("baseline" -> g0))
    assert(CommitLog.resolveTag(fs, hp, "baseline") == g0)
    val viaTag = spark.read.format("graft")
      .option("versionAsOf", "baseline").load(sink)
    assert(viaTag.count() == 10L)
    assert(viaTag.orderBy("k").collect().toSeq ==
      CommitLog.readAt(spark, sink, g0).orderBy("k").collect().toSeq)
    // the head still reads everything
    assert(CommitLog.read(spark, sink).count() == 30L)
    def refuses(f: => Any): Boolean =
      try { f; false } catch { case _: Exception => true }
    assert(refuses(CommitLog.createTag(fs, hp, "baseline", None)),
      "duplicate tag must refuse")
    assert(refuses(CommitLog.createTag(fs, hp, "12", None)),
      "all-digit tag name must refuse (VERSION AS OF ambiguity)")
    assert(refuses(CommitLog.createTag(fs, hp, "bad name", None)))
    assert(refuses(CommitLog.createTag(fs, hp, "x", Some(9999L))),
      "unretained generation must refuse")
    assert(refuses(spark.read.format("graft")
      .option("versionAsOf", "nosuch").load(sink)),
      "unknown tag must refuse loudly")
    // drop → resolution gone
    assert(CommitLog.dropTag(fs, hp, "baseline") == g0)
    assert(CommitLog.tags(fs, hp).isEmpty)
    assert(refuses(CommitLog.dropTag(fs, hp, "baseline")))
  }

  test("expire skips tagged generations and their files stay " +
    "readable; dropping the tag makes them expirable and vacuum " +
    "reclaims the bytes") {
    val root = java.nio.file.Files.createTempDirectory("tag2").toString
    val sink = mkSink(root)
    val fs = fsOf(sink); val hp = new Path(sink)
    val g0 = CommitLog.generations(fs, hp).last
    append(sink, 1); append(sink, 2); append(sink, 3)
    CommitLog.createTag(fs, hp, "audit-2024", Some(g0))
    // expire keep-last-1: everything but the head AND the tagged
    // generation goes
    CommitLog.expireGenerations(fs, hp, 1)
    val retained = CommitLog.generations(fs, hp)
    assert(retained.contains(g0),
      s"tagged generation $g0 must survive expire (retained: " +
        s"$retained)")
    // the tagged snapshot still reads in full (files not vacuumed)
    assert(spark.read.format("graft")
      .option("versionAsOf", "audit-2024").load(sink).count() == 10L)
    val filesBefore = CommitLog.readAt(spark, sink, g0).count()
    assert(filesBefore == 10L)
    // drop the tag: the generation becomes expirable, vacuum reclaims
    CommitLog.dropTag(fs, hp, "audit-2024")
    CommitLog.expireGenerations(fs, hp, 1)
    assert(!CommitLog.generations(fs, hp).contains(g0))
    def refuses(f: => Any): Boolean =
      try { f; false } catch { case _: Exception => true }
    assert(refuses(CommitLog.readAt(spark, sink, g0).count()))
    // head content intact throughout
    assert(CommitLog.read(spark, sink).count() == 40L)
  }

  test("SQL surface: VERSION AS OF 'tag' on a catalog table, and the " +
    "create_tag/drop_tag/tags procedures round-trip") {
    val root = java.nio.file.Files.createTempDirectory("tag3").toString
    val cat = "tagcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$root/wh")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, s STRING) " +
        "USING graft")
      spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b')")
      val tagged = spark.sql(
        s"CALL $cat.system.create_tag('db.t', 'release-1')").head
      assert(tagged.getString(0) == "release-1")
      val pinned = tagged.getLong(1)
      spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 'c')")
      // tag reads the pinned snapshot; a generation number still works
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
        "VERSION AS OF 'release-1'").head.getLong(0) == 2L)
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.t " +
        s"VERSION AS OF $pinned").head.getLong(0) == 2L)
      assert(spark.table(s"$cat.db.t").count() == 3L)
      val listed = spark.sql(s"CALL $cat.system.tags('db.t')")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(listed == Seq(("release-1", pinned)))
      val dropped = spark.sql(
        s"CALL $cat.system.drop_tag('db.t', 'release-1')").head
      assert(dropped.getLong(1) == pinned)
      assert(spark.sql(s"CALL $cat.system.tags('db.t')").count() == 0L)
      def refuses(f: => Any): Boolean =
        try { f; false } catch { case _: Exception => true }
      assert(refuses(spark.sql(s"SELECT * FROM $cat.db.t " +
        "VERSION AS OF 'release-1'").collect()))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $cat.db.t")
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }
}
