package graft

import graft.operators.{CommitLog, DeleteVectors, SchemaEvolve}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The V2 micro-batch streaming source ([[graft.sources
  * .GraftMicroBatchStream]]): positive engagement pins (the V1 bridge
  * must actually be OFF the plain-layout path), V1 ↔ V2 checkpoint
  * compatibility in both directions, deletion vectors applied inside
  * the per-partition readers, and the documented fallbacks (evolved
  * tables stream V1; `disabledV2MicroBatchReaders` forces V1). */
class GraftStreamV2Spec extends SparkSpec {
  import spark.implicits._

  private def fsOf(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def drain(src: DataFrame, ck: String, out: String): Unit = {
    val q = src.writeStream.format("parquet")
      .option("checkpointLocation", ck).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def sourceDesc(src: DataFrame, ck: String): String = {
    val q = src.writeStream.format("memory")
      .queryName(s"v2pin_${System.nanoTime()}")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val desc = q.lastProgress.sources.head.description
    q.stop()
    desc
  }

  test("plain tables stream through the V2 reader (pinned by the " +
    "progress source description); DVs are filtered inside the " +
    "readers; partition values decode; evolved tables fall back " +
    "to V1") {
    val root = java.nio.file.Files.createTempDirectory("sv2a").toString
    val sink = s"$root/t"
    (0L until 100L).map(i => (i, s"v$i", (i % 3).toInt))
      .toDF("k", "v", "p")
      .repartition(2).write.partitionBy("p").parquet(sink)
    CommitLog.ensureLoggedAt(fsOf(sink), new Path(sink))
    DeleteVectors.deleteWhere(spark, sink, col("k") % 10 === 0)
    val desc = sourceDesc(
      spark.readStream.format("graft").load(sink), s"$root/ck0")
    assert(desc.contains("GraftMicroBatchStream"),
      s"plain layout must stream V2: $desc")
    // snapshot content through the V2 readers: DV'd rows absent,
    // partition values present and typed
    drain(spark.readStream.format("graft").load(sink),
      s"$root/ck1", s"$root/out1")
    val got = spark.read.parquet(s"$root/out1")
    val want = CommitLog.read(spark, sink)
    assert(got.count() == 90L)
    assert(got.orderBy("k").select("k", "v", "p")
      .collect().toSeq ==
      want.orderBy("k").select("k", "v", "p").collect().toSeq)
    // appends stream as tail windows through V2 too
    Seq((1000L, "x", 9)).toDF("k", "v", "p")
      .write.format("graft").mode("append").option("path", sink).save()
    drain(spark.readStream.format("graft").load(sink),
      s"$root/ck1", s"$root/out1")
    assert(spark.read.parquet(s"$root/out1").count() == 91L)
    // an EVOLVED table (rename → #colmap records) streams V1
    val sink2 = s"$root/e"
    Seq((1L, "a")).toDF("k", "v").coalesce(1).write.parquet(sink2)
    CommitLog.ensureLoggedAt(fsOf(sink2), new Path(sink2))
    SchemaEvolve.renameColumn(spark, sink2, "v", "w")
    val desc2 = sourceDesc(
      spark.readStream.format("graft").load(sink2), s"$root/ck2")
    assert(desc2.contains("GraftStreamSource"),
      s"evolved layout must fall back to the V1 source: $desc2")
  }

  test("checkpoint compatibility: a stream started on the V1 bridge " +
    "restarts on the V2 reader (and back) from the same checkpoint " +
    "with no re-delivery and no loss") {
    val root = java.nio.file.Files.createTempDirectory("sv2b").toString
    val sink = s"$root/t"
    val ck = s"$root/ck"; val out = s"$root/out"
    val v1Conf = "spark.sql.streaming.disabledV2MicroBatchReaders"
    (0L until 50L).map(i => (i, i * 2)).toDF("k", "v")
      .coalesce(2).write.parquet(sink)
    CommitLog.ensureLoggedAt(fsOf(sink), new Path(sink))
    def append(from: Long, until: Long): Unit =
      (from until until).map(i => (i, i * 2)).toDF("k", "v")
        .coalesce(1).write.format("graft").mode("append")
        .option("path", sink).save()
    val was = spark.conf.getOption(v1Conf)
    try {
      // leg 1: V1 bridge writes the checkpoint
      spark.conf.set(v1Conf,
        classOf[graft.sources.GraftDataSource].getName)
      val d1 = sourceDesc(
        spark.readStream.format("graft").load(sink), s"$root/ckpin1")
      assert(d1.contains("GraftStreamSource"), d1)
      drain(spark.readStream.format("graft").load(sink), ck, out)
      assert(spark.read.parquet(out).count() == 50L)
      // leg 2: V2 resumes the V1 checkpoint — only the new rows
      append(50L, 70L)
      spark.conf.unset(v1Conf)
      drain(spark.readStream.format("graft").load(sink), ck, out)
      assert(spark.read.parquet(out).count() == 70L,
        "V2 must resume the V1 checkpoint without re-delivery")
      // leg 3: back to V1 on the V2-written checkpoint
      append(70L, 80L)
      spark.conf.set(v1Conf,
        classOf[graft.sources.GraftDataSource].getName)
      drain(spark.readStream.format("graft").load(sink), ck, out)
      assert(spark.read.parquet(out).count() == 80L,
        "V1 must resume the V2 checkpoint without re-delivery")
      assert(spark.read.parquet(out).select("k").distinct().count()
        == 80L, "no duplicates across the V1/V2 legs")
    } finally {
      was match {
        case Some(v) => spark.conf.set(v1Conf, v)
        case None => spark.conf.unset(v1Conf)
      }
    }
  }

  test("a stream started on an EMPTY declared-partitioned table " +
    "reads appended partition values (declared layout fallback), " +
    "and option(branch) refuses loudly on streaming reads") {
    val root = java.nio.file.Files.createTempDirectory("sv2d").toString
    spark.conf.set("spark.sql.catalog.sv2d",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sv2d.warehouse", root)
    spark.sql("CREATE NAMESPACE sv2d.db")
    spark.sql("CREATE TABLE sv2d.db.t (k BIGINT, p INT) USING graft " +
      "PARTITIONED BY (p)")
    val path = s"$root/db/t"
    // stream starts while the table is EMPTY: the partition layout is
    // only declared (#meta partition.cols), no file path carries it yet
    val ck = s"$root/ck"; val out = s"$root/out"
    drain(spark.readStream.format("graft").load(path), ck, out)
    spark.sql("INSERT INTO sv2d.db.t SELECT id, CAST(id % 3 AS INT) " +
      "FROM range(0, 30)")
    drain(spark.readStream.format("graft").load(path), ck, out)
    val got = spark.read.parquet(out)
    assert(got.count() == 30L)
    assert(got.filter(col("p").isNull).count() == 0L,
      "partition values must come from the declared layout, not NULL")
    assert(got.groupBy("p").count().count() == 3L)
    // branch reads are audit staging — streaming them is refused, not
    // silently redirected to main
    CommitLog.createBranch(fsOf(path), new Path(path), "b")
    val e = intercept[Exception] {
      spark.readStream.format("graft").option("branch", "b")
        .load(path)
        .writeStream.format("memory").queryName("sv2d_b")
        .option("checkpointLocation", s"$root/ckb")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage.contains("branch"), e.getMessage)
  }

  test("V2 rate limiting: maxFilesPerTrigger splits the snapshot, " +
    "maxGensPerTrigger bounds the tail, and the admission-control " +
    "start offset resumes caps across a restart") {
    val root = java.nio.file.Files.createTempDirectory("sv2c").toString
    val sink = s"$root/t"
    val ck = s"$root/ck"; val out = s"$root/out"
    (0L until 40L).map(i => (i, i)).toDF("k", "v")
      .repartition(4).write.parquet(sink)
    CommitLog.ensureLoggedAt(fsOf(sink), new Path(sink))
    (0 until 3).foreach { b =>
      (100L * (b + 1) until 100L * (b + 1) + 5L).map(i => (i, i))
        .toDF("k", "v").coalesce(1).write.format("graft")
        .mode("append").option("path", sink).save()
    }
    val src = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", 2)
      .option("maxGensPerTrigger", 1).load(sink)
    val q = src.writeStream.format("parquet")
      .option("checkpointLocation", ck).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      "caps must split the drain into several micro-batches:\n" +
        q.recentProgress.map(p => p.numInputRows).mkString(","))
    assert(spark.read.parquet(out).count() == 55L)
    // restart: nothing re-delivers
    (0 until 2).foreach { b =>
      (500L + b until 501L + b).map(i => (i, i))
        .toDF("k", "v").coalesce(1).write.format("graft")
        .mode("append").option("path", sink).save()
    }
    val q2 = src.writeStream.format("parquet")
      .option("checkpointLocation", ck).option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 57L)
    assert(spark.read.parquet(out).select("k").distinct().count()
      == 57L)
  }
}
