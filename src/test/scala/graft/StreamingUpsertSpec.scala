package graft

import graft.operators.Upsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming publish path: `foreachBatch` + the insert-only upsert sink
  * turns an at-least-once stream into exactly-once-per-key — the
  * streaming analog of the reference's MERGE (T3), and the pattern that
  * holds when a restarted pipeline re-reads data it already delivered. */
class StreamingUpsertSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("foreachBatch + upsertParquet: re-delivered batches add nothing " +
      "(exactly-once-per-key)") {
    graft.io.Sources.harnessReadConf(spark)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val base = java.nio.file.Files.createTempDirectory("stream_upsert")
      .toString
    val sink = s"$base/sink"

    def runOnce(tag: String): Unit = {
      val ev = graft.io.Sources.normalizeNsTs(
          spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir), "ts")
        .select(col("user_id"),
          date_trunc("hour", col("ts")).as("h"), col("event_id"))
      val q = ev.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          Upsert.upsertParquet(batch.sparkSession, batch,
            Seq("user_id", "h"), Seq("event_id"), sink, aggDedup = true)
          ()
        }
        // fresh checkpoint per run = the whole input is RE-DELIVERED,
        // simulating an at-least-once source replay
        .option("checkpointLocation", s"$base/chk_$tag")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce("first")
    val expected = graft.io.Sources.table(spark, dir, "events")
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .distinct().count()
    assert(spark.read.parquet(sink).count() == expected)

    runOnce("replay") // full re-delivery: keyed sink must not grow
    assert(spark.read.parquet(sink).count() == expected)
  }

  test("kill mid-stream, restart from the SAME checkpoint: the torn " +
      "batch re-delivers once and is absorbed, committed progress is " +
      "not re-read, and the final sink equals the batch result exactly") {
    // The replay-safety test above re-delivers the WHOLE input through a
    // fresh checkpoint; this one exercises the actual restart protocol:
    // a query dies AFTER its first batch hits the sink but BEFORE the
    // batch commits to the checkpoint (the worst crash window — the
    // offset WAL already names the batch, the commit log doesn't), and
    // the restarted query must resume from the checkpoint: re-deliver
    // exactly the torn batch (absorbed by the idempotent upsert, 0 rows
    // appended), then process only data that arrived while it was down.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("stream_restart").toString
    val sink = s"$base/sink"
    val input = MemoryStream[Long]
    val appended = scala.collection.mutable.ArrayBuffer.empty[Long]
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): Unit = {
      val q = input.toDF()
        .select(col("value").as("k"), (col("value") * 2).as("v"))
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val n = Upsert.upsertParquet(b.sparkSession, b,
            Seq("k"), Seq("v"), sink, aggDedup = true)
          appended.synchronized { appended += n }
          if (crashOnce.get)
            throw new RuntimeException(
              "injected crash: after sink write, before checkpoint commit")
          ()
        }
        .option("checkpointLocation", s"$base/chk") // ONE shared checkpoint
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    input.addData(1L to 500L)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](run())
    assert(appended.toSeq == Seq(500L), "first half must reach the sink " +
      "before the injected crash")
    crashOnce.set(false)
    input.addData(501L to 1000L) // arrives while the pipeline is down
    run() // restart from the same checkpoint
    assert(appended.toSeq == Seq(500L, 0L, 500L),
      "restart must re-deliver exactly the torn batch (absorbed: 0 " +
        s"appended) then the new half once; got $appended")
    assert(spark.read.parquet(sink).count() == 1000L,
      "sink must equal the batch result over the full input")
    graft.io.Sources.deleteRecursively(base)
  }
}
