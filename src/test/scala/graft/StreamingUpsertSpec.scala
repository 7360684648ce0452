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
}
