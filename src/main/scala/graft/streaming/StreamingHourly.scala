package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming form of the reference's hourly micro-batch
  * semantics (SURVEY §2.9): the Airflow `@hourly` + `catchup=True` loop
  * (`dags/idh_etl.py:47-53`) becomes a file-source stream with 1-hour
  * tumbling windows; `Trigger.AvailableNow` reproduces the bounded
  * backfill (process everything currently present, then stop).
  *
  * Scale notes: the same plan runs unbounded on a real cluster — the file
  * source discovers new hourly partitions incrementally, the stateful
  * aggregation keeps one row per open window per key, and the watermark
  * (T2: late events collapse into their hour until the watermark passes)
  * bounds state. Here the sink is `memory` for the verify harness; in
  * production it would be a parquet/Delta append sink with the same plan.
  */
object StreamingHourly {
  private val runId = new AtomicInteger(0)

  /** Hourly tumbling count/sum over the events table, executed as a
    * Structured Streaming query with AvailableNow, returned as the
    * materialized result. Matches the batch q24 semantics exactly. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    // ts is TIMESTAMP(NANOS) parquet: stream it as ns longs and truncate
    // to µs, same as graft.io.Sources.table does for batch.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val name = s"stream_hourly_${runId.incrementAndGet()}"
    // Stream the directory with a glob filter (the file-stream source
    // needs a directory base; `$dir/events.parquet` is a single file).
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(col("w.start").as("hour_ts"), col("n_events"),
        col("sum_value"))
      .orderBy("hour_ts")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_streaming_hourly" -> (hourlyAgg _))

  /** Oracle: identical to the batch q24 — streaming and batch must agree. */
  val oracles: Map[String, String] = Map(
    "q46_streaming_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""")
}
