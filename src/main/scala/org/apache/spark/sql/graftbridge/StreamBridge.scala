package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Minimal `private[sql]` bridge for the graft streaming source.
  *
  * A V1 streaming `Source.getBatch` must return a DataFrame whose
  * logical plan is flagged `isStreaming = true`
  * (MicroBatchExecution asserts it); the only constructor for such a
  * frame — `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)` — is `private[sql]`. Spark's own file stream
  * source calls it directly; third-party V1 sources have always
  * reached it through a one-function bridge object in an
  * `org.apache.spark.sql.*` package (the pattern of the classic
  * Cassandra/Redshift connectors). This object is that bridge and
  * nothing else: no other private API is touched. */
object StreamBridge {

  /** `df`'s rows re-wrapped as a streaming-flagged frame with the
    * same schema — the batch plan is executed as planned (toRdd), the
    * streaming flag only satisfies the engine's replacement of the
    * streaming relation with this micro-batch. */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for a streaming SINK's `addBatch`: the engine hands
    * an incrementally-planned frame whose logical plan is
    * streaming-flagged, on which batch writers (`df.write`) refuse to
    * run; re-wrap its rows as a plain batch frame. */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
