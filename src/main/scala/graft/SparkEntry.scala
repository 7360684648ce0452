package graft

import graft.queries.{AnalyticsQueries, CoreQueries, LearnedQueries, MaintenanceQueries, PipelineQueries, ScaleQueries, SinkQueries, StarSchema, WarehouseQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator row of SURVEY §2 to a
  * `(SparkSession, sfDir) => DataFrame`; `oracleSql` carries the equivalent
  * DuckDB SQL the driver hash-compares against on the same parquet tables.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-way broadcast star join + aggregate (SURVEY §2.4 J3). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q09StarJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ PipelineQueries.all ++ StarSchema.all ++
      graft.streaming.StreamingHourly.all ++ SinkQueries.all ++
      AnalyticsQueries.all ++ MaintenanceQueries.all ++ ScaleQueries.all ++
      LearnedQueries.all ++ WarehouseQueries.all

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ PipelineQueries.oracles ++ StarSchema.oracles ++
      graft.streaming.StreamingHourly.oracles ++ SinkQueries.oracles ++
      AnalyticsQueries.oracles ++ MaintenanceQueries.oracles ++
      ScaleQueries.oracles ++ LearnedQueries.oracles ++
      WarehouseQueries.oracles
}
