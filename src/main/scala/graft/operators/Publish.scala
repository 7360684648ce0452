package graft.operators

import graft.model.StarModel
import graft.model.StarModel.TableModel
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's end-to-end publish loop, Spark-first: every run builds
  * all six star tables and MERGEs each into its warehouse table on the
  * table's declared unique key (`/root/reference/dags/idh_etl.py:182-272`,
  * keys at `src/enums.py:24-35`) — re-running the same batch must add
  * zero rows to every sink.
  *
  * Per table the reference does: query → drop dup columns → validate key
  * columns exist → `drop_duplicates(subset=keys)` → staging load →
  * `MERGE … WHEN NOT MATCHED BY TARGET THEN INSERT` → drop staging.
  * The Spark shape: builder → [[StarModel.conform]] (the declared-schema
  * load step) → [[Upsert.upsertParquet]] (key validation + keyed dedup +
  * left-anti + append). No staging hop is needed — the anti-join IS the
  * NOT MATCHED clause, and one SparkSession replaces the staging-table
  * lifecycle (S9).
  *
  * Scale shape: each upsert's anti-join broadcasts the small side
  * (typically the new-keys delta); sinks stay append-only parquet, so a
  * re-run reads only sink *keys*, never rewrites data. The six tables
  * publish as six independent lineages — the Spark scheduler interleaves
  * their jobs exactly as the reference's Airflow fan-out did with tasks
  * (T5), with no process-per-table machinery.
  */
object Publish {

  /** The six builders, in the reference's Table-enum order, as
    * (model, builder) pairs over the staging analogs. */
  def builders(s: SparkSession, dir: String): Seq[(TableModel, DataFrame)] =
    Seq(
      StarModel.lineDim    -> graft.queries.StarSchema.q40LineDim(s, dir),
      StarModel.stopDim    -> graft.queries.StarSchema.q41StopDim(s, dir),
      StarModel.vehicleDim -> graft.queries.StarSchema.q42VehicleDim(s, dir),
      StarModel.weatherDim -> graft.queries.StarSchema.q43WeatherDim(s, dir),
      StarModel.timeDim    -> graft.queries.CoreQueries.q17TimeDim(s, dir),
      StarModel.delayFact  -> graft.queries.StarSchema.q44DelayFact(s, dir),
    )

  /** One publish run: conform + upsert every table into
    * `sinkRoot/<TableName>`. Returns (table, rowsAppended) in table
    * order. Deterministic keep-first: rows are deduped on the key with
    * the non-key columns as the tie-break order.
    *
    * The six tables publish CONCURRENTLY (Scala Futures over independent
    * sinks) — the Spark scheduler interleaves their jobs exactly as the
    * reference's Airflow `expand(table=list(Table))` fan-out ran six
    * mapped tasks (T5, `dags/idh_etl.py:272`). With six independent
    * one-action upserts the loop's cost is the slowest table, not the
    * sum of per-job scheduling latencies. */
  def publishAll(s: SparkSession, dir: String, sinkRoot: String)
  : Seq[(String, Long)] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futs = builders(s, dir).map { case (m, df) =>
      Future {
        val conformed = StarModel.conform(df, m.schema)
        val orderCols = m.schema.fieldNames.filterNot(m.keys.contains).toSeq
        // aggDedup: publish inputs (esp. DelayFact at 1M+ rows with a
        // nearly-unique composite key) dedup as one hash aggregation
        // instead of a window sort over every key partition
        m.name -> Upsert.upsertParquet(s, conformed, m.keys,
          if (orderCols.nonEmpty) orderCols else m.keys,
          s"$sinkRoot/${m.name}", aggDedup = true)
      }
    }
    futs.map(Await.result(_, Duration.Inf))
  }

  /** Publish twice into a fresh sink and report (table, rows_first,
    * rows_second): the idempotence proof the reference gets from MERGE.
    * rows_first = distinct keys of the builder output; rows_second must
    * be 0 for every table. */
  def publishTwiceSummary(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_publish_")
      .toString
    try {
      val first = publishAll(s, dir, root)
      val second = publishAll(s, dir, root)
      import s.implicits._
      first.zip(second)
        .map { case ((name, n1), (_, n2)) => (name, n1, n2) }
        .toDF("table_name", "rows_first", "rows_second")
        .orderBy("table_name")
    } finally {
      // the summary is driver-side counts — the sinks are scratch and
      // would otherwise accumulate ~2× the star schema per invocation
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
        .asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
