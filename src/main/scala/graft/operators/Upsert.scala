package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Insert-only upsert sink (S8/S9/T3): the Spark re-expression of the
  * reference's staging-table + `MERGE … WHEN NOT MATCHED BY TARGET THEN
  * INSERT` idempotent publish (`dags/idh_etl.py:214-259`). Existing rows
  * are never updated; re-running the same batch adds nothing.
  *
  * Spark shape: dedup incoming on the key columns (deterministic keep-first,
  * matching pandas `drop_duplicates`), left-anti join against the current
  * sink contents, append. At scale the anti-join broadcasts whichever side
  * is small (typically the incoming delta) and the sink stays append-only
  * parquet — no read-modify-write of 100 TB.
  */
object Upsert {

  /** Deterministic dedup-on-keys, keep-first by `orderCols` (U2).
    * `dropDuplicates` alone keeps an *arbitrary* row per key under
    * parallelism; ordering by explicit columns makes re-runs (and the
    * DuckDB oracle) reproducible. */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String],
                     orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Rows of `incoming` whose key is absent from `existing` (J7). */
  def newRowsOnly(incoming: DataFrame, existing: DataFrame,
                  keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** Guards G1/G2 then idempotent append to a parquet path.
    * Returns number of rows appended (−1 when skipped by a guard). */
  def upsertParquet(spark: SparkSession, incoming: DataFrame,
                    keys: Seq[String], orderCols: Seq[String],
                    path: String): Long = {
    // G2: refuse write when key columns are missing from the frame
    val missing = keys.filterNot(incoming.columns.contains)
    if (missing.nonEmpty) {
      System.err.println(s"[upsert] missing key columns $missing — skip")
      return -1L
    }
    // G1: skip empty batches
    if (incoming.isEmpty) return 0L
    val deduped = dedupKeepFirst(incoming, keys, orderCols)
    // first-write detection by explicit existence check, NOT by read
    // failure: a transient listing/permission/corruption error on an
    // existing sink must propagate, not silently degrade into a
    // duplicate-appending "first write"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delta =
      if (fs.exists(hPath)) newRowsOnly(deduped, spark.read.parquet(path), keys)
      else deduped // first write: sink doesn't exist yet
    // count once via an accumulator-free two-phase: persist the tiny delta
    val materialized = delta.cache()
    val n = materialized.count()
    if (n > 0) materialized.write.mode("append").parquet(path)
    materialized.unpersist()
    n
  }
}
