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

  /** Dedup-on-keys as a single hash aggregation: keeps the row that is
    * lexicographically smallest by (orderCols, remaining cols) per key —
    * `min(struct(...))` under struct ordering, so no window, no sort.
    *
    * Same "deterministic keep-first by orderCols" contract as
    * [[dedupKeepFirst]] (and strictly MORE deterministic: ties on
    * orderCols resolve by the remaining columns instead of arbitrarily).
    * Preferred for publish-scale inputs whose keys are nearly unique —
    * the window formulation shuffles AND sorts every partition, while
    * this is a partial+final HashAggregate pair. */
  def dedupKeepFirstAgg(df: DataFrame, keys: Seq[String],
                        orderCols: Seq[String]): DataFrame = {
    // key columns are constant within a group — drop them from the
    // payload (an orderCol that IS a key would otherwise come back as a
    // second column of the same name and make the final select ambiguous)
    val ord = orderCols.filterNot(keys.contains)
    val rest = df.columns.filterNot(c =>
      keys.contains(c) || ord.contains(c)).toSeq
    val payload = ord ++ rest
    if (payload.isEmpty) return df.select(keys.map(col): _*).distinct()
    df.groupBy(keys.map(col): _*)
      .agg(min(struct(payload.map(col): _*)).as("__row"))
      .select((keys.map(col) ++
        payload.map(c => col(s"__row.$c").as(c))): _*)
      .select(df.columns.toIndexedSeq.map(col): _*) // original column order
  }

  /** Rows of `incoming` whose key is absent from `existing` (J7). */
  def newRowsOnly(incoming: DataFrame, existing: DataFrame,
                  keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** Guards G1/G2 then idempotent append to a parquet path.
    * Returns number of rows appended (−1 when skipped by a guard).
    *
    * Runs as ONE Spark action: the delta is appended with an observed
    * row count (`Dataset.observe`), so there is no separate
    * isEmpty/count/cache pass — at publish scale the dominant cost of a
    * multi-table loop is sequential job latency, not bytes. G1 (never
    * create/keep an empty sink from an empty batch) holds because a
    * 0-row append writes no data files, and a 0-row *first* write
    * removes the freshly created empty sink directory. */
  def upsertParquet(spark: SparkSession, incoming: DataFrame,
                    keys: Seq[String], orderCols: Seq[String],
                    path: String, aggDedup: Boolean = false): Long = {
    // G2: refuse write when key columns are missing from the frame
    val missing = keys.filterNot(incoming.columns.contains)
    if (missing.nonEmpty) {
      System.err.println(s"[upsert] missing key columns $missing — skip")
      return -1L
    }
    val deduped =
      if (aggDedup) dedupKeepFirstAgg(incoming, keys, orderCols)
      else dedupKeepFirst(incoming, keys, orderCols)
    // first-write detection by explicit existence check, NOT by read
    // failure: a transient listing/permission/corruption error on an
    // existing sink must propagate, not silently degrade into a
    // duplicate-appending "first write"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existed = fs.exists(hPath)
    val delta =
      if (existed) newRowsOnly(deduped, spark.read.parquet(path), keys)
      else deduped // first write: sink doesn't exist yet
    val obs = new org.apache.spark.sql.Observation()
    delta.observe(obs, count(lit(1)).as("n"))
      .write.mode("append").parquet(path)
    val n = obs.get("n").asInstanceOf[Long]
    if (n == 0 && !existed) fs.delete(hPath, true) // G1: no empty sink
    n
  }
}
