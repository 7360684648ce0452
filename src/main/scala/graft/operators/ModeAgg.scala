package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tie-broken mode-per-group — the reference's signature operator (A4/W1,
  * used twice to pick the most-frequent trip length / stop count per route,
  * `src/queries.py:22-35` and `:45-58`): count per (group, value), then
  * `row_number() OVER (PARTITION BY group ORDER BY count DESC, value DESC)`
  * and keep rank 1.
  *
  * Scale shape: two hash aggregations + one window.
  *   1. `groupBy(group, value).count()` — partial (map-side) + final
  *      aggregate, shuffles only the distinct (group,value) pairs, which is
  *      usually orders of magnitude smaller than the input;
  *   2. the window re-shuffles only that aggregated frame by `group`.
  * At 100 TB the expensive exchange is step 1's, and Spark's partial
  * aggregation keeps it proportional to distinct pairs, not rows. Spark's
  * built-in `mode()` (3.4+) lacks the deterministic value-desc tie-break,
  * so the window formulation is kept for oracle-exact results.
  */
object ModeAgg {

  /** `modeOf(df, groupCols, valueCol)` → one row per group:
    * (groupCols*, valueCol = the most frequent value, ties → largest). */
  def modeOf(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__freq"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__freq").desc, col(valueCol).desc)
    counted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__freq", "__rn")
  }

  /** Same, but keeps the winning frequency too. */
  def modeWithFreq(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   freqName: String = "freq"): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as(freqName))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(freqName).desc, col(valueCol).desc)
    counted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Generic deterministic top-k per group (O3 generalized): rank rows by
    * `ordering` within each group, keep the first k. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   ordering: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
