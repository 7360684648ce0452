package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-explosion guardrail: measure a prospective equi-join's fan-out
  * BEFORE paying for it. At 100 TB the classic outage is a join whose
  * key multiplicity was assumed ~1 on at least one side and isn't — the
  * output explodes as Σ_k nₗ(k)·nᵣ(k), the shuffle spills, and the job
  * dies hours in. Both entry points here cost two key-projected
  * aggregations plus a join of |distinct keys| COUNT rows — orders of
  * magnitude cheaper than the join they audit, and cheap enough to run
  * as a scheduled DQ check next to the q101/q118 reports.
  */
object JoinGuard {

  /** Per-key fan-out report of `left ⋈ right` on `keys`: the `topK`
    * hottest keys by output-pair count, with each side's multiplicity.
    * Only keys present on BOTH sides appear (others produce no inner-
    * join output). Shape: two partial-aggregated counts shuffled by the
    * join key, one |keys|-row join, TakeOrdered for the top-k. */
  def fanoutReport(left: DataFrame, right: DataFrame,
                   keys: Seq[String], topK: Int): DataFrame = {
    val l = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_right"))
    l.join(r, keys)
      .withColumn("n_pairs", col("n_left") * col("n_right"))
      .orderBy(col("n_pairs").desc +: keys.map(col(_).asc): _*)
      .limit(topK)
  }

  /** Fail fast when the join's total output would exceed `maxPairs`:
    * one aggregation pass computes Σ nₗ·nᵣ and the single worst key;
    * the thrown message carries both so the operator points at the
    * offender instead of reporting a bare number. */
  def requireFanoutBelow(left: DataFrame, right: DataFrame,
                         keys: Seq[String], maxPairs: Long): Long = {
    val report = fanoutReport(left, right, keys, Int.MaxValue)
    val row = report
      .agg(sum("n_pairs").cast("long").as("total"),
        max(struct(col("n_pairs") +: keys.map(col): _*)).as("worst"))
      .collect()(0)
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    if (total > maxPairs) {
      val worst = row.getStruct(1)
      throw new IllegalStateException(
        s"join fan-out $total pairs exceeds budget $maxPairs; " +
          s"hottest key ${keys.mkString(",")}=" +
          s"${(1 until worst.size).map(worst.get).mkString(",")} " +
          s"alone yields ${worst.get(0)} pairs")
    }
    total
  }
}
