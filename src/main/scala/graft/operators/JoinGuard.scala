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

  /** Un-sorted per-key pair counts — the shared core of the report and
    * the guard. `n_pairs_dec` is decimal(38,0): the guard exists
    * precisely for explosive joins, where a LongType nₗ·nᵣ (a single
    * key with ~3·10⁹ rows per side) or the Σ over keys would wrap
    * silently in non-ANSI mode and make the guard PASS the join it
    * must reject. Decimal multiply/sum cannot wrap below 10³⁸. */
  private def fanoutCounts(left: DataFrame, right: DataFrame,
                           keys: Seq[String]): DataFrame = {
    val dec = "decimal(38,0)"
    val l = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_right"))
    l.join(r, keys)
      .withColumn("n_pairs_dec",
        col("n_left").cast(dec) * col("n_right").cast(dec))
  }

  /** Per-key fan-out report of `left ⋈ right` on `keys`: the `topK`
    * hottest keys by output-pair count, with each side's multiplicity.
    * Only keys present on BOTH sides appear (others produce no inner-
    * join output). Shape: two partial-aggregated counts shuffled by the
    * join key, one |keys|-row join, TakeOrdered for the top-k. The
    * RANKING is decimal-exact; the displayed `n_pairs` column is BIGINT
    * for oracle/schema stability (a key whose own pair count exceeds
    * 2⁶³ wraps only in display, never in the ordering). */
  def fanoutReport(left: DataFrame, right: DataFrame,
                   keys: Seq[String], topK: Int): DataFrame =
    fanoutCounts(left, right, keys)
      .orderBy(col("n_pairs_dec").desc +: keys.map(col(_).asc): _*)
      .limit(topK)
      .withColumn("n_pairs", col("n_pairs_dec").cast("long"))
      .drop("n_pairs_dec")

  /** Fail fast when the join's total output would exceed `maxPairs`:
    * one aggregation pass computes Σ nₗ·nᵣ and the single worst key —
    * no sort (the report's TakeOrdered is skipped; the agg consumes the
    * un-sorted counts directly). All comparisons are decimal(38,0), so
    * neither a hot key nor the total can wrap past the budget check.
    * Returns the exact total (≤ maxPairs ≤ Long.MaxValue on success). */
  def requireFanoutBelow(left: DataFrame, right: DataFrame,
                         keys: Seq[String], maxPairs: Long): Long = {
    val row = fanoutCounts(left, right, keys)
      .agg(sum("n_pairs_dec").as("total"),
        max(struct(col("n_pairs_dec") +: keys.map(col): _*)).as("worst"))
      .collect()(0)
    val total: java.math.BigDecimal =
      if (row.isNullAt(0)) java.math.BigDecimal.ZERO else row.getDecimal(0)
    if (total.compareTo(java.math.BigDecimal.valueOf(maxPairs)) > 0) {
      val worst = row.getStruct(1)
      throw new IllegalStateException(
        s"join fan-out $total pairs exceeds budget $maxPairs; " +
          s"hottest key ${keys.mkString(",")}=" +
          s"${(1 until worst.size).map(worst.get).mkString(",")} " +
          s"alone yields ${worst.get(0)} pairs")
    }
    total.longValueExact()
  }
}
