package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single latest right row
  * with `rightTs <= leftTs` on the same key (the trades↔quotes / event↔
  * state alignment). Not in the reference — its weather↔delay alignment
  * is an equality join on an hour-truncated key
  * (`/root/reference/src/queries.py:145`); this is the general form that
  * equality trick approximates.
  *
  * Spark has no built-in as-of join, and the naive range-join
  * (`l.key = r.key AND r.ts <= l.ts` then window-max) explodes to
  * O(|L|·|R| / keys) intermediate rows. This implementation is the
  * union-and-window formulation instead: tag each side, union, one
  * window pass per key ordered by time carrying the last-seen right row
  * forward (as one struct, so null fields inside a matched row survive),
  * keep left rows. Cost: ONE shuffle of |L|+|R| rows on the key, then a
  * linear per-key scan — the same shape at sf0.001 and at 100 TB (each
  * key's run streams through one task; skewed keys can be pre-salted by
  * coarse time bucket since the carry only needs ordering within a
  * bucket plus the previous bucket's tail).
  *
  * Tie semantics: a right row at exactly `leftTs` IS visible (<=), so
  * right rows sort before left rows at equal timestamps. Callers must
  * make right rows unique per (key, ts) for fully deterministic output
  * (e.g. keep the max id per timestamp) — same contract DuckDB's native
  * ASOF JOIN has with duplicate right timestamps.
  *
  * Cite: reference alignment semantics at
  * `/root/reference/src/queries.py:144-145`,
  * `/root/reference/src/delays.py:33-36`.
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry onto matching left rows
    *                   (must not collide with left column names); rows
    *                   with no prior right match get nulls (left-join
    *                   semantics). */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   valueCols: Seq[String]): DataFrame = {
    // the internal working columns are reserved: a left/right column with
    // one of these names would be silently overwritten by withColumn and
    // carried into the output as garbage — fail loudly instead (same
    // defensive contract as the documented valueCols-collision rule)
    val reserved = Set("__ts", "__side", "__r", "__m")
    val collisions = (left.columns ++ right.columns).filter(reserved).distinct
    require(collisions.isEmpty,
      s"asofBackward: input columns ${collisions.mkString(", ")} collide " +
        "with reserved internal names __ts/__side/__r/__m — rename them")
    val leftCols = left.columns.toSeq
    val r = right
      .select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__r"))
    val rType = r.schema("__r").dataType
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rType))
    // right rows (side 0) sort before left rows at equal ts → inclusive.
    val w = Window.partitionBy(key).orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(Seq(col(key), col("__ts"), col("__side"), col("__r")) ++
        leftCols.filterNot(_ == key).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** FORWARD as-of join: for each left row, the single EARLIEST right
    * row with `rightTs >= leftTs` on the same key — the
    * "next event after" alignment (order → next shipment, click → next
    * purchase, alert → next resolution). Exactly [[asofBackward]]'s
    * union-and-window formulation with the time axis reversed: one
    * shuffle of &#124;L&#124;+&#124;R&#124; rows, one descending per-key
    * scan carrying the last-seen (= time-minimal ≥) right row. A right
    * row at exactly `leftTs` IS visible (>=). Same determinism
    * contract: right rows unique per (key, ts). */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  valueCols: Seq[String]): DataFrame = {
    val reserved = Set("__ts", "__side", "__r", "__m")
    val collisions = (left.columns ++ right.columns).filter(reserved).distinct
    require(collisions.isEmpty,
      s"asofForward: input columns ${collisions.mkString(", ")} collide " +
        "with reserved internal names __ts/__side/__r/__m — rename them")
    val leftCols = left.columns.toSeq
    val r = right
      .select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__r"))
    val rType = r.schema("__r").dataType
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rType))
    // DESCENDING time: right rows (side 0) still sort before left rows
    // at equal ts, so an exactly-simultaneous right row is matched (>=)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(Seq(col(key), col("__ts"), col("__side"), col("__r")) ++
        leftCols.filterNot(_ == key).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
