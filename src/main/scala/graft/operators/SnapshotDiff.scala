package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-feed GENERATION by diffing two keyed snapshots — the inverse of
  * [[Upsert.applyCdc]] (which consumes a feed): given yesterday's and
  * today's images of a table, emit one row per changed key with op
  * I (new key), U (payload changed), or D (key gone). Keys present in
  * both with byte-identical payload emit nothing.
  *
  * This is how a warehouse backfills CDC for a source that only ships
  * full snapshots: feed = changeFeed(snap_t, snap_t1), then
  * applyCdc/MERGE downstream. Round-trip law (spec'd):
  * applying the feed to the old snapshot reproduces the new one.
  *
  * Spark shape: ONE full outer join, hash-partitioned on the key —
  * each side is shuffled once and nothing is broadcast (both sides are
  * table-sized by definition). Payload comparison is a null-safe
  * conjunction (`<=>`) evaluated inside the join's codegen stage, so
  * unchanged keys — the overwhelming majority of a daily diff — are
  * dropped before anything else touches them. At 100 TB the win is
  * layout: snapshots bucketed or pre-partitioned on the key diff with
  * ZERO exchange, and date-partitioned snapshots diff partition-by-
  * partition (run changeFeed per partition pair). The operator itself
  * stays one join either way.
  *
  * Output schema: key columns (non-null), `op`, then `old_<c>` /
  * `new_<c>` for every payload column — both images kept so the feed
  * is auditable (a U row shows what changed) and reversible (swap
  * old/new to invert the feed). Null payload VALUES are legal and
  * compare null-safely; null KEYS are not (they never equi-join, so a
  * null-key row would always diff as I+D — same contract as
  * [[Upsert.upsertParquet]]). */
object SnapshotDiff {

  def changeFeed(oldSnap: DataFrame, newSnap: DataFrame,
                 keys: Seq[String]): DataFrame = {
    val payload = oldSnap.columns.filterNot(keys.contains).toSeq
    require(payload.toSet ==
        newSnap.columns.filterNot(keys.contains).toSet,
      s"snapshots disagree on payload columns: $payload vs " +
        newSnap.columns.filterNot(keys.contains).toSeq)
    val o = oldSnap.select(keys.map(col) ++
      (payload.map(c => col(c).as(s"old_$c")) :+
        lit(true).as("__in_old")): _*)
    val n = newSnap.select(keys.map(col) ++
      (payload.map(c => col(c).as(s"new_$c")) :+
        lit(true).as("__in_new")): _*)
    val unchanged = payload
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("__in_old").isNull, "I")
          .when(col("__in_new").isNull, "D")
          .when(!unchanged, "U"))
      .filter(col("op").isNotNull)
      .select(keys.map(col) ++ (col("op") +:
        payload.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }
}
