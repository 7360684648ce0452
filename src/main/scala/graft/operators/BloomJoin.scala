package graft.operators

import graft.plans.BloomFilterExpr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.util.sketch.BloomFilter

/** Semi-join reduction via a Bloom filter — shrink the big (probe) side
  * of a selective join BEFORE its shuffle, by broadcasting a
  * constant-size sketch of the build side's keys instead of the build
  * side itself.
  *
  * When it pays: both sides too big to broadcast AND the join is
  * selective (most probe rows match no build key). A shuffle join
  * moves every probe row; with the sketch, non-matching rows die at
  * the scan, so the exchange carries only (matches + fpp·misses). At
  * a 1% false-positive rate the filter is ~1.2 GB per 10^9 distinct
  * build keys — far under a fact-table shuffle, but NOT free: size it
  * from a cardinality estimate, and skip the whole pattern when the
  * join retains most probe rows (the filter then prunes nothing and
  * the build pass is pure overhead).
  *
  * Exactness: false negatives are impossible, so composing
  * [[prefilter]] with the exact join downstream returns exactly the
  * plain join's rows — false positives survive the scan only to be
  * discarded by the join. The oracle-gated q122 pins that equivalence.
  *
  * Spark shape: the filter is built DISTRIBUTED (`stat.bloomFilter` is
  * a treeAggregate — executors build partial filters, the driver ORs
  * them); the probe is a codegen'd predicate
  * ([[graft.plans.BloomMightContainLong]]) evaluated inside the scan's
  * WholeStageCodegen span, before any exchange. AQE's own runtime
  * bloom injection covers the single-query planner-visible case; this
  * operator is for when the caller knows better — or wants to BUILD
  * ONCE and probe the same filter across many queries/batches (the
  * decontamination pattern: q73's held-out set as a reusable sketch).
  */
object BloomJoin {

  /** Build a Bloom filter over `build`'s integral `buildKey` column.
    * `expectedKeys` sizes the bit array — pass a cardinality estimate
    * (count, footer stats, or HLL); over-estimating wastes memory
    * linearly, under-estimating inflates the false-positive rate. */
  def keyFilter(build: DataFrame, buildKey: String, expectedKeys: Long,
                fpp: Double = 0.01): BloomFilter =
    build.stat.bloomFilter(buildKey, math.max(expectedKeys, 1L), fpp)

  /** `probe` reduced to rows whose `probeKey` might be in `filter` —
    * a superset of the rows that join; follow with the exact join. */
  def prefilter(probe: DataFrame, probeKey: String,
                filter: BloomFilter): DataFrame =
    probe.filter(BloomFilterExpr.mightContain(col(probeKey), filter))
}
