package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual salting pattern for
  * when AQE's skew-join split isn't available (e.g. bucketed tables,
  * deterministic partitioning requirements) or the skew is known ahead
  * of time.
  *
  * A hot key that would land one giant partition on a single executor is
  * spread over `buckets` sub-partitions: the big (skewed) side gets a
  * deterministic salt derived from hashing its entire row; the small side
  * is replicated once per salt value. Join semantics are identical to the
  * plain equi-join; shuffle partition sizes shrink by ~`buckets` for the
  * hot keys. Cost: small side × buckets replication — choose buckets ≈
  * (hot-key cardinality / target partition rows).
  */
object SkewJoin {

  /** Inner equi-join on `keys` with the left (skewed) side salted into
    * `buckets` sub-partitions. Result equals `left.join(right, keys)`. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val salts = right.sparkSession.range(buckets).toDF("__salt")
    val replicatedRight = right.crossJoin(salts)
    saltedLeft.join(replicatedRight, keys :+ "__salt")
      .drop("__salt")
  }

  /** Key-frequency probe: find keys whose row count exceeds `threshold` —
    * the input to a targeted salting decision (salt only hot keys, join
    * the rest normally). */
  def hotKeys(df: DataFrame, keys: Seq[String], threshold: Long): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > threshold)
}
