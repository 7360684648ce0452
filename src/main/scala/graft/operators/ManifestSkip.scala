package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping from a persisted min/max manifest — the
  * stats-pruning layer a table format (Delta/Iceberg) keeps in its
  * metadata, as a freestanding operator over plain parquet.
  *
  * Spark's parquet reader already skips ROW GROUPS from footer stats,
  * but only after listing the sink and opening every footer — at 10⁶
  * files that is 10⁶ driver-side opens per query. A manifest inverts
  * the cost: ONE stats pass at publish time (piggybacking on
  * `_metadata.file_path`, a generated column — no extra I/O beyond
  * the key column itself), then every subsequent query prunes to the
  * intersecting files before the scan is even planned. Pruning is
  * sound for any predicate implied by `key BETWEEN lo AND hi`: a file
  * whose [min,max] misses the range can hold no qualifying row; the
  * exact filter still applies to the survivors, so false inclusions
  * (wide files) only cost I/O, never correctness — q123's oracle is
  * the plain full-scan filter.
  *
  * Effectiveness is the LAYOUT's job: range-partitioned or z-ordered
  * writes ([[graft.queries]]' q84) give near-disjoint per-file ranges
  * → selectivity ≈ files read / files total; a hash-scattered layout
  * makes every file intersect and the manifest prunes nothing
  * (detected, not broken: the spec pins both cases).
  *
  * The pruned file list transits the driver (`collect`) — manifest
  * rows are file-count-sized, and the real deployment keeps the
  * manifest as its own table and feeds the catalog; the collect here
  * is that planning step's local stand-in, same as
  * [[Upsert]]'s partition-value pruning. */
object ManifestSkip {

  /** One row per data file of the parquet sink at `path`:
    * (file, min_k, max_k, n_rows) for `keyCol`. Nulls in `keyCol`
    * are counted but excluded from min/max (parquet footer
    * semantics); an all-null file never matches a range prune. */
  def buildManifest(spark: SparkSession, path: String,
                    keyCol: String): DataFrame =
    spark.read.parquet(path)
      .select(col(keyCol), col("_metadata.file_path").as("file"))
      .groupBy("file")
      .agg(min(keyCol).as("min_k"), max(keyCol).as("max_k"),
        count(lit(1)).as("n_rows"))

  /** The sink rows with `keyCol` in [lo, hi], reading ONLY files the
    * manifest proves can intersect. Returns (dataframe, filesRead,
    * filesTotal) so callers can assert the prune did something. */
  def prunedRead(spark: SparkSession, path: String, manifest: DataFrame,
                 keyCol: String, lo: Column, hi: Column)
      : (DataFrame, Long, Long) = {
    val stats = manifest
      .select(col("file"),
        (col("max_k") >= lo && col("min_k") <= hi).as("hit"))
      .collect()
    val files = stats.filter(_.getBoolean(1)).map(_.getString(0))
    val df =
      if (files.isEmpty)
        // schema-correct empty frame; lists the sink but reads no rows
        spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
    (df.filter(col(keyCol).between(lo, hi)),
      files.length.toLong, stats.length.toLong)
  }
}
