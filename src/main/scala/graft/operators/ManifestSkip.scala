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

  /** One row per data file: (file, bloom, n_rows), with `bloom` a
    * serialized Bloom filter of the file's `keyCol` values — the
    * POINT-LOOKUP complement to [[buildManifest]]'s min/max rows.
    * Min/max pruning needs the layout's cooperation (range-clustered
    * files → narrow ranges); a hash-scattered layout makes every file
    * span the full key range and min/max prunes NOTHING. The Bloom
    * index prunes point lookups on ANY layout: a key is in few files
    * regardless of how rows were scattered, and the filter knows which.
    *
    * Built in ONE pass over the key column via [[graft.plans
    * .BloomFilterAgg]] grouped by `_metadata.file_path` — partial
    * filters build map-side, the exchange carries filters, not rows.
    * `expectedKeysPerFile` sizes each filter (use the write path's
    * rows-per-file bound); over-cap files degrade to a higher
    * false-positive rate, never to false negatives. */
  def buildBloomIndex(spark: SparkSession, path: String, keyCol: String,
                      expectedKeysPerFile: Long,
                      fpp: Double = 0.01): DataFrame =
    spark.read.parquet(path)
      .select(col(keyCol), col("_metadata.file_path").as("file"))
      .groupBy("file")
      .agg(graft.plans.BloomFilterAgg(col(keyCol), expectedKeysPerFile, fpp)
          .as("bloom"),
        count(lit(1)).as("n_rows"))

  /** The sink rows whose `keyCol` is IN `keys`, reading ONLY files
    * whose Bloom filter admits at least one probe key. False positives
    * cost reads that the exact IN-filter then discards; false
    * negatives are impossible, so the result is exactly the full-scan
    * filter's (q162's oracle). Returns (dataframe, filesRead,
    * filesTotal).
    *
    * The index transits the driver (same file-count-sized collect, and
    * same justification, as [[prunedRead]]): probing |keys|·|files|
    * membership tests locally costs microseconds against the scan
    * it spares, and a real deployment feeds these filters to the
    * catalog/scan planner the same way. */
  def bloomPrunedRead(spark: SparkSession, path: String, index: DataFrame,
                      keyCol: String, keys: Seq[Long])
      : (DataFrame, Long, Long) = {
    import org.apache.spark.util.sketch.BloomFilter
    val idx = index.select(col("file"), col("bloom")).collect()
    val files = idx.filter { r =>
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
      keys.exists(bf.mightContainLong)
    }.map(_.getString(0))
    val df =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
    (df.filter(col(keyCol).isin(keys: _*)),
      files.length.toLong, idx.length.toLong)
  }
}
