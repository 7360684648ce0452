package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for append-only parquet sinks — the maintenance
  * operator the partitioned publish path ([[Upsert.upsertParquet]])
  * eventually needs: every batch appends at least one file per touched
  * partition, so an hourly publish grows a day's partition to ~24 small
  * files, and parquet scan cost at 100 TB is driven by file count
  * (footer reads, task scheduling) as much as bytes. Compaction
  * rewrites the sink to ~`targetBytes` files, preserving rows exactly —
  * the same role OPTIMIZE plays for table formats.
  *
  * Semantics and limits (deliberately explicit):
  *   - rows are preserved bit-for-bit (same schema, same values; order
  *     within the sink is unspecified, as for any parquet table);
  *   - hive partitioning is preserved: a partitioned sink is rewritten
  *     `partitionBy` the same column, one file per partition value per
  *     `targetBytes` slice;
  *   - the swap (write tmp → delete old → move tmp) is NOT atomic —
  *     without a transaction log there is a window where a concurrent
  *     reader sees a missing directory. Real deployments get atomicity
  *     from a table format (Delta/Iceberg commit) or a catalog pointer
  *     flip; this operator is the rewrite underneath that commit.
  */
object Compact {

  /** Parquet data files under `path`, recursively. */
  private def dataFiles(spark: SparkSession, path: String)
  : Seq[org.apache.hadoop.fs.FileStatus] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hPath, true)
    val buf = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) buf += f
    }
    buf.result()
  }

  /** Compact the sink at `path` to ~`targetBytes` output files
    * (per partition value when `partitionCol` is set). Returns
    * (filesBefore, filesAfter). No-op (returns equal counts, no
    * rewrite) when the sink is already at or below the target count. */
  def compactSink(spark: SparkSession, path: String,
                  partitionCol: Option[String] = None,
                  targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val before = dataFiles(spark, path)
    val totalBytes = before.map(_.getLen).sum
    val targetFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    if (before.size <= targetFiles) return (before.size, before.size)

    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale failed attempt
    val df = spark.read.parquet(path)
    partitionCol match {
      case Some(p) =>
        // one task per partition value → one file per partition (a
        // partition larger than targetBytes stays one file here; a
        // finer split would hash-salt within the partition)
        df.repartition(col(p))
          .write.partitionBy(p).parquet(tmp.toString)
      case None =>
        df.repartition(targetFiles.toInt).write.parquet(tmp.toString)
    }
    // non-atomic swap — see scaladoc
    fs.delete(hPath, true)
    if (!fs.rename(tmp, hPath))
      throw new java.io.IOException(
        s"compaction swap failed: could not rename $tmp to $hPath " +
          "(compacted data is intact under the tmp path)")
    (before.size, dataFiles(spark, path).size)
  }
}
