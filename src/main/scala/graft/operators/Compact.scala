package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  *   - rows are preserved (same values; order within the sink is
  *     unspecified, as for any parquet table). A partitioned sink's
  *     DIRECTORY NAMES are preserved verbatim: the rewrite reads the
  *     partition column as STRING (no type inference), so `day=007`
  *     stays `day=007` instead of being re-inferred to int 7 and
  *     rewritten as `day=7`; downstream readers re-infer from the
  *     unchanged names exactly as before;
  *   - already-compacted sinks no-op: the target file count for a
  *     partitioned sink is at least one file per partition value;
  *   - the swap is NOT atomic, but it is never copyless: the sequence
  *     is write tmp → rename sink aside → rename tmp into place →
  *     delete aside. A crash at any point leaves at least one complete
  *     copy on disk (under `<path>__compact_tmp` or `<path>__compact_old`),
  *     and a later run refuses to start while an aside copy exists.
  *     Real deployments get true atomicity from a table-format commit
  *     (Delta/Iceberg) or a catalog pointer flip; this operator is the
  *     rewrite underneath that commit.
  */
object Compact {

  /** Parquet data files under `path`, recursively; Nil when the path
    * does not exist (a guard-skipped or G1-deleted sink). */
  private def dataFiles(spark: SparkSession, path: org.apache.hadoop.fs.Path)
  : Seq[org.apache.hadoop.fs.FileStatus] = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Nil
    val it = fs.listFiles(path, true)
    val buf = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) buf += f
    }
    buf.result()
  }

  /** Compact the sink at `path` to ~`targetBytes` output files
    * (at least one per partition value when `partitionCol` is set).
    * Returns (filesBefore, filesAfter); equal counts with no rewrite
    * when the sink is missing, empty, or already at the target. */
  def compactSink(spark: SparkSession, path: String,
                  partitionCol: Option[String] = None,
                  targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    // normalize through Path so a trailing slash can't nest the scratch
    // dirs INSIDE the sink (where the swap would destroy them)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(hPath.getParent,
      hPath.getName + "__compact_tmp")
    val aside = new org.apache.hadoop.fs.Path(hPath.getParent,
      hPath.getName + "__compact_old")
    require(!fs.exists(aside),
      s"$aside exists — a previous compaction swap did not complete; " +
        "recover (rename it back or delete it after verifying the sink) " +
        "before compacting again")

    val before = dataFiles(spark, hPath)
    if (before.isEmpty) return (0L, 0L)
    val totalBytes = before.map(_.getLen).sum
    val nPartitionDirs = partitionCol match {
      case Some(_) => before.map(_.getPath.getParent.toString).distinct.size
      case None => 1
    }
    val targetFiles = math.max(nPartitionDirs.toLong,
      (totalBytes + targetBytes - 1) / targetBytes)
    if (before.size <= targetFiles) return (before.size, before.size)

    if (fs.exists(tmp)) fs.delete(tmp, true) // stale tmp from a failed WRITE
    partitionCol match {
      case Some(p) =>
        // read the partition column as STRING via an explicit schema:
        // directory names round-trip verbatim (no int re-inference)
        val dataSchema = spark.read
          .parquet(before.head.getPath.toString).schema
        val readSchema = StructType(
          dataSchema.fields :+ StructField(p, StringType))
        spark.read.schema(readSchema).parquet(hPath.toString)
          // one task per partition value → one file per partition (a
          // partition larger than targetBytes stays one file here; a
          // finer split would hash-salt within the partition)
          .repartition(col(p))
          .write.partitionBy(p).parquet(tmp.toString)
      case None =>
        spark.read.parquet(hPath.toString)
          .repartition(targetFiles.toInt).write.parquet(tmp.toString)
    }
    // copyless-window-free swap: both renames are metadata operations,
    // and at least one complete copy exists at every step
    if (!fs.rename(hPath, aside))
      throw new java.io.IOException(s"compaction: could not move $hPath " +
        s"aside to $aside (sink untouched; compacted copy at $tmp)")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(aside, hPath) // roll back
      throw new java.io.IOException(s"compaction: could not move $tmp " +
        s"into place — original sink restored at $hPath")
    }
    fs.delete(aside, true)
    (before.size, dataFiles(spark, hPath).size)
  }
}
