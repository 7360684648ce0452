package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-granular MERGE (read-merge-write) against a parquet sink — the
  * one MERGE variant the sink family lacked: WHEN MATCHED UPDATE (the
  * update row's payload replaces the sink row's), WHEN NOT MATCHED
  * INSERT. Extends the reference's insert-only MERGE
  * (`dags/idh_etl.py:247-256`, WHEN NOT MATCHED only) with the
  * update branch, at FILE granularity: only sink files that contain a
  * matched key are rewritten; every other file is never read past its
  * key column, never written, and stays byte-identical on disk.
  *
  * Scale shape: the cost is proportional to the files the update
  * batch TOUCHES, not the sink —
  *   1. one key-projected scan of the sink tags each key with its file
  *      (`_metadata.file_path`, a generated column — no extra I/O) and
  *      a semi-join against the batch keys reduces to the distinct
  *      touched-file list (bounded by |sink files|, collected);
  *   2. only those files are re-read IN FULL; their unmatched rows
  *      union the matched update payloads and rewrite;
  *   3. not-matched batch rows append as new files.
  * The batch-key side of the semi-join is left UNHINTED: a small batch
  * broadcasts by AQE's own estimate, a reconciliation-sized batch
  * shuffles — the same guard discipline as
  * [[Graphs.triangleStats]]'s degree table.
  *
  * The swap is add-then-delete: rewritten + inserted files land in the
  * sink directory under fresh unique names FIRST, then the replaced
  * originals are deleted. A crash between the two steps leaves
  * duplicated matched rows (re-runnable, detectable by key count) —
  * never lost rows, which delete-then-add would risk. True atomicity
  * belongs to a table-format commit (Delta/Iceberg); this operator is
  * the rewrite underneath that commit, like [[Compact.compactSink]].
  *
  * `updates` must carry the sink's exact schema (keys + payload).
  * Duplicate keys WITHIN the batch are the producer's bug (which row
  * should win is undefined); pass the batch through
  * [[Upsert.dedupKeepFirstAgg]] first, as the publish path does. */
object Merge {

  /** Merge outcome: files in the sink before, files rewritten (=
    * files that contained ≥1 matched key), rows whose payload was
    * replaced, rows inserted. */
  final case class MergeStats(filesBefore: Long, filesTouched: Long,
                              rowsUpdated: Long, rowsInserted: Long)

  def mergeParquet(spark: SparkSession, updates: DataFrame,
                   keyCols: Seq[String], path: String): MergeStats = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(hPath), s"merge target $path does not exist — " +
      "first write goes through the publish path, not MERGE")
    val sinkSchema = spark.read.parquet(path).schema
    require(sinkSchema.fieldNames.sorted.sameElements(
        updates.columns.sorted),
      s"updates schema ${updates.columns.sorted.mkString(",")} must match " +
        s"sink schema ${sinkSchema.fieldNames.sorted.mkString(",")}")
    val keyed = updates.select(updates.columns.map(col): _*)

    // small frame, three consumers (touched files, matched rewrite,
    // insert anti-join) — cache and release before returning
    val batch = keyed.cache()

    // 1. touched files: key-projected sink scan + semi-join; the file
    // path is parquet metadata, so the scan reads ONLY the key columns
    val sinkKeys = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("__f") +:
        keyCols.map(col): _*)
    val touched = sinkKeys
      .join(batch.select(keyCols.map(col): _*), keyCols, "left_semi")
      .select("__f").distinct()
      .collect().map(_.getString(0)).sorted
    val filesBefore = {
      val it = fs.listFiles(hPath, true)
      var n = 0L
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }

    val matched = batch.join(
      spark.read.parquet(path).select(keyCols.map(col): _*),
      keyCols, "left_semi")
    val inserts = batch.join(
      spark.read.parquet(path).select(keyCols.map(col): _*),
      keyCols, "left_anti")
    val nUpdated = matched.count()
    val nInserted = inserts.count()

    // 2.+3. rewrite = touched files' unmatched rows + matched payloads;
    // inserts ride the same write. Written to a scratch dir first so a
    // failed job can't leave partial part-files inside the sink.
    val tmp = new org.apache.hadoop.fs.Path(hPath.getParent,
      hPath.getName + "__merge_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val rewritten =
      if (touched.isEmpty) inserts
      else spark.read.schema(sinkSchema).parquet(touched: _*)
        .join(batch.select(keyCols.map(col): _*), keyCols, "left_anti")
        .unionByName(matched)
        .unionByName(inserts)
    if (nUpdated + nInserted > 0) {
      rewritten.write.parquet(tmp.toString)
      // add-then-delete swap: move the new part-files in under their
      // (unique) names, then drop the replaced originals
      val it = fs.listFiles(tmp, false)
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) {
          if (!fs.rename(f, new org.apache.hadoop.fs.Path(hPath, f.getName)))
            throw new java.io.IOException(
              s"merge: could not move $f into $hPath")
        }
      }
      touched.foreach { f =>
        fs.delete(new org.apache.hadoop.fs.Path(f), false)
      }
      fs.delete(tmp, true)
    }
    batch.unpersist(blocking = false)
    MergeStats(filesBefore, touched.length.toLong, nUpdated, nInserted)
  }

  /** Erasure outcome: files in the sink before, files rewritten, rows
    * deleted. */
  final case class EraseStats(filesBefore: Long, filesTouched: Long,
                              rowsDeleted: Long)

  /** WHEN MATCHED DELETE at file granularity — the erasure MERGE a
    * training-data corpus needs for right-to-be-forgotten requests:
    * every sink row whose key appears in `keys` is removed, and ONLY
    * the files containing such a key are rewritten; the rest of the
    * corpus stays byte-identical (never read past its key columns,
    * never written). Same add-then-delete swap as [[mergeParquet]]: a
    * crash mid-swap leaves the matched rows still present (erasure
    * simply re-runs), never a hole in the corpus.
    *
    * Scale shape mirrors [[mergeParquet]]: one key-projected sink scan
    * semi-joined against the erasure keys (unhinted — AQE broadcasts a
    * request-sized key list, shuffles a backfill-sized one) yields the
    * touched-file list; only those files are re-read in full. Cost is
    * proportional to the files the keys TOUCH — which is why erasure-
    * heavy corpora cluster their layout by the erasure key (q84/q123's
    * layout discipline) so a deletion request touches few files. */
  def eraseParquet(spark: SparkSession, keys: DataFrame,
                   keyCols: Seq[String], path: String): EraseStats = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(hPath), s"erase target $path does not exist")
    val sinkSchema = spark.read.parquet(path).schema
    require(keyCols.forall(keys.columns.contains),
      s"keys frame ${keys.columns.mkString(",")} must carry $keyCols")
    val batch = keys.select(keyCols.map(col): _*).distinct().cache()

    val sinkKeys = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("__f") +:
        keyCols.map(col): _*)
    val touched = sinkKeys
      .join(batch, keyCols, "left_semi")
      .select("__f").distinct()
      .collect().map(_.getString(0)).sorted
    val filesBefore = {
      val it = fs.listFiles(hPath, true)
      var n = 0L
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    var deleted = 0L
    if (touched.nonEmpty) {
      val touchedRows = spark.read.schema(sinkSchema).parquet(touched: _*)
      val kept = touchedRows.join(batch, keyCols, "left_anti")
      deleted = touchedRows.count() - kept.count()
      val tmp = new org.apache.hadoop.fs.Path(hPath.getParent,
        hPath.getName + "__erase_tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      kept.write.parquet(tmp.toString)
      val it = fs.listFiles(tmp, false)
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) {
          if (!fs.rename(f, new org.apache.hadoop.fs.Path(hPath, f.getName)))
            throw new java.io.IOException(
              s"erase: could not move $f into $hPath")
        }
      }
      touched.foreach { f =>
        fs.delete(new org.apache.hadoop.fs.Path(f), false)
      }
      fs.delete(tmp, true)
    }
    batch.unpersist(blocking = false)
    EraseStats(filesBefore, touched.length.toLong, deleted)
  }
}
