package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COMMITTED ANN index — IVF centroids and per-file cell-assignment
  * postings as table-format citizens, so approximate top-k serves
  * from committed artifacts instead of retraining per query lineage
  * (the FAISS-index-next-to-the-table pattern, manifest-tracked the
  * way Delta tracks its Bloom indexes):
  *
  *   - `#meta ann.<col>.centroids` names the TRAINED centroid sidecar
  *     (`_graft_ann/...-centroids`, the [[Similarity.kmeansCentroids]]
  *     output schema `(cid, ce, cn)`) — trained ONCE over the table
  *     and reused verbatim by every later catch-up and probe;
  *   - `#ann\t<file>\t<physCol>\t<sidecarRel>` records, one per data
  *     file, name the postings sidecar holding that file's rows as
  *     `(file, pos, did, de, dn, cid)` — quantized vectors
  *     pre-assigned to their nearest committed centroid. Physical
  *     column keying and carry-per-surviving-file follow `#bloom`: a
  *     rename never invalidates, a rewrite retires exactly the
  *     rewritten files' postings (their rows in a shared sidecar are
  *     excluded by the file-liveness semi-join, and the sidecar
  *     itself becomes [[CommitLog.vacuum]] debris once no record
  *     names it).
  *
  * INCREMENTAL by construction: [[build]] targets only files lacking
  * a record (the `ANALYZE onlyMissing` shape), so maintaining the
  * index after appends costs ∝ new files and never retrains.
  * Postings are over RAW rows (DVs not applied — the `#stats`/`#bloom`
  * superset discipline, sound as deletes grow); [[topK]] anti-joins
  * the manifest's deletion vectors so deleted rows never surface as
  * candidates. Probing reuses [[Similarity.ivfProbeCells]] — the
  * exact probe half of [[Similarity.ivfTopKWith]] — so indexed
  * results are equal by construction to the inline recompute with the
  * same centroids.
  *
  * 100 TB shape: centroids are tiny and broadcast; postings I/O is
  * ∝ corpus (the index IS the corpus projection), and the probe
  * shuffles only cell-matched candidates. The reference has no ANN
  * surface; this generalizes its batch-analytics role to the
  * embedding workloads a training-data pipeline serves. */
object AnnIndex {

  private def centroidKey(column: String) = s"ann.$column.centroids"
  private def kKey(column: String) = s"ann.$column.k"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def physOf(m: Map[String, String], logical: String): String =
    m.collectFirst { case (p, l) if l == logical => p }
      .getOrElse(logical)

  private def centroidsOf(spark: SparkSession, hPath: Path,
                          rel: String): DataFrame =
    spark.read.parquet(new Path(hPath, rel).toString)
      .select(col("cid"), col("ce"), col("cn"))

  /** Build (or catch up) the committed index for `column`: train
    * centroids once if the table has none, then index exactly the
    * record-less files, land postings as ONE sidecar, and publish
    * everything in ONE commit. Returns files indexed. */
  def build(spark: SparkSession, path: String,
            column: String = "embedding", idColumn: String = "vec_id",
            numCentroids: Int = 16, iters: Int = 2): Long = {
    val hPath = new Path(path)
    val fs = fsOf(spark, hPath)
    val (gen, live) = CommitLog.ensureLoggedAt(fs, hPath)
    require(live.nonEmpty, s"ann build on an empty sink $path")
    val meta = CommitLog.metaRecords(fs, hPath)
    val cms = CommitLog.colmapRecords(fs, hPath)
    val cts = CommitLog.coltypeRecords(fs, hPath)
    // 1. centroids: train ONCE over the current table, reuse forever
    // (catch-ups assign against the committed centroids — an index
    // whose cells drift per build would not be an index)
    val (centroidRel, trainedNow) = meta.get(centroidKey(column)) match {
      case Some(rel) => (rel, false)
      case None =>
        val corpus = CommitLog.read(spark, path)
          .select(col(idColumn).cast("long").as("vec_id"),
            col(column).as("embedding"))
        val cents = Similarity.kmeansCentroids(corpus, numCentroids,
          iters)
        val rel = CommitLog.AnnDirName + "/" +
          java.util.UUID.randomUUID().toString + "-centroids"
        cents.coalesce(1).write.parquet(new Path(hPath, rel).toString)
        (rel, true)
    }
    // 2. catch-up: exactly the files with no record for the column
    val existing = CommitLog.annRecords(fs, hPath)
    val targets = live.filter { f =>
      val phys = physOf(cms.getOrElse(f, Map.empty), column)
      !existing.getOrElse(f, Map.empty).contains(phys)
    }
    if (targets.isEmpty && !trainedNow) return 0L
    val newRecs: Map[String, Map[String, String]] =
      if (targets.isEmpty) Map.empty
      else {
        val rel = CommitLog.AnnDirName + "/" +
          java.util.UUID.randomUUID().toString
        val prefix = fs.makeQualified(hPath).toUri.getPath + "/"
        // RAW rows with identity (no DV application — see scaladoc);
        // vectors quantize exactly as the inline lineage does
        val scan = CommitLog.mappedScan(spark, hPath, targets, cms,
          identity = true, coltypes = cts, meta = meta)
        val rows = scan.select(
            struct(
              CommitLog.relPathCol(prefix, col("__file_path"))
                .as("file"),
              col("__row_index").as("pos"),
              col(idColumn).cast("long").as("did")).as("rid"),
            Similarity.quantize(col(column)).as("de"))
          .withColumn("dn", Similarity.dotQ(col("de"), col("de")))
        val assigned = Similarity.assignToCells(rows, "rid", "de",
            "dn", keep = 1, centroidsOf(spark, hPath, centroidRel))
          .select(col("rid.file").as("file"), col("rid.pos").as("pos"),
            col("rid.did").as("did"), col("de"), col("dn"), col("cid"))
        assigned.write.parquet(new Path(hPath, rel).toString)
        targets.map { f =>
          f -> Map(physOf(cms.getOrElse(f, Map.empty), column) -> rel)
        }.toMap
      }
    // 3. one commit publishes centroid pointer + postings records
    CommitLog.commitNext(fs, hPath, gen, live, anns = newRecs,
      meta = if (trainedNow)
        Map(centroidKey(column) -> centroidRel,
          kKey(column) -> numCentroids.toString)
      else Map.empty)
    targets.size.toLong
  }

  /** Index-accelerated approximate top-k over the CURRENT snapshot:
    * probe the committed centroids' `nProbe` nearest cells per query
    * against the committed postings of the LIVE files, with the
    * manifest's deletion vectors anti-joined out. Refuses loudly when
    * the index is absent or any live file is unindexed (run [[build]]
    * to catch up — coverage is all-or-nothing so a stale index can
    * never silently shrink recall). Result ≡
    * [[Similarity.ivfTopKWith]] over the table with the same
    * committed centroids. */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
           nProbe: Int, k: Int, column: String = "embedding")
  : DataFrame = {
    val hPath = new Path(path)
    val fs = fsOf(spark, hPath)
    val gens = CommitLog.generations(fs, hPath)
    require(gens.nonEmpty, s"ann topK: $path is not a logged sink")
    val m = CommitLog.manifestAt(fs, hPath, gens.last)
    val centroidRel = m.meta.getOrElse(centroidKey(column),
      throw new IllegalArgumentException(
        s"ann topK: no committed ANN index for '$column' at $path — " +
          "AnnIndex.build first"))
    val cms = m.colmaps
    val missing = m.files.filter { f =>
      !m.anns.getOrElse(f, Map.empty)
        .contains(physOf(cms.getOrElse(f, Map.empty), column))
    }
    require(missing.isEmpty,
      s"ann topK: ${missing.size} live file(s) have no '#ann' record " +
        s"for '$column' at $path — AnnIndex.build to catch up " +
        s"(first: ${missing.take(3).mkString(", ")})")
    val rels = m.files.flatMap(f => m.anns(f).get(
      physOf(cms.getOrElse(f, Map.empty), column))).distinct.sorted
    val posts = spark.read.parquet(
      rels.map(r => new Path(hPath, r).toString): _*)
    import spark.implicits._
    // liveness: a shared sidecar may hold rows of files since
    // rewritten out of the manifest — keep exactly the live set
    val liveDf = m.files.toDF("file")
    val liveRows = posts.join(broadcast(liveDf), Seq("file"),
      "left_semi")
    // deleted rows must never be candidates
    val dvPaths = m.dvs.values.toSeq.distinct.sorted
    val visible =
      if (dvPaths.isEmpty) liveRows
      else liveRows.join(
        spark.read.parquet(
            dvPaths.map(r => new Path(hPath, r).toString): _*)
          .select(col("file").as("__dvf"), col("pos").as("__dvp")),
        col("file") === col("__dvf") && col("pos") === col("__dvp"),
        "left_anti")
    Similarity.ivfProbeCells(queries,
      visible.select(col("did"), col("de"), col("dn"), col("cid")),
      centroidsOf(spark, hPath, centroidRel), nProbe, k)
  }
}
