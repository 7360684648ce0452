package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-manifest commit protocol for plain-parquet sinks — the
  * table-format `_commit` pointer that makes the rewrite family
  * ([[Merge.mergeParquet]], [[Merge.eraseParquet]],
  * [[Compact.compactSink]], [[Upsert.replacePartitionsParquet]])
  * crash-atomic. The reference never needed this because its MERGE is
  * executed by a transactional warehouse (`dags/idh_etl.py:247-256`);
  * a file-granular rewrite over raw parquet does: between "new files
  * added" and "replaced originals deleted" a directory listing shows
  * BOTH copies of every rewritten row.
  *
  * Protocol (single writer, as in the reference's one-DAG publish):
  *   - `<sink>/_graft_log/<gen>.manifest` lists the LIVE data files of
  *     generation `gen`, one sink-relative path per line. Spark and
  *     DuckDB both ignore underscore-prefixed directories, so the log
  *     is invisible to plain directory readers.
  *   - A writer first [[ensureLogged]]s the sink: bootstrap gen 0 from
  *     the directory listing (no log yet — by induction the listing is
  *     clean, since every logged writer deletes only AFTER committing),
  *     else just read the latest manifest — ONE manifest read per
  *     write, independent of how many generations are retained.
  *   - The swap becomes add → COMMIT → delete: new files land under
  *     fresh unique names, then ONE atomic rename of the next
  *     generation's manifest (written to a dot-prefixed temp name
  *     first) is the commit point, then the replaced originals are
  *     deleted as garbage collection. A crash before the commit leaves
  *     uncommitted orphans the old generation never references; a
  *     crash after it leaves garbage the new generation never
  *     references. A manifest-resolving reader sees exactly-once rows
  *     at EVERY intermediate point (CommitProtocolSpec kills the swap
  *     at both points and proves both properties); the orphans are
  *     reclaimed by EXPLICIT maintenance ([[vacuum]] /
  *     [[expireGenerations]]), never by another writer's entry — a
  *     writer that deleted unreferenced files on its way in could
  *     delete a concurrent writer's staged-but-not-yet-committed
  *     files, and if the deleter itself never commits, the victim's
  *     CAS still succeeds and publishes a manifest pointing at deleted
  *     files (committed data loss). Writers therefore NEVER delete
  *     anything they did not themselves replace.
  *   - [[read]] resolves the latest manifest (explicit file list +
  *     `basePath`, so hive-partition columns still materialize) and
  *     falls back to a plain directory read for never-logged sinks —
  *     existing append-only sinks keep working unchanged.
  *
  * Durability notes for real deployments: the commit publish
  * ([[publishExclusive]]) dispatches on the filesystem SCHEME — local
  * POSIX goes through an atomically-exclusive hard link, HDFS-family
  * schemes through rename (which their contract specifies to fail on
  * an existing destination), and EVERYTHING ELSE through a
  * conditional-PUT-shaped exclusive create (`create(path,
  * overwrite = false)` + single close-time publish) — never a plain
  * rename, whose object-store implementations silently REPLACE and
  * would turn the CAS into lost-update. The fallback is exactly the
  * put-if-absent that production table formats use on S3/GCS/ABFS
  * (S3 `If-None-Match`, GCS `ifGenerationMatch: 0`); it assumes the
  * store publishes the object atomically at close, which object
  * stores do. CommitProtocolSpec races two committers over a
  * test-double filesystem whose rename silently replaces and proves
  * exactly one wins. Manifests are file-count-sized (the same
  * driver-side bound as [[ManifestSkip]]'s stats table and
  * [[Upsert]]'s partition-value pruning); at 10⁶ files a manifest is
  * one ~100 MB sequential read, vs the 10⁶ LIST round-trips it
  * replaces.
  *
  * Concurrency — OPTIMISTIC, generation-pinned: every writer reads its
  * base generation via [[ensureLoggedAt]] and commits with
  * [[commitNext]], a compare-and-swap on `baseGen + 1`. Two writers
  * racing from the same base both target the same generation number;
  * the atomic exclusive publish lets exactly one manifest in, and the
  * loser's [[commitNext]] throws [[CommitConflictException]] — its
  * moved-in data files are debris a later EXPLICIT [[vacuum]]
  * reclaims, and its OPERATION retries against the new latest state
  * (re-running re-reads, so the retry merges on top of the winner —
  * the serializable outcome). Writers never delete files they did not
  * themselves replace, so an in-flight writer's staged files are safe
  * from every other writer by construction; [[vacuum]] with a
  * modification-time horizon (remove-orphan semantics, as in
  * Delta/Iceberg) is the concurrency-safe maintenance form, and
  * horizon-0 vacuum requires a quiesced sink. Readers need no
  * coordination: a manifest-resolved read pins its file list at plan
  * time, so a concurrent rewrite cannot change the rows mid-query —
  * genuine snapshot isolation when history is retained
  * (`keepReplaced`), and the ordinary read-vs-delete race of any
  * raw-parquet table when the default GC reclaims files.
  */
/** A generation-pinned [[CommitLog.commitNext]] lost its
  * compare-and-swap: another writer committed the same generation
  * first. The operation (not just the commit) must retry from a fresh
  * [[CommitLog.ensureLoggedAt]] read. */
final class CommitConflictException(msg: String)
  extends RuntimeException(msg)

object CommitLog {

  val LogDirName = "_graft_log"

  private def logDir(sink: Path) = new Path(sink, LogDirName)

  private def manifestName(gen: Long): String = f"$gen%020d.manifest"

  /** Sink-relative form of an absolute data-file path (a listing entry
    * or a `_metadata.file_path` value). Normalized through URI paths so
    * `file:/x`, `file:///x` and plain `/x` spellings all relativize
    * identically. */
  private[graft] def relativize(fs: FileSystem, sink: Path,
                                file: String): String = {
    val sinkPath = fs.makeQualified(sink).toUri.getPath
    val filePath = new Path(file).toUri.getPath
    require(filePath.startsWith(sinkPath + "/"),
      s"$file is not under sink $sink")
    filePath.substring(sinkPath.length + 1)
  }

  /** Data files currently ON DISK under `sink`, sink-relative, sorted.
    * Hidden (`.`/`_`-prefixed) names are skipped at every path level —
    * the log itself, in-progress part files, and scratch debris are
    * never data. */
  private[graft] def listDataFiles(fs: FileSystem, sink: Path)
  : Seq[String] = {
    if (!fs.exists(sink)) return Nil
    val buf = Seq.newBuilder[String]
    val it = fs.listFiles(sink, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) {
        val rel = relativize(fs, sink, f.toString)
        if (!rel.split('/').exists(seg =>
            seg.startsWith("_") || seg.startsWith("."))) buf += rel
      }
    }
    buf.result().sorted
  }

  /** All committed generation numbers, ascending; empty when the sink
    * has never been logged. */
  def generations(fs: FileSystem, sink: Path): Seq[Long] = {
    val dir = logDir(sink)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(n => n.stripSuffix(".manifest").toLong)
      .sorted.toSeq
  }

  /** Test observability: manifests opened since process start. The
    * O(1)-manifests-per-write contract of [[ensureLoggedAt]] is
    * asserted against this counter (CommitProtocolSpec retains 100+
    * generations and shows a writer's entry reads exactly one). */
  private[graft] val manifestReads =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def readManifest(fs: FileSystem, sink: Path,
                           gen: Long): Seq[String] = {
    manifestReads.incrementAndGet()
    val in = fs.open(new Path(logDir(sink), manifestName(gen)))
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    body.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Latest committed (generation, live files), or None when the sink
    * has never been logged. */
  def committed(fs: FileSystem, sink: Path): Option[(Long, Seq[String])] = {
    val gens = generations(fs, sink)
    if (gens.isEmpty) None
    else Some(gens.last -> readManifest(fs, sink, gens.last))
  }

  /** Every data file referenced by ANY retained generation — the set
    * [[vacuum]] must never touch: a file outside it is debris from a
    * torn swap (never committed) or from an expired generation, a file
    * inside it is either live or time-travel history.
    *
    * Cost note: this reads every retained manifest — which is why only
    * the EXPLICIT maintenance entry points ([[vacuum]] /
    * [[expireGenerations]]) call it. The write path never does:
    * [[ensureLoggedAt]] reads exactly ONE manifest and the append path
    * detects its new files by a before/after listing diff, so
    * per-write log cost is O(1) manifests regardless of retained
    * history (CommitProtocolSpec pins this with [[manifestReads]]).
    * Retention ([[expireGenerations]]) bounds the maintenance cost
    * itself, exactly as production table formats bound theirs via
    * checkpoint + retention. */
  private[graft] def referencedFiles(fs: FileSystem, sink: Path)
  : Set[String] =
    generations(fs, sink).flatMap(readManifest(fs, sink, _)).toSet

  /** Filesystem schemes whose `rename` is contractually EXCLUSIVE
    * (fails, returning false, when the destination exists) — the HDFS
    * family. Everything not listed here and not local gets the
    * conditional-create publish instead: assuming rename-exclusivity
    * on an unknown scheme is exactly the silent lost-update
    * degradation the CAS exists to prevent (S3A and most object-store
    * connectors implement rename as copy+delete that REPLACES). */
  private val RenameExclusiveSchemes =
    Set("hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs")

  /** Atomically publish `tmp` as `fin` iff `fin` does not exist —
    * dispatch on the filesystem SCHEME (never on the Java class: a
    * test double or wrapper subclassing a local FS must get the
    * semantics its scheme claims, not its superclass's):
    *   - `file` → an atomically-exclusive POSIX hard link (POSIX
    *     rename silently REPLACES; local `create(overwrite=false)` is
    *     check-then-act, not atomic);
    *   - HDFS family → rename, contractually false-on-existing;
    *   - anything else → a conditional-PUT-shaped EXCLUSIVE CREATE:
    *     `create(fin, overwrite = false)` + write + close, mapping to
    *     put-if-absent on stores that enforce no-overwrite at publish
    *     time (S3 `If-None-Match` conditional writes, GCS
    *     `ifGenerationMatch: 0`, ABFS lease/etag) — the same primitive
    *     production table formats commit through. This path assumes
    *     PUT-style all-or-nothing visibility at close (an object
    *     store's contract; a partially-written manifest is impossible
    *     because nothing is visible until the single PUT lands).
    * Returns whether this writer won. CommitProtocolSpec proves the
    * fallback on a test-double FS whose rename silently replaces. */
  private[graft] def publishExclusive(fs: FileSystem, tmp: Path,
                                      fin: Path): Boolean = {
    val scheme = {
      val s = fs.getUri.getScheme
      if (s == null) "file" else s.toLowerCase(java.util.Locale.ROOT)
    }
    if (scheme == "file") {
      val t = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
      val f = java.nio.file.Paths.get(fs.makeQualified(fin).toUri.getPath)
      try {
        java.nio.file.Files.createLink(f, t)
        fs.delete(tmp, false) // also drops the checksum sidecar
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else if (RenameExclusiveSchemes.contains(scheme)) {
      fs.rename(tmp, fin)
    } else {
      // conditional create: copy the staged bytes through an
      // exclusive-create stream; exactly one concurrent creator's
      // close publishes, the rest fail FileAlreadyExists
      val body = new Array[Byte](fs.getFileStatus(tmp).getLen.toInt)
      val in = fs.open(tmp)
      try in.readFully(body) finally in.close()
      try {
        val out = fs.create(fin, false)
        try out.write(body) finally out.close()
        fs.delete(tmp, false)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    }
  }

  /** Compare-and-swap commit of `files` (sink-relative) as generation
    * `baseGen + 1` — `baseGen` MUST be the generation the writer read
    * its state from ([[ensureLoggedAt]]). Exactly one of the writers
    * racing from the same base wins; the rest throw
    * [[CommitConflictException]] and must retry their WHOLE operation
    * from a fresh read (their already-moved data files are debris a
    * later explicit [[vacuum]] reclaims). Returns the committed
    * generation. */
  def commitNext(fs: FileSystem, sink: Path, baseGen: Long,
                 files: Seq[String]): Long = {
    val gen = baseGen + 1
    val dir = logDir(sink)
    fs.mkdirs(dir)
    val fin = new Path(dir, manifestName(gen))
    if (fs.exists(fin))
      throw new CommitConflictException(
        s"generation $gen already committed at $sink — base $baseGen " +
          "is stale; re-read and retry the operation")
    // unique temp name: racing writers must not clobber each other's
    // staged manifest before the exclusive publish decides the winner
    val tmp = new Path(dir, "." + manifestName(gen) + "." +
      java.util.UUID.randomUUID().toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(files.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!publishExclusive(fs, tmp, fin)) {
      try fs.delete(tmp, false)
      catch { case scala.util.control.NonFatal(_) => () }
      throw new CommitConflictException(
        s"lost the commit race for generation $gen at $sink — " +
          "re-read and retry the operation")
    }
    gen
  }

  /** [[commitNext]] against the latest committed generation read just
    * now — for call sites that genuinely hold the only reference
    * (bootstrap). State-rewriting writers must pin their base via
    * [[ensureLoggedAt]] instead: read-then-commit here is the
    * lost-update window the CAS exists to close. */
  def commit(fs: FileSystem, sink: Path, files: Seq[String]): Long =
    commitNext(fs, sink,
      committed(fs, sink).map(_._1).getOrElse(-1L), files)

  /** EXPLICIT maintenance: delete data files on disk that NO retained
    * generation references — debris from torn swaps, lost commit
    * races, and generations removed by [[expireGenerations]]. Files
    * referenced only by OLDER generations are kept: they are snapshot
    * history ([[readAt]]); expire first to reclaim them. No-op (0) for
    * never-logged sinks. NEVER called from any write path (a writer
    * reclaiming orphans could delete a concurrent writer's
    * staged-but-uncommitted files — the committed-data-loss window the
    * round-7 audit found).
    *
    * `olderThanMs`: only reclaim orphans whose modification time is at
    * least this old — Delta/Iceberg remove-orphan semantics. With a
    * horizon comfortably above the longest in-flight write (hours),
    * vacuum is safe to run WHILE writers are active: any file younger
    * than the horizon might be a staged commit-in-progress and is left
    * alone. The default 0 reclaims everything unreferenced and is only
    * safe on a quiesced sink (no writer in flight). */
  def vacuum(fs: FileSystem, sink: Path,
             olderThanMs: Long = 0L): Long = {
    if (generations(fs, sink).isEmpty) return 0L
    val keep = referencedFiles(fs, sink)
    val cutoff = System.currentTimeMillis() - olderThanMs
    val orphans = listDataFiles(fs, sink).filterNot(keep)
      .filter(r => olderThanMs <= 0L ||
        fs.getFileStatus(new Path(sink, r)).getModificationTime <= cutoff)
    orphans.foreach(r => fs.delete(new Path(sink, r), false))
    orphans.length.toLong
  }

  /** Drop every generation except the newest `keepLast` (≥ 1), then
    * [[vacuum]] the files only those dropped generations referenced —
    * the retention step that bounds time-travel history, exactly a
    * table format's VACUUM-with-retention. Returns generations
    * removed. Erasure sinks should run this with `keepLast = 1` after
    * [[Merge.eraseParquet]]: the erased rows' bytes are already gone
    * (erase GCs immediately), but expiring also removes the stale
    * manifests that would otherwise make [[readAt]] report the
    * pre-erasure file list. */
  def expireGenerations(fs: FileSystem, sink: Path, keepLast: Int): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val gens = generations(fs, sink)
    val drop = gens.dropRight(keepLast)
    drop.foreach(g =>
      fs.delete(new Path(logDir(sink), manifestName(g)), false))
    vacuum(fs, sink)
    drop.length
  }

  /** The sink AS OF a committed generation — snapshot time travel over
    * the retained manifests. Fails loudly when `gen` is expired or its
    * files were reclaimed (a rewrite run with default GC deletes
    * replaced files immediately; pass `keepReplaced = true` to the
    * rewrite to retain snapshot history, and [[expireGenerations]] to
    * bound it). */
  def readAt(spark: SparkSession, sink: String, gen: Long): DataFrame = {
    val hPath = new Path(sink)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(generations(fs, hPath).contains(gen),
      s"generation $gen is not committed (or expired) at $sink")
    val files = readManifest(fs, hPath, gen)
    if (files.isEmpty) return spark.emptyDataFrame
    val missing = files.filterNot(r => fs.exists(new Path(hPath, r)))
    require(missing.isEmpty,
      s"generation $gen files were reclaimed (vacuumed): $missing")
    spark.read.option("basePath", sink)
      .parquet(files.map(r => new Path(hPath, r).toString): _*)
  }

  /** Bring the sink under log control and return (generation, live
    * files): bootstrap generation 0 from the directory listing when no
    * log exists, else read the LATEST manifest — exactly one manifest
    * read, O(1) regardless of retained history, and NO deletion of any
    * kind (torn-swap debris is invisible to manifest-resolving readers
    * and is reclaimed only by explicit [[vacuum]] maintenance — a
    * write-path reclaim could destroy a concurrent writer's staged
    * files). Every logged writer calls this FIRST — which is what
    * makes the bootstrap listing trustworthy by induction — and passes
    * the returned generation to [[commitNext]] as its CAS base. A lost
    * bootstrap race adopts the winner's log. */
  def ensureLoggedAt(fs: FileSystem, sink: Path): (Long, Seq[String]) =
    committed(fs, sink) match {
      case None =>
        val files = listDataFiles(fs, sink)
        try {
          (commitNext(fs, sink, -1L, files), files)
        } catch {
          case _: CommitConflictException => committed(fs, sink).get
        }
      case Some(gAndLive) => gAndLive
    }

  /** [[ensureLoggedAt]] for callers that only need the live set. */
  def ensureLogged(fs: FileSystem, sink: Path): Seq[String] =
    ensureLoggedAt(fs, sink)._2

  /** The sink's rows, exactly-once: resolved through the latest
    * manifest when one exists (explicit live-file list + `basePath`,
    * so partition columns still materialize from directory names),
    * plain directory read otherwise. This is THE reader the protocol's
    * guarantee is stated for — a plain `spark.read.parquet(sink)` is
    * only equivalent once [[vacuum]] has run. */
  /** `mergeSchema = true` unions the live files' footer schemas — the
    * reader side of [[Merge.mergeParquet]]'s lazy schema evolution,
    * where untouched files legitimately carry an older (narrower)
    * schema and their rows take NULLs for the widened columns. */
  def read(spark: SparkSession, sink: String,
           mergeSchema: Boolean = false): DataFrame = {
    val hPath = new Path(sink)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rd = spark.read.option("mergeSchema", mergeSchema.toString)
    committed(fs, hPath) match {
      case None => rd.parquet(sink)
      case Some((_, live)) if live.isEmpty => spark.emptyDataFrame
      case Some((_, live)) =>
        rd.option("basePath", sink)
          .parquet(live.map(r => new Path(hPath, r).toString): _*)
    }
  }
}
