package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, shiftleft,
  shiftright, size, filter => arrFilter}

/** Multi-dimensional clustering — `OPTIMIZE ZORDER BY` (Delta's
  * Z-ordering, the Morton-curve layout every lakehouse engine ships
  * for multi-column pruning): rewrite a logged sink so each output
  * file covers a small HYPERCUBE of the clustering columns' value
  * space instead of a slab of one column. After the rewrite +
  * re-ANALYZE, the manifest's per-file `#stats` bounds are tight on
  * EVERY clustering column, so [[TableStats.pruneIn]] skips files for
  * a selective band on ANY of them — a linear sort can only ever
  * serve its leading column.
  *
  * Mechanics, all shuffle-bounded (never a global window):
  *
  *   1. one distributed aggregate computes 2^bits equi-depth bucket
  *      boundaries per column (`approx_percentile` with a probability
  *      array — ONE job for all columns), broadcast into the bucket
  *      expression as array literals;
  *   2. each row's per-column bucket ids are bit-interleaved into the
  *      Morton key (pure codegen'd shift/mask arithmetic);
  *   3. `repartitionByRange(nFiles, zkey)` + in-partition sort lands
  *      contiguous Z-curve segments as files — equi-depth buckets
  *      make the segments balanced under skew;
  *   4. the new file set REPLACES the live set in one terminal CAS
  *      commit (rewriter semantics — a concurrent writer's commit
  *      makes this one conflict loudly), and a re-ANALYZE commits the
  *      new tight bounds.
  *
  * The scan reads through column mappings, widening casts AND
  * deletion vectors ([[CommitLog.mappedScan]]), so like
  * [[SchemaEvolve.normalizeCompact]] the rewrite pays down the whole
  * mapping/DV debt as a side effect. Flat sinks only (a partitioned
  * sink already prunes on its partition columns first; Z-order the
  * columns WITHIN a partition by compacting per partition instead).
  *
  * At 100 TB: the boundary aggregate is one pass with a tiny result
  * (cols × 2^bits doubles), the rewrite is one shuffle of the data
  * (the same cost any OPTIMIZE pays), and the pruning payoff
  * compounds — a band of selectivity s on any one of k clustered
  * columns keeps ~s^(1/k)-ish of the files' hypercubes instead of
  * all of them. */
object Cluster {

  /** Rewrite `path` Z-ordered by `cols` into ~`nFiles` files and
    * re-ANALYZE the clustering columns. Returns (files before, files
    * after). `bitsPerCol` bounds the curve resolution; cols.size ×
    * bitsPerCol must fit a long. */
  def zorderBy(spark: SparkSession, path: String, cols: Seq[String],
               nFiles: Int, bitsPerCol: Int = 6,
               failpoint: String => Unit = _ => ()): (Long, Long) = {
    require(cols.size >= 2,
      "zorderBy needs at least two columns — use a plain sorted " +
        "compaction for one")
    require(bitsPerCol >= 1 && bitsPerCol * cols.size <= 62,
      s"bitsPerCol=$bitsPerCol over ${cols.size} columns does not " +
        "fit a long Morton key")
    require(nFiles >= 1, "nFiles must be positive")
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (baseGen, live) = CommitLog.ensureLoggedAt(fs, hPath)
    require(live.nonEmpty, s"zorderBy on an empty sink $path")
    require(CommitLog.partitionColsOf(live).isEmpty,
      s"zorderBy supports flat sinks (got a hive layout at $path) — " +
        "partition pruning already serves the partition columns; " +
        "Z-order within partitions via per-partition compaction")
    val cms = CommitLog.colmapRecords(fs, hPath)
    val cts = CommitLog.coltypeRecords(fs, hPath)
    val dvs = CommitLog.dvRecords(fs, hPath)
    // stats coverage BEFORE the rewrite (records leave with files)
    val priorStatsCols = CommitLog.statsRecords(fs, hPath)
      .values.flatMap(_.keySet).toSeq.distinct.sorted
    // logical, DV-applied view: the rewrite pays down mapping/DV debt
    val scan = CommitLog.mappedScan(spark, hPath, live, cms, dvs,
      coltypes = cts)
    val missing = cols.filterNot(scan.columns.contains)
    require(missing.isEmpty,
      s"zorderBy column(s) ${missing.mkString(", ")} not in $path's " +
        s"logical schema ${scan.columns.mkString(", ")}")
    require(!scan.columns.contains("__z"),
      "zorderBy stages its Morton key as `__z` — a sink column of " +
        "that name would be silently overwritten; rename it first")
    // 1) equi-depth boundaries for every column in ONE aggregate job
    val nBuckets = 1 << bitsPerCol
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val pctExprs = cols.map(c => expr(
      s"approx_percentile(CAST(`$c` AS DOUBLE), " +
        s"array(${probs.mkString(",")}), 10000)").as(c))
    val row = scan.agg(pctExprs.head, pctExprs.tail: _*).head
    val bounds: Seq[(String, Seq[Double])] = cols.zipWithIndex.map {
      case (c, i) =>
        require(!row.isNullAt(i),
          s"zorderBy: column `$c` has no non-null values to cluster")
        c -> row.getSeq[Double](i)
    }
    // 2) bucket id = #boundaries <= value (equi-depth rank, 0-based;
    //    nulls compare null, drop from the filter, land in bucket 0)
    val bucketOf: Map[String, Column] = bounds.map { case (c, bs) =>
      val arr = org.apache.spark.sql.functions.array(
        bs.distinct.map(lit(_)): _*)
      c -> size(arrFilter(arr, b => b <= col(c).cast("double")))
        .cast("long")
    }.toMap
    // 3) Morton interleave: bit i of column j lands at i*k + j
    val k = cols.size
    val zkey = (0 until bitsPerCol).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bucketOf(c), i).bitwiseAND(lit(1L)), i * k + j))
      }
    }
    val tmp = new Path(hPath.getParent, hPath.getName + "__z_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val dataCols = scan.columns.toIndexedSeq.map(col)
    scan.withColumn("__z", zkey)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(dataCols: _*)
      .write.parquet(tmp.toString)
    // 4) add → terminal-CAS COMMIT (full replacement) → GC
    val added = Seq.newBuilder[String]
    val it = fs.listFiles(tmp, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) {
        val rel = CommitLog.relativize(fs, tmp, f.toString)
        val dest = new Path(hPath, rel)
        if (!fs.rename(f, dest))
          throw new java.io.IOException(
            s"zorderBy: could not move $f into $dest")
        added += rel
      }
    }
    failpoint("added")
    val newFiles = added.result()
    // old files leave the manifest → their DV/stats/mapping records
    // drop with them in the same atomic publish
    CommitLog.commitNext(fs, hPath, baseGen, newFiles)
    failpoint("committed")
    live.foreach { r => // GC, best-effort
      try fs.delete(new Path(hPath, r), false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    fs.delete(tmp, true)
    // the new tight hypercube bounds are the whole point; the old
    // files' records left with them, so re-ANALYZE the UNION of the
    // previously covered columns and the clustering columns — a
    // rewrite must never silently shrink the table's stats coverage
    val covered = (priorStatsCols ++ cols).distinct
      .filter(scan.columns.contains)
    TableStats.analyze(spark, path, covered)
    (live.size.toLong, newFiles.size.toLong)
  }
}
