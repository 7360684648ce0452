package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manifest-resident per-file column statistics — the min/max/null
  * bounds production table formats keep next to each data file (Delta
  * per-file `stats` JSON, Iceberg manifest `lower_bounds`/
  * `upper_bounds`) so a point/band query PRUNES its file list from
  * the manifest alone, before any footer is opened or scan planned.
  * At 10⁶ files that is one cached manifest parse against 10⁶ footer
  * reads.
  *
  *   - [[analyze]] computes the bounds for chosen columns in ONE scan
  *     grouped by `_metadata.file_path` (file-count-sized result) and
  *     commits them as `#stats` overlays; `onlyMissing` makes it an
  *     incremental catch-up pass that touches only never-analyzed
  *     files — an append then costs one delta-sized re-analyze, not a
  *     table pass.
  *   - [[readBand]] is the consumer: live files whose recorded
  *     [min, max] cannot intersect the band are dropped BEFORE the
  *     scan is planned; the exact predicate is re-applied after, so
  *     pruning is pure I/O elision, never a semantics change. Files
  *     with no record survive (conservative), all-null files are
  *     skippable, and deletion vectors still apply — bounds are
  *     computed over RAW rows, a superset of the visible ones, so
  *     pruning stays sound under merge-on-read deletes.
  *   - A [[SchemaEvolve]]-mapped sink reads correctly but UNMAPPED
  *     files only prune conservatively: stats are keyed by PHYSICAL
  *     column name, so mapped files simply stop pruning until a
  *     rewrite/normalize re-analyzes them (never misprune).
  *
  * Stats records carry forward per surviving file automatically
  * ([[CommitLog.commitNext]]), so compaction/merge retire exactly the
  * rewritten files' bounds and an append leaves every untouched file
  * prunable. The reference leans on BigQuery's automatic pruning
  * (`dags/idh_etl.py:247-256`); raw parquet needs the bounds
  * materialized somewhere a planner can read cheaply. */
object TableStats {

  /** Comparison domain of a Spark type, or None when unsupported for
    * stats (nested/binary/array — never pruned, never analyzed). */
  private def domainOf(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("long")
    case FloatType | DoubleType => Some("double")
    case _: DecimalType => Some("decimal")
    case StringType => Some("string")
    case DateType => Some("date")
    case TimestampType | TimestampNTZType => Some("micros")
    case BooleanType => Some("long")
    case _ => None
  }

  /** Encode a NATIVE collected min/max value into its domain's
    * orderable string — numerics (incl. date as epoch day, timestamps
    * as epoch micros, booleans as 0/1) through a plain decimal
    * rendering BigDecimal re-parses, strings verbatim. Aggregation
    * itself runs on the NATIVE type (string min/max would order
    * numbers lexicographically). */
  private def encNative(v: Any): String = v match {
    case null => null
    case s: String => s
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
    case d: java.time.LocalDate => d.toEpochDay.toString
    case t: java.sql.Timestamp =>
      (math.floorDiv(t.getTime, 1000L) * 1000000L +
        t.getNanos / 1000L).toString
    case i: java.time.Instant =>
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case l: java.time.LocalDateTime =>
      (l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        l.getNano / 1000L).toString
    case b: java.lang.Boolean => if (b) "1" else "0"
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: scala.math.BigDecimal => bd.underlying.toPlainString
    case n: java.lang.Number =>
      new java.math.BigDecimal(n.toString).toPlainString
    case other => throw new IllegalArgumentException(
      s"analyze: unencodable bound value $other " +
        s"(${other.getClass.getName})")
  }

  private def cmpEnc(typ: String, a: String, b: String): Int =
    if (typ == "string") a.compareTo(b)
    else new java.math.BigDecimal(a).compareTo(
      new java.math.BigDecimal(b))

  /** Encode a USER band endpoint into the recorded domain. */
  private def encVal(typ: String, v: Any): String = (typ, v) match {
    case ("string", s: String) => s
    case ("date", d: java.sql.Date) => d.toLocalDate.toEpochDay.toString
    case ("date", d: java.time.LocalDate) => d.toEpochDay.toString
    case ("micros", t: java.sql.Timestamp) =>
      (t.getTime * 1000L + (t.getNanos % 1000000) / 1000L).toString
    case (_, n: java.lang.Number) =>
      new java.math.BigDecimal(n.toString).toPlainString
    case _ => throw new IllegalArgumentException(
      s"readBand: cannot encode $v (${v.getClass.getSimpleName}) " +
        s"into stats domain '$typ'")
  }

  /** ANALYZE: per-(live file, column) row/null counts and min/max
    * bounds for `cols`, committed as `#stats` manifest records — one
    * scan over the targeted files, one file-count-sized collect, one
    * commit. `onlyMissing = true` (default) targets only files with
    * no record yet for EVERY requested column — the incremental form
    * an append pipeline runs. Mapped files ([[SchemaEvolve]]) are
    * skipped (their physical names would not match logical pruning
    * lookups). Returns files analyzed. */
  def analyze(spark: SparkSession, path: String, cols: Seq[String],
              onlyMissing: Boolean = true): Long = {
    require(cols.nonEmpty, "analyze needs at least one column")
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (gen, live) = CommitLog.ensureLoggedAt(fs, hPath)
    val mapped = CommitLog.colmapRecords(fs, hPath).keySet ++
      CommitLog.coltypeRecords(fs, hPath).keySet
    val existing = CommitLog.statsRecords(fs, hPath)
    val targets = live.filterNot(mapped).filter { f =>
      !onlyMissing ||
        !cols.forall(existing.getOrElse(f, Map.empty).contains)
    }
    if (targets.isEmpty) return 0L
    val prefix = fs.makeQualified(hPath).toUri.getPath + "/"
    val fp = col("_metadata.file_path")
    val scan = spark.read.option("mergeSchema", "true")
      .option("basePath", hPath.toString)
      .parquet(targets.map(r => new Path(hPath, r).toString): _*)
      .withColumn("__f", fp.substr(
        locate(prefix, fp) + lit(prefix.length), length(fp)))
    val schema = scan.schema
    val present = cols.filter(schema.fieldNames.contains)
    val typed = present.flatMap { c =>
      domainOf(schema(c).dataType).map(t => (c, t))
    }
    require(typed.nonEmpty,
      s"analyze: none of $cols is a stats-capable column of $path")
    val aggs = typed.zipWithIndex.flatMap { case ((c, _), i) =>
      Seq(
        min(col(c)).as(s"__min$i"),
        max(col(c)).as(s"__max$i"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null$i"))
    }
    val rows = scan.groupBy("__f")
      .agg(count(lit(1)).as("__n"), aggs: _*)
      .collect()
    val stats: Map[String, Map[String, CommitLog.ColStats]] =
      rows.map { r =>
        val f = r.getString(r.fieldIndex("__f"))
        val n = r.getLong(r.fieldIndex("__n"))
        f -> typed.zipWithIndex.map { case ((c, t), i) =>
          c -> CommitLog.ColStats(t, n,
            r.getLong(r.fieldIndex(s"__null$i")),
            Option(r.get(r.fieldIndex(s"__min$i"))).map(encNative),
            Option(r.get(r.fieldIndex(s"__max$i"))).map(encNative))
        }.toMap
      }.toMap
    CommitLog.commitNext(fs, hPath, gen, live, stats = stats)
    targets.length.toLong
  }

  /** Live files whose recorded bounds CAN intersect `[lo, hi]` on
    * `column`, and those provably outside it — the manifest-only
    * pruning decision. Unknown files (no record, or a mapped file)
    * survive; an all-null file is provably outside any band. */
  def pruneBand(fs: org.apache.hadoop.fs.FileSystem, sink: Path,
                column: String, lo: Any, hi: Any)
  : (Seq[String], Seq[String]) = {
    val (_, live) = CommitLog.ensureLoggedAt(fs, sink)
    val stats = CommitLog.statsRecords(fs, sink)
    val (keep, skip) = live.partition { f =>
      stats.getOrElse(f, Map.empty).get(column) match {
        case None => true // unknown: never skip
        case Some(cs) if cs.min.isEmpty || cs.max.isEmpty =>
          cs.nNulls < cs.nRows // all-null file matches no band
        case Some(cs) =>
          cmpEnc(cs.typ, cs.max.get, encVal(cs.typ, lo)) >= 0 &&
            cmpEnc(cs.typ, cs.min.get, encVal(cs.typ, hi)) <= 0
      }
    }
    (keep, skip)
  }

  /** Manifest-pruned band read: plan the scan over ONLY the files
    * whose bounds can hold `column ∈ [lo, hi]`, apply deletion
    * vectors, then re-apply the exact predicate — identical rows to
    * the unpruned filter, minus the skipped files' I/O. Falls back to
    * the plain (still exact) filtered read when nothing can be
    * skipped. */
  def readBand(spark: SparkSession, path: String, column: String,
               lo: Any, hi: Any): DataFrame = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (keep, _) = pruneBand(fs, hPath, column, lo, hi)
    val band = col(column) >= lit(lo) && col(column) <= lit(hi)
    if (keep.isEmpty)
      return CommitLog.read(spark, path).filter(band).limit(0)
    val cms = CommitLog.colmapRecords(fs, hPath)
    val cts = CommitLog.coltypeRecords(fs, hPath)
    val dvs = CommitLog.dvRecords(fs, hPath)
      .filter { case (f, _) => keep.contains(f) }
    CommitLog.mappedScan(spark, hPath, keep, cms, dvs, coltypes = cts)
      .filter(band)
  }
}
