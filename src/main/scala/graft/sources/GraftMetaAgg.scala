package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{
  AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._

import graft.operators.{CommitLog, TableStats}

/** METADATA-ONLY aggregation: answer `COUNT(*)` / `COUNT(col)` /
  * `MIN(col)` / `MAX(col)` / `SUM(col)` (and through Spark's
  * sum/count decomposition, `AVG`) — optionally grouped by partition
  * columns, optionally under partition-exact predicates — from the
  * manifest alone, zero data I/O (the capability behind the V2 scan
  * builder's
  * [[org.apache.spark.sql.connector.read.SupportsPushDownAggregates]]).
  * At 100 TB this is the difference between a sub-second `SELECT
  * count(*) FROM t WHERE day = X` and a full partition scan: the
  * manifest already knows every file's row count (`#stats`), its
  * deleted-position cardinality (`#dv`), and its partition values
  * (the path), so the aggregate is driver-side arithmetic over a
  * file-count-sized list — the same trick Delta's metadata-only
  * count and Iceberg's partition-stats aggregates play.
  *
  * Pushdown is COMPLETE-or-nothing and refuses (returns None, Spark
  * falls back to the ordinary scan — correctness never depends on
  * this path) whenever exactness cannot be PROVEN from metadata:
  *
  *   - any kept file without a `#stats` row count, or carrying a
  *     `#dv` record without the mark-cardinality extension;
  *   - `COUNT(col)` / `MIN` / `MAX` / `SUM` on a data column of a
  *     file with unapplied deletes (a deleted row could be the
  *     extremum, a null, or part of the raw sum — partition-column
  *     variants stay exact under DVs, the directory value is
  *     row-invariant);
  *   - `SUM` on anything but integral/decimal columns (float sums
  *     are order-dependent so `#stats` never records them), on files
  *     without the sum field, or when the exact total falls outside
  *     the result type's range (the scan's ANSI arithmetic must
  *     stay the semantics);
  *   - min/max bounds recorded as undefined while the file has
  *     non-null rows (the NaN/±Inf trade [[TableStats.analyze]]
  *     documents) or spanning mixed comparison domains;
  *   - group-by / extremum partition values whose directory
  *     rendering does not decode canonically into the catalog type
  *     (fractional / timestamp renderings are never trusted —
  *     mirroring [[TableStats.canMatchPart]]'s comparison rules);
  *   - any filter not fully enforced by the layout
  *     ([[TableStats.exactlyHandledByLayout]]), any distinct
  *     aggregate, any non-Count/Min/Max function.
  *
  * `#stats` bounds are computed over RAW rows and encode EXACT
  * values (strings verbatim, numerics as shortest-round-trip decimal
  * renderings), so with zero deletes min/max decode back bit-exact.
  */
private[sources] object GraftMetaAgg {

  /** A fully planned metadata aggregate: the scan's output schema
    * (group columns first, then one field per aggregate, in pushed
    * order — the positional contract Spark's complete pushdown
    * expects), its precomputed rows, and a human description for
    * plan pins. */
  final case class Planned(schema: StructType, rows: Seq[Row],
                           desc: String)

  /** A PARTIALLY planned metadata aggregate (the hybrid tier behind
    * `supportCompletePushDown = false` + `pushAggregation = true`):
    * files whose answer is PROVEN by the manifest contribute
    * precomputed partial rows (`rows`), the remainder (`dirty` —
    * DV'd files, record-less files, undecodable bounds) is scanned
    * and partially aggregated at execution, and Spark's FINAL
    * aggregate merges the two streams (min of mins, sum of
    * counts/sums — the standard partial-agg contract). Same
    * positional schema as [[Planned]]; `groupCols`/`aggSpecs` let
    * the executing relation rebuild the dirty-side aggregation
    * (`aggSpecs` is (function, column) with function ∈ count_star |
    * count | min | max | sum). At 100 TB this is the difference
    * between re-scanning everything because ONE file took a delete
    * and scanning exactly that one file. */
  final case class PartialPlanned(schema: StructType, rows: Seq[Row],
                                  dirty: Seq[String],
                                  groupCols: Seq[String],
                                  aggSpecs: Seq[(String, String)],
                                  desc: String)

  /** Exact VISIBLE row count of `files` from the manifest (`#stats`
    * raw rows minus `#dv` cardinality), or None when any file lacks
    * either number — shared with the scan's
    * [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]
    * surface. */
  def visibleRowsOf(m: CommitLog.Manifest, files: Seq[String])
  : Option[Long] = {
    var total = 0L
    val it = files.iterator
    while (it.hasNext) {
      val f = it.next()
      val raw = m.stats.getOrElse(f, Map.empty)
        .values.headOption.map(_.nRows)
      val marks =
        if (m.dvs.contains(f)) m.dvMarks.get(f) else Some(0L)
      (raw, marks) match {
        case (Some(r), Some(k)) => total += r - k
        case _ => return None
      }
    }
    Some(total)
  }

  // refusal is control flow here, never an error: any unprovable step
  // throws Refuse and tryPlan answers None (Spark then scans data)
  private final class Refuse extends
    scala.util.control.ControlThrowable

  private def refuse(): Nothing = throw new Refuse

  /** Everything the aggregate arithmetic needs about one kept file:
    * partition values from its path, raw row count, deleted-mark
    * count, per-column stats. A `#coltype` cast record never
    * invalidates a COEXISTING stats record: a rendering-changing
    * widen (float → double) drops the column's pre-widen bounds in
    * its own commit ([[graft.operators.SchemaEvolve]]), integer
    * promotions keep exact renderings, and a metadata-added column's
    * bounds are recorded through its record — so any record found
    * here decodes exactly. */
  private final case class FileMeta(pv: Map[String, String],
                                    raw: Long, marks: Long,
                                    stats: Map[String,
                                      CommitLog.ColStats]) {
    def visible: Long = raw - marks
  }

  private sealed trait Spec
  private case object CountStarSpec extends Spec
  private final case class CountColSpec(f: StructField) extends Spec
  private final case class MinMaxSpec(f: StructField, isMin: Boolean)
    extends Spec
  private final case class SumSpec(f: StructField) extends Spec

  /** Spark's result type for a pushed SUM — must match exactly for
    * the positional schema contract. Only integral and decimal
    * columns are summable here (the `#stats` sum field is recorded
    * for exactly those; float sums are order-dependent). */
  private def sumResultType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case d: DecimalType =>
      DecimalType(math.min(38, d.precision + 10), d.scale)
    case _ => refuse()
  }

  private def fieldOf(schema: StructType,
                      e: org.apache.spark.sql.connector.expressions
                        .Expression): StructField = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      val n = r.fieldNames()(0)
      schema.fields.find(_.name == n)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(n)))
        .getOrElse(refuse())
    case _ => refuse()
  }

  /** Decode a partition DIRECTORY value into the catalog type's
    * EXTERNAL value — only renderings that round-trip canonically
    * (the same trust boundary as [[TableStats.canMatchPart]]):
    * strings verbatim, integrals via exact long parse, booleans,
    * ISO dates. The null marker decodes to null. Anything else
    * refuses. */
  private def dirValue(dir: String, dt: DataType): Any = {
    if (dir == TableStats.HiveDefaultPart) return null
    try dt match {
      case StringType => dir
      case ByteType => dir.toLong.toByte match {
        case b if b.toLong == dir.toLong => b; case _ => refuse() }
      case ShortType => dir.toLong.toShort match {
        case s if s.toLong == dir.toLong => s; case _ => refuse() }
      case IntegerType => dir.toLong.toInt match {
        case i if i.toLong == dir.toLong => i; case _ => refuse() }
      case LongType => dir.toLong
      case BooleanType => dir.toLowerCase(java.util.Locale.ROOT) match {
        case "true" => true
        case "false" => false
        case _ => refuse()
      }
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.parse(dir))
      case _ => refuse()
    } catch {
      case _: NumberFormatException => refuse()
      case _: java.time.format.DateTimeParseException => refuse()
    }
  }

  /** Whether a partition directory rendering would be RE-TYPED by
    * Spark's partition-type inference when it is the only value seen
    * (numeric / date / timestamp-looking) — the subset-read stability
    * check [[planPartial]] applies to string-typed group keys. */
  private def retypeable(d: String): Boolean =
    scala.util.Try(new java.math.BigDecimal(d)).isSuccess ||
    scala.util.Try(java.time.LocalDate.parse(d)).isSuccess ||
    scala.util.Try(java.sql.Timestamp.valueOf(d)).isSuccess

  /** Natural ordering of decoded partition values (non-null), for
    * the partition-valued min/max path. */
  private def cmpExternal(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => cmpUtf8(x, y)
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Long.compare(x.longValue, y.longValue)
    case (x: java.lang.Boolean, y: java.lang.Boolean) =>
      java.lang.Boolean.compare(x, y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case _ => refuse()
  }

  private def cmpUtf8(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Decode a `#stats` bound (its domain's orderable string — the
    * exact inverse of [[TableStats]]'s `encNative`) into the catalog
    * type's EXTERNAL value. Shortest-round-trip renderings make the
    * float/double decode bit-exact. */
  private def decodeBound(typ: String, enc: String, dt: DataType)
  : Any =
    try (typ, dt) match {
      case ("string", StringType) => enc
      case ("long", ByteType) =>
        new java.math.BigDecimal(enc).byteValueExact()
      case ("long", ShortType) =>
        new java.math.BigDecimal(enc).shortValueExact()
      case ("long", IntegerType) =>
        new java.math.BigDecimal(enc).intValueExact()
      case ("long", LongType) =>
        new java.math.BigDecimal(enc).longValueExact()
      case ("long", BooleanType) => enc != "0"
      case ("double", FloatType) => enc.toFloat
      case ("double", DoubleType) => enc.toDouble
      case ("decimal", _: DecimalType) => new java.math.BigDecimal(enc)
      case ("date", DateType) => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(enc.toLong))
      case ("micros", TimestampType) =>
        val us = enc.toLong
        val ts = new java.sql.Timestamp(
          Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case ("micros", TimestampNTZType) =>
        val us = enc.toLong
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case _ => refuse()
    } catch {
      case _: NumberFormatException => refuse()
      case _: ArithmeticException => refuse()
    }

  /** Plan the pushed aggregation as precomputed rows, or None when
    * any step cannot be proven exact from the manifest. Driver-side,
    * manifest-scale: O(live files × aggregates). */
  def tryPlan(state: GraftState, filters: Seq[Filter],
              agg: Aggregation): Option[Planned] =
    try Some(plan(state, filters, agg))
    catch { case _: Refuse => None }

  private def parseSpecs(schema: StructType, agg: Aggregation)
  : Seq[Spec] = agg.aggregateExpressions.toSeq.map {
    case _: CountStar => CountStarSpec
    case c: Count if !c.isDistinct =>
      CountColSpec(fieldOf(schema, c.column))
    case mn: Min => MinMaxSpec(fieldOf(schema, mn.column),
      isMin = true)
    case mx: Max => MinMaxSpec(fieldOf(schema, mx.column),
      isMin = false)
    case sm: Sum if !sm.isDistinct =>
      SumSpec(fieldOf(schema, sm.column))
    case _ => refuse()
  }

  /** The scan's positional output schema: group columns first, then
    * one field per aggregate — identical for the complete and
    * partial forms (Spark's final merge aggregates use the same
    * per-function result types its complete projection does). */
  private def schemaOf(groupFields: Seq[StructField],
                       specs: Seq[Spec]): StructType = StructType(
    groupFields.map(f => StructField(f.name, f.dataType,
      nullable = true)) ++
    specs.zipWithIndex.map {
      case (CountStarSpec, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (CountColSpec(_), i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (MinMaxSpec(f, _), i) =>
        StructField(s"agg_$i", f.dataType, nullable = true)
      case (SumSpec(f), i) =>
        StructField(s"agg_$i", sumResultType(f.dataType),
          nullable = true)
    })

  private def aggNamesOf(specs: Seq[Spec]): Seq[String] = specs.map {
    case CountStarSpec => "count(*)"
    case CountColSpec(f) => s"count(${f.name})"
    case MinMaxSpec(f, true) => s"min(${f.name})"
    case MinMaxSpec(f, false) => s"max(${f.name})"
    case SumSpec(f) => s"sum(${f.name})"
  }

  private def plan(state: GraftState, filters: Seq[Filter],
                   agg: Aggregation): Planned = {
    val m = state.manifest
    val schema = state.schema
    // defense in depth: Spark only tries aggregate pushdown when the
    // builder reported zero residual filters, but re-prove that every
    // filter really is layout-exact before trusting the kept set
    if (!filters.forall(TableStats.exactlyHandledByLayout(m.files, _)))
      refuse()
    val groupFields = agg.groupByExpressions.toSeq
      .map(fieldOf(schema, _))
    val specs = parseSpecs(schema, agg)
    val (kept, _) = TableStats.pruneIn(m.files, m.stats, m.dvMarks,
      filters)
    val metas: Seq[FileMeta] = kept.map { f =>
      val st = m.stats.getOrElse(f, Map.empty)
      val raw = st.values.headOption.map(_.nRows).getOrElse(refuse())
      val marks =
        if (m.dvs.contains(f)) m.dvMarks.getOrElse(f, refuse())
        else 0L
      FileMeta(TableStats.partValuesOf(f), raw, marks, st)
    }
    // group keys decode from the path; a group column missing from
    // any file's path (a data column) refuses. Grouped: a group whose
    // files have zero VISIBLE rows total (a committed empty file, or
    // every row deleted without the file being pruned) produces NO
    // row from a real scan, so it must produce none here; the global
    // no-group case keeps its single row (count 0 / null extrema IS
    // the scan's answer).
    val groups: Seq[(Seq[Any], Seq[FileMeta])] =
      if (groupFields.isEmpty) Seq(Seq.empty[Any] -> metas)
      else metas.groupBy { fm =>
        groupFields.map(gf =>
          dirValue(fm.pv.getOrElse(gf.name, refuse()), gf.dataType))
      }.toSeq.filter { case (_, fs) => fs.exists(_.visible > 0L) }
    val rows = groups.map { case (key, fs) =>
      Row.fromSeq(key ++ specs.map(cell(_, fs)))
    }
    Planned(schemaOf(groupFields, specs), rows,
      s"[${aggNamesOf(specs).mkString(", ")}]" +
        (if (groupFields.isEmpty) ""
         else s" groupBy=[${groupFields.map(_.name).mkString(", ")}]") +
        s" files=${kept.size} groups=${groups.size}")
  }

  /** Plan the HYBRID pushdown ([[PartialPlanned]]): or None when no
    * split is worthwhile — every file already provable (complete
    * pushdown's territory), or none is (nothing to answer from
    * metadata). Per-file provability reuses [[cell]] verbatim on
    * singleton lists, so the two tiers can never disagree on what
    * metadata may answer. */
  def tryPlanPartial(state: GraftState, filters: Seq[Filter],
                     agg: Aggregation): Option[PartialPlanned] =
    try Some(planPartial(state, filters, agg))
    catch { case _: Refuse => None }

  private def planPartial(state: GraftState, filters: Seq[Filter],
                          agg: Aggregation): PartialPlanned = {
    val m = state.manifest
    val schema = state.schema
    if (!filters.forall(TableStats.exactlyHandledByLayout(m.files, _)))
      refuse()
    val groupFields = agg.groupByExpressions.toSeq
      .map(fieldOf(schema, _))
    val specs = parseSpecs(schema, agg)
    val (kept, _) = TableStats.pruneIn(m.files, m.stats, m.dvMarks,
      filters)
    // classify: a file is CLEAN when the manifest alone proves every
    // pushed aggregate AND every group key for it; everything else
    // (no stats record, DV'd data-column aggregate, undecodable
    // bound/path value) is DIRTY and goes to the execution-time scan
    val classified: Seq[(String, Option[FileMeta])] = kept.map { f =>
      val st = m.stats.getOrElse(f, Map.empty)
      val raw = st.values.headOption.map(_.nRows)
      val marks = if (m.dvs.contains(f)) m.dvMarks.get(f) else Some(0L)
      val fm = for { r <- raw; k <- marks }
        yield FileMeta(TableStats.partValuesOf(f), r, k, st)
      f -> fm.filter { meta =>
        try {
          groupFields.foreach(gf => dirValue(
            meta.pv.getOrElse(gf.name, refuse()), gf.dataType))
          specs.foreach(cell(_, Seq(meta)))
          true
        } catch { case _: Refuse => false }
      }
    }
    val clean = classified.collect { case (_, Some(fm)) => fm }
    val dirty = classified.collect { case (f, None) => f }
    // no metadata answer → pushing would only add a useless agg
    // layer; no dirty remainder → complete pushdown's territory (and
    // if THAT refused, the group-level merge below would refuse for
    // the same reason)
    if (clean.isEmpty || dirty.isEmpty) refuse()
    // DIRTY files' group keys surface through the execution-time
    // scan, whose partition-type inference runs over the dirty SUBSET
    // only. Require every dirty key to decode canonically into the
    // catalog type (same trust boundary as the clean side) and, for
    // string-typed keys, to be inference-STABLE: a rendering the full
    // table reads verbatim but a numeric/date-looking subset would
    // re-type (directory '00' → int 0 → cast back '0' ≠ '00') would
    // silently split the group. Refusal falls back to the plain scan.
    dirty.foreach { f =>
      val pv = TableStats.partValuesOf(f)
      groupFields.foreach { gf =>
        val d = pv.getOrElse(gf.name, refuse())
        dirValue(d, gf.dataType)
        if (gf.dataType == StringType &&
            d != TableStats.HiveDefaultPart && retypeable(d)) refuse()
      }
    }
    val groups: Seq[(Seq[Any], Seq[FileMeta])] =
      if (groupFields.isEmpty) Seq(Seq.empty[Any] -> clean)
      else clean.groupBy { fm =>
        groupFields.map(gf =>
          dirValue(fm.pv.getOrElse(gf.name, refuse()), gf.dataType))
      }.toSeq.filter { case (_, fs) => fs.exists(_.visible > 0L) }
    val rows = groups.map { case (key, fs) =>
      Row.fromSeq(key ++ specs.map(cell(_, fs)))
    }
    val specKeys = specs.map {
      case CountStarSpec => ("count_star", "")
      case CountColSpec(f) => ("count", f.name)
      case MinMaxSpec(f, true) => ("min", f.name)
      case MinMaxSpec(f, false) => ("max", f.name)
      case SumSpec(f) => ("sum", f.name)
    }
    PartialPlanned(schemaOf(groupFields, specs), rows, dirty,
      groupFields.map(_.name), specKeys,
      s"[${aggNamesOf(specs).mkString(", ")}]" +
        (if (groupFields.isEmpty) ""
         else s" groupBy=[${groupFields.map(_.name).mkString(", ")}]") +
        s" files_meta=${clean.size} files_scanned=${dirty.size}")
  }

  private def cell(spec: Spec, fs: Seq[FileMeta]): Any = spec match {
    case CountStarSpec => fs.map(_.visible).sum
    case CountColSpec(f) =>
      // partition-valued count first: the directory value decides
      // null-ness for every row, so it stays exact under DVs (a
      // deleted row had the same, known, value)
      if (fs.forall(_.pv.contains(f.name)))
        fs.map(fm => if (fm.pv(f.name) == TableStats.HiveDefaultPart)
          0L else fm.visible).sum
      else if (fs.forall(fm => fm.marks == 0L &&
          fm.stats.contains(f.name)))
        fs.map { fm =>
          val cs = fm.stats(f.name); cs.nRows - cs.nNulls
        }.sum
      else refuse()
    case SumSpec(f) =>
      var total = java.math.BigDecimal.ZERO
      var nonNull = 0L
      if (fs.forall(_.pv.contains(f.name))) {
        // partition-valued sum: every row of a file shares the
        // directory value, so sum = value × visible rows — exact
        // even under DVs (a deleted row carried the same value)
        fs.foreach { fm =>
          val d = fm.pv(f.name)
          if (d != TableStats.HiveDefaultPart && fm.visible > 0L) {
            val v = dirValue(d, f.dataType) match {
              case n: java.lang.Number =>
                new java.math.BigDecimal(n.toString)
              case _ => refuse()
            }
            total = total.add(
              v.multiply(java.math.BigDecimal.valueOf(fm.visible)))
            nonNull += fm.visible
          }
        }
      } else {
        // #stats sum path: raw-row sums are only the visible sum
        // when nothing is deleted
        if (fs.exists(_.marks != 0L)) refuse()
        fs.foreach { fm =>
          val cs = fm.stats.getOrElse(f.name, refuse())
          if (cs.nNulls < cs.nRows) {
            val enc = cs.sum.getOrElse(refuse())
            total = total.add(
              try new java.math.BigDecimal(enc)
              catch { case _: NumberFormatException => refuse() })
            nonNull += cs.nRows - cs.nNulls
          }
        }
      }
      if (nonNull == 0L) null
      else sumResultType(f.dataType) match {
        case LongType =>
          // an exact total outside long range would diverge from the
          // scan's (wrapping) arithmetic — refuse, let the scan answer
          try total.longValueExact()
          catch { case _: ArithmeticException => refuse() }
        case d: DecimalType =>
          try total.setScale(d.scale)
          catch { case _: ArithmeticException => refuse() }
        case _ => refuse()
      }
    case MinMaxSpec(f, isMin) =>
      if (fs.forall(_.pv.contains(f.name))) {
        // partition-valued extremum: files with zero VISIBLE rows
        // contribute nothing (their value no longer exists in the
        // table), null-partition files contribute nothing
        val vals = fs.flatMap { fm =>
          if (fm.visible == 0L) None
          else Option(dirValue(fm.pv(f.name), f.dataType))
        }
        if (vals.isEmpty) null
        else vals.reduce((a, b) =>
          if ((cmpExternal(a, b) <= 0) == isMin) a else b)
      } else {
        // data-column extremum from #stats bounds: raw-row bounds are
        // only the visible extremum when nothing is deleted
        if (fs.exists(_.marks != 0L)) refuse()
        val bounds = fs.flatMap { fm =>
          val cs = fm.stats.getOrElse(f.name, refuse())
          val b = if (isMin) cs.min else cs.max
          b match {
            case Some(enc) => Some((cs.typ, enc))
            case None =>
              // undefined bound on an all-null file is a non-entry;
              // on a file WITH non-null rows it is the NaN/Inf trade
              if (cs.nNulls == cs.nRows) None else refuse()
          }
        }
        if (bounds.isEmpty) null
        else {
          val typ = bounds.head._1
          if (bounds.exists(_._1 != typ)) refuse()
          val enc = bounds.map(_._2).reduce((a, b) =>
            if ((TableStats.cmpEnc(typ, a, b) <= 0) == isMin) a else b)
          decodeBound(typ, enc, f.dataType)
        }
      }
  }
}
