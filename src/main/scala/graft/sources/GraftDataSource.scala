package graft.sources

import java.util

import graft.operators.{CommitLog, TableStats}
import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  Filter, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft")` — the DataSource V2 READ surface over
  * [[CommitLog]]-managed sinks, so ordinary SQL/DataFrame consumers
  * get the whole table-format tier WITHOUT knowing the operator
  * vocabulary (the role Delta's/Iceberg's DataSource plays):
  *
  *   - the latest manifest (or `option("versionAsOf", gen)` for time
  *     travel) is pinned at load — genuine snapshot isolation, a
  *     concurrent rewrite cannot change the rows mid-query;
  *   - deletion vectors are anti-joined away, column-mapping epochs
  *     and widening casts resolve ([[CommitLog.mappedScan]]) — a
  *     renamed/dropped/widened sink reads under its LOGICAL schema;
  *   - filter pushdown ([[SupportsPushDownFilters]]) feeds the
  *     manifest's `#stats` bounds: files provably irrelevant to the
  *     pushed conjunction are DROPPED BEFORE the scan is planned
  *     ([[TableStats.pruneIn]] — a manifest-only decision, zero data
  *     I/O), and every filter is ALSO re-applied above the scan, so
  *     pruning is pure I/O elision, never a semantics change;
  *   - column pruning ([[SupportsPushDownRequiredColumns]]) narrows
  *     the relation to exactly the projected columns, which the
  *     underlying parquet scans then prune to
  *     (`ReadSchema`/`PushedFilters` on the inner scan come free from
  *     Catalyst once the plan is declarative).
  *
  * Execution delegates through [[V1Scan]] to a [[GraftRelation]]
  * whose `buildScan` plans the SAME DataFrame the operator API
  * ([[CommitLog.read]]) would — one code path, two surfaces, so the
  * format read is hash-identical to the operator read by
  * construction. The physical plan shows a `RowDataSourceScanExec`
  * carrying this relation; PlanAuditSpec pins its pushed filters and
  * kept/skipped file counts.
  *
  * Registered via the standard `DataSourceRegister` service file, so
  * the bare short name `graft` resolves. The reference exposes its
  * tables to consumers through the warehouse's plain SQL surface
  * (`dags/idh_etl.py:247-256` BigQuery tables); a file-native engine
  * needs the connector to make its commit protocol just as
  * transparent. */
final class GraftDataSource extends TableProvider
  with DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap)
  : StructType = GraftState.resolve(options).schema

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftTable(
      GraftState.resolve(new CaseInsensitiveStringMap(properties)))
}

/** A pinned snapshot of one logged sink: generation, live files and
  * every manifest record family, plus the resolved LOGICAL schema —
  * everything a scan needs, read once at load. */
private[sources] final class GraftState(
    val path: String,
    val gen: Long,
    val manifest: CommitLog.Manifest,
    val schema: StructType) extends Serializable

private[sources] object GraftState {

  def resolve(options: CaseInsensitiveStringMap): GraftState = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft: a single path is required — " +
          "spark.read.format(\"graft\").load(<sink>)"))
    val spark = SparkSession.active
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = CommitLog.generations(fs, hPath)
    require(gens.nonEmpty,
      s"graft: $path is not a CommitLog-managed sink (no manifest); " +
        "bring it under log control (CommitLog.ensureLogged) or read " +
        "it as plain parquet")
    val gen = Option(options.get("versionAsOf")).map(_.toLong)
      .getOrElse(gens.last)
    require(gens.contains(gen),
      s"graft: generation $gen is not committed (or expired) at " +
        s"$path — retained: ${gens.head}..${gens.last}")
    val m = CommitLog.manifestAt(fs, hPath, gen)
    val schema =
      if (m.files.isEmpty) StructType(Nil)
      else CommitLog.mappedScan(spark, hPath, m.files, m.colmaps,
        coltypes = m.coltypes).schema
    new GraftState(path, gen, m, schema)
  }
}

private[sources] final class GraftTable(state: GraftState)
  extends Table with SupportsRead {

  override def name(): String = s"graft:${state.path}@${state.gen}"

  override def schema(): StructType = state.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
  : ScanBuilder = new GraftScanBuilder(state)
}

private[sources] final class GraftScanBuilder(state: GraftState)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = state.schema
  private var pushed: Array[Filter] = Array.empty

  /** ALL filters are returned as post-scan (Spark re-applies them
    * above the relation — pruning is I/O elision only); the prunable
    * subset is advertised as pushed so `explain` shows exactly what
    * the manifest decision used. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(TableStats.prunable)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftScan(state, required, pushed)
}

private[sources] final class GraftScan(state: GraftState,
                                       required: StructType,
                                       pushed: Array[Filter])
  extends V1Scan {

  /** The manifest-only pruning decision, taken at PLAN time against
    * the pinned snapshot — no data I/O happens before the (already
    * pruned) parquet scan is planned. */
  val (keptFiles, skippedFiles): (Seq[String], Seq[String]) =
    TableStats.pruneIn(state.manifest.files, state.manifest.stats,
      state.manifest.dvMarks, pushed.toIndexedSeq)

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft ${state.path} gen=${state.gen} " +
      s"files=${keptFiles.size}/${state.manifest.files.size} " +
      s"skipped=${skippedFiles.size} " +
      s"pushed=[${pushed.mkString(", ")}]"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftRelation(context, state, required, keptFiles,
      skippedFiles.size).asInstanceOf[T]
}

/** Public face of a planned graft scan, for plan audits: consumers
  * pattern-match the physical plan's `RowDataSourceScanExec.relation`
  * against this to pin the manifest pruning decision (kept/skipped
  * file counts, pinned generation) without access to the private
  * relation class. */
trait GraftScanInfo {
  def keptCount: Int
  def skippedCount: Int
  def pinnedGen: Long
}

/** The V1 execution bridge: `buildScan` plans the SAME
  * DV-applied/mapped/pruned DataFrame the operator API builds and
  * hands Spark its row RDD — `RowDataSourceScanExec` over this
  * relation is what the physical plan shows, with the inner parquet
  * scans (file-pruned, column-pruned) below it. */
private[sources] final class GraftRelation(
    ctx: SQLContext,
    state: GraftState,
    override val schema: StructType,
    val keptFiles: Seq[String],
    val skippedCount: Int) extends BaseRelation with TableScan
  with GraftScanInfo {

  override def sqlContext: SQLContext = ctx

  def keptCount: Int = keptFiles.size

  def pinnedGen: Long = state.gen

  override def toString: String =
    s"GraftRelation(${state.path}@${state.gen}, " +
      s"kept=$keptCount, skipped=$skippedCount)"

  override def buildScan(): RDD[Row] = {
    val spark = ctx.sparkSession
    if (keptFiles.isEmpty) return spark.sparkContext.emptyRDD[Row]
    val hPath = new Path(state.path)
    val keepSet = keptFiles.toSet
    val df = CommitLog.mappedScan(spark, hPath, keptFiles,
      state.manifest.colmaps,
      state.manifest.dvs.filter { case (f, _) => keepSet(f) },
      coltypes = state.manifest.coltypes)
    df.select(schema.fieldNames.toIndexedSeq.map(col): _*).rdd
  }
}
