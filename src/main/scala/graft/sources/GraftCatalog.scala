package graft.sources

import java.util

import graft.operators.{CommitLog, SchemaEvolve}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier,
  NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange,
  TableInfo}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A [[TableCatalog]] over [[CommitLog]]-managed sinks — the SQL
  * consumption tier Delta/Iceberg ship: register once
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  * }}}
  *
  * and `CREATE TABLE graft.db.t (...) USING graft [PARTITIONED BY
  * (p)]`, `INSERT INTO graft.db.t`, `SELECT ... FROM graft.db.t`,
  * `saveAsTable`, `spark.table`, CTAS, and `FOR VERSION/TIMESTAMP AS
  * OF` time travel all resolve — the same [[GraftTable]] the
  * path-based format surface plans, so a catalog read is hash-equal
  * to `spark.read.format("graft").load(path)` by construction.
  *
  * Identity mapping, no metastore: a namespace IS a warehouse
  * subdirectory, a table IS a logged sink at
  * `<warehouse>/<db>/<table>` (or its `LOCATION` override). CREATE
  * commits generation 0 carrying the declared schema and partition
  * layout as `#meta` records — authoritative only while the table is
  * empty; once data lands, the files' mapped schema and committed
  * hive layout are the source of truth, so the records never go
  * stale. `ALTER TABLE` delegates to [[SchemaEvolve]]: RENAME/DROP
  * COLUMN and type widening are metadata-only commits; everything
  * else refuses loudly rather than half-supporting it.
  *
  * The reference exposes its tables through the warehouse catalog
  * (`dags/idh_etl.py:247-256` — BigQuery dataset.table names); this
  * is the same role for a file-native engine. */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  private def fs: FileSystem = warehouse.getFileSystem(
    SparkSession.active.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = new Path(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name" +
          ".warehouse")))
  }

  override def name(): String = catalogName

  private def nsPath(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)(new Path(_, _))

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), ident.name)

  private def isTable(p: Path): Boolean =
    CommitLog.generations(fs, p).nonEmpty

  // ---- ProcedureCatalog ----

  /** `CALL <cat>.system.<proc>('db.t', ...)` — the SQL maintenance
    * tier ([[GraftProcedures]], Iceberg's stored-procedure pattern).
    * The `table` argument resolves through the SAME identity mapping
    * as table identifiers; unknown namespaces/procedures refuse
    * loudly with what IS available. */
  private lazy val procedures = GraftProcedures.registry { table =>
    val parts = table.split('.').toSeq.map(_.trim).filter(_.nonEmpty)
    require(parts.nonEmpty,
      s"graft catalog: procedure table argument '$table' is empty — " +
        "pass 'db.table' (the identifier, not a path)")
    val ident = Identifier.of(parts.init.toArray, parts.last)
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    p
  }

  override def loadProcedure(ident: Identifier)
  : org.apache.spark.sql.connector.catalog.procedures
    .UnboundProcedure = {
    require(ident.namespace.toSeq == Seq(GraftProcedures.Namespace),
      s"graft catalog: procedures live under the " +
        s"'${GraftProcedures.Namespace}' namespace — " +
        s"CALL $catalogName.${GraftProcedures.Namespace}.<name>(...)" +
        s", got namespace ${ident.namespace.mkString(".")}")
    procedures.getOrElse(ident.name,
      throw new UnsupportedOperationException(
        s"graft catalog: unknown procedure '${ident.name}' — " +
          s"available: ${procedures.keys.toSeq.sorted
            .mkString(", ")}"))
  }

  override def listProcedures(namespace: Array[String])
  : Array[Identifier] =
    if (namespace.toSeq == Seq(GraftProcedures.Namespace))
      procedures.keys.toArray.sorted.map(n =>
        Identifier.of(namespace, n))
    else Array.empty

  // ---- TableCatalog ----

  override def listTables(namespace: Array[String])
  : Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(isTable)
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def loadTable(ident: Identifier): Table =
    loadWith(ident, Map.empty)

  /** `FOR VERSION AS OF` — the catalog face of `versionAsOf`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    // validate here so a bad literal surfaces as a catalog error
    // naming the table, not a bare NumberFormatException from deep
    // inside state resolution
    require(version != null && version.nonEmpty &&
      version.forall(_.isDigit),
      s"graft catalog: VERSION AS OF '$version' on $ident is not a " +
        "generation number — versions are the non-negative integers " +
        "DESCRIBE HISTORY lists")
    loadWith(ident, Map("versionAsOf" -> version))
  }

  /** `FOR TIMESTAMP AS OF` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadWith(ident, Map("timestampAsOf" -> (timestamp / 1000L).toString))

  private def loadWith(ident: Identifier,
                       extra: Map[String, String]): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) {
      // Iceberg-style METADATA TABLE identifiers: `cat.db.t.history`,
      // `cat.db.t.files`, `cat.db.t.changes` — the suffix selects the
      // metadata surface of the PARENT table (a genuine table of that
      // name always wins: this branch only runs when `p` is no table)
      val kind = ident.name.toLowerCase(java.util.Locale.ROOT)
      if (ident.namespace.nonEmpty &&
        Seq("history", "files", "changes").contains(kind)) {
        val parent = new Path(nsPath(ident.namespace.init),
          ident.namespace.last)
        if (isTable(parent)) {
          val base = extra + ("path" -> parent.toString)
          def opts(m: Map[String, String]) =
            new CaseInsensitiveStringMap(
              scala.jdk.CollectionConverters.MapHasAsJava(m).asJava)
          return kind match {
            case "changes" =>
              // the table's full RETAINED changelog: base snapshot =
              // first retained generation, end = latest (narrower
              // windows: the format surface's startingVersion/
              // endingVersion options, or CommitLog.changesBetween)
              val first = CommitLog.generations(fs, parent).head
              val m = base + ("readChangeFeed" -> "true",
                "startingVersion" -> first.toString)
              new GraftCdfTable(GraftState.resolve(opts(m)), opts(m))
            case k =>
              new GraftMetaTable(GraftState.resolve(opts(base)), k)
          }
        }
      }
      throw new NoSuchTableException(ident)
    }
    val opts = new CaseInsensitiveStringMap(
      scala.jdk.CollectionConverters.MapHasAsJava(
        extra + ("path" -> p.toString)).asJava)
    new GraftTable(GraftState.resolve(opts))
  }

  override def createTable(ident: Identifier,
                           info: TableInfo): Table = {
    // identity mapping is the catalog's whole resolution scheme — a
    // LOCATION override would commit a log this catalog could never
    // find again (loadTable/alterTable/dropTable all derive the path
    // from the identifier), so refuse instead of stranding a table
    Option(info.properties.get(TableCatalog.PROP_LOCATION)).foreach {
      loc =>
        require(new Path(loc) == tablePath(ident),
          s"graft catalog: LOCATION '$loc' is not the " +
            s"warehouse-derived path ${tablePath(ident)} — external " +
            "locations are not resolvable by an identity-mapped " +
            "catalog; read the path directly with " +
            "spark.read.format(\"graft\").load(path)")
    }
    val p = tablePath(ident)
    if (isTable(p)) throw new TableAlreadyExistsException(ident)
    val partCols = info.partitions.toSeq.map { t =>
      if (t.name != "identity")
        throw new UnsupportedOperationException(
          s"graft catalog: only identity PARTITIONED BY is supported " +
            s"(got $t) — bucket/days/hours transforms are not a " +
            "hive directory layout")
      t.references.head.fieldNames.mkString(".")
    }
    val missing = partCols.filterNot(info.schema.fieldNames.contains)
    require(missing.isEmpty,
      s"graft catalog: partition column(s) ${missing.mkString(", ")} " +
        "are not in the table schema")
    val reserved = info.schema.fieldNames
      .filter(GraftRowLevel.isMetaCol)
    require(reserved.isEmpty,
      s"graft catalog: column name(s) ${reserved.mkString(", ")} " +
        "are reserved row-identity metadata columns — rename them")
    // user TBLPROPERTIES and COMMENT persist as `#meta prop.*`
    // records ([[GraftTable.properties]] surfaces them back to
    // DESCRIBE EXTENDED / SHOW TBLPROPERTIES) — never silently
    // dropped; Spark-injected bookkeeping keys (provider, owner,
    // location already validated above) are the engine's own and are
    // not user data to round-trip
    val props = GraftCatalog.userProperties(info.properties)
    fs.mkdirs(p)
    // generation 0 carries the declared schema + layout as #meta —
    // what reads and the first write resolve against while the table
    // is empty
    CommitLog.commitNext(fs, p, -1L, Nil, meta = Map(
      "schema.ddl" -> info.schema.toDDL,
      "partition.cols" -> partCols.mkString(",")) ++
      props.map { case (k, v) => s"prop.$k" -> v })
    loadTable(ident)
  }

  /** RENAME/DROP COLUMN and widening ALTER COLUMN TYPE delegate to
    * [[SchemaEvolve]]; SET/UNSET TBLPROPERTIES and COMMENT land as
    * `#meta prop.*` records; every other change refuses loudly. A
    * multi-change ALTER is ATOMIC on both paths: a still-EMPTY table
    * (CREATE'd, nothing inserted) rewrites its declared `#meta`
    * schema in one commit — under the SAME widen-only type rule the
    * non-empty path enforces, so a narrowing ALTER can never plant a
    * declared schema the first INSERT would cast into — and a
    * non-empty table batches the whole change list into one
    * [[SchemaEvolve.applyChanges]] commit (a failing change leaves
    * the schema untouched). */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val spark = SparkSession.active
    val (gen, live) = CommitLog.ensureLoggedAt(fs, p)
    def single(c: TableChange.ColumnChange): String = {
      require(c.fieldNames.length == 1,
        "graft catalog: nested columns are not supported")
      c.fieldNames.head
    }
    // property changes are table-level #meta records on both paths
    val propMeta: Map[String, String] = changes.collect {
      case c: TableChange.SetProperty =>
        require(c.property != TableCatalog.PROP_LOCATION,
          "graft catalog: LOCATION cannot be altered — the catalog " +
            "is identity-mapped")
        s"prop.${c.property}" -> c.value
      case c: TableChange.RemoveProperty =>
        s"prop.${c.property}" -> "" // #meta tombstone
    }.toMap
    val colChanges = changes.filterNot(c =>
      c.isInstanceOf[TableChange.SetProperty] ||
        c.isInstanceOf[TableChange.RemoveProperty])
    if (live.isEmpty) {
      val meta = CommitLog.metaRecords(fs, p)
      val ddl = meta.getOrElse("schema.ddl",
        throw new UnsupportedOperationException(
          s"graft catalog: $ident is empty and has no declared " +
            "schema to alter"))
      var schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      var partCols = meta.get("partition.cols")
        .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil)
      def one(name: String)
             (f: org.apache.spark.sql.types.StructField =>
               Option[org.apache.spark.sql.types.StructField]): Unit = {
        require(schema.fieldNames.contains(name),
          s"graft catalog: no column `$name` in $ident")
        schema = org.apache.spark.sql.types.StructType(
          schema.flatMap(fld => if (fld.name == name) f(fld)
          else Some(fld)))
      }
      colChanges.foreach {
        case c: TableChange.RenameColumn =>
          val from = single(c)
          one(from)(fld => Some(fld.copy(name = c.newName)))
          partCols = partCols.map(pc => if (pc == from) c.newName
          else pc)
        case c: TableChange.DeleteColumn =>
          require(!partCols.contains(c.fieldNames.head),
            s"graft catalog: cannot drop partition column " +
              s"${c.fieldNames.head}")
          one(single(c))(_ => None)
        case c: TableChange.UpdateColumnType =>
          // same widen-only legality as the non-empty path: the
          // declared schema is what the first INSERT will be held to
          val name = single(c)
          one(name) { fld =>
            SchemaEvolve.requireWidening(name,
              fld.dataType.catalogString, c.newDataType.catalogString)
            Some(fld.copy(dataType = c.newDataType))
          }
        case other => throw new UnsupportedOperationException(
          s"graft catalog: unsupported ALTER TABLE change $other")
      }
      CommitLog.commitNext(fs, p, gen, Nil, meta = Map(
        "schema.ddl" -> schema.toDDL,
        "partition.cols" -> partCols.mkString(",")) ++ propMeta)
      return loadTable(ident)
    }
    val evolveChanges = colChanges.map {
      case c: TableChange.RenameColumn =>
        SchemaEvolve.Change.Rename(single(c), c.newName)
      case c: TableChange.DeleteColumn =>
        SchemaEvolve.Change.Drop(single(c))
      case c: TableChange.UpdateColumnType =>
        SchemaEvolve.Change.Widen(single(c),
          c.newDataType.sql.toLowerCase(java.util.Locale.ROOT))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — " +
          "use the SchemaEvolve/CommitLog operator APIs for " +
          "constraints")
    }
    if (evolveChanges.nonEmpty)
      SchemaEvolve.applyChanges(spark, p.toString, evolveChanges,
        meta = propMeta)
    else if (propMeta.nonEmpty)
      CommitLog.commitNext(fs, p, gen, live, meta = propMeta)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!isTable(p)) return false
    fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val to = tablePath(newIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(to.getParent)
    if (!fs.rename(from, to))
      throw new java.io.IOException(
        s"graft catalog: could not rename $from to $to")
  }

  // ---- SupportsNamespaces (a namespace IS a directory) ----

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(warehouse)) Array.empty
    else fs.listStatus(warehouse).filter(_.isDirectory)
      .filterNot(s => isTable(s.getPath))
      .map(s => Array(s.getPath.getName))

  override def listNamespaces(namespace: Array[String])
  : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(catalogName +: namespace)

  /** A TABLE directory is never a namespace: without this exclusion
    * `DROP NAMESPACE cat.db.sometable CASCADE` would resolve the
    * table's path as a namespace and delete the table through the
    * wrong verb. */
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsPath(namespace)) && !isTable(nsPath(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String])
  : util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(catalogName +: namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String])
  : Unit = {
    // the standard catalog contract: re-creating an existing
    // namespace throws (CREATE NAMESPACE IF NOT EXISTS is handled a
    // level up by Spark, which checks namespaceExists first)
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(catalogName +: namespace)
    require(!fs.exists(nsPath(namespace)),
      s"graft catalog: ${namespace.mkString(".")} is an existing " +
        "TABLE path — a table cannot be shadowed by a namespace")
    fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces are plain directories — no metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"graft catalog: namespace ${namespace.mkString(".")} is " +
          "not empty (use CASCADE)")
    fs.delete(p, true)
  }
}

object GraftCatalog {

  /** Spark-injected bookkeeping keys a CREATE TABLE carries that are
    * not user data to round-trip (location is validated separately,
    * provider/owner/external describe the engine itself). */
  private val ReservedProps: Set[String] = Set(
    TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
    TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
    TableCatalog.PROP_IS_MANAGED_LOCATION)

  /** The user-supplied subset of a CREATE TABLE's properties —
    * TBLPROPERTIES and COMMENT — which persist as `#meta prop.*`
    * records rather than vanishing. */
  private[sources] def userProperties(
      props: util.Map[String, String]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    props.asScala.toMap.filterNot { case (k, _) =>
      ReservedProps.contains(k) ||
        k.startsWith(TableCatalog.OPTION_PREFIX)
    }
  }
}
