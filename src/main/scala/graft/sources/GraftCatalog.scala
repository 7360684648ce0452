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
final class GraftCatalog extends TableCatalog with SupportsNamespaces {

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
  override def loadTable(ident: Identifier, version: String): Table =
    loadWith(ident, Map("versionAsOf" -> version))

  /** `FOR TIMESTAMP AS OF` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadWith(ident, Map("timestampAsOf" -> (timestamp / 1000L).toString))

  private def loadWith(ident: Identifier,
                       extra: Map[String, String]): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
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
    fs.mkdirs(p)
    // generation 0 carries the declared schema + layout as #meta —
    // what reads and the first write resolve against while the table
    // is empty
    CommitLog.commitNext(fs, p, -1L, Nil, meta = Map(
      "schema.ddl" -> info.schema.toDDL,
      "partition.cols" -> partCols.mkString(",")))
    loadTable(ident)
  }

  /** RENAME/DROP COLUMN and widening ALTER COLUMN TYPE delegate to
    * [[SchemaEvolve]]'s metadata-only commits; every other change
    * refuses loudly. A still-EMPTY table (CREATE'd, nothing
    * inserted) has no files to map — its ALTER rewrites the declared
    * `#meta` schema instead, all changes in ONE commit. On a
    * non-empty table, multiple changes apply as SEQUENTIAL commits
    * (each individually atomic; a failure mid-list leaves the
    * earlier changes committed — issue one change per ALTER if that
    * matters). */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!isTable(p)) throw new NoSuchTableException(ident)
    val spark = SparkSession.active
    val (gen, live) = CommitLog.ensureLoggedAt(fs, p)
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
      changes.foreach {
        case c: TableChange.RenameColumn =>
          val from = c.fieldNames.head
          one(from)(fld => Some(fld.copy(name = c.newName)))
          partCols = partCols.map(pc => if (pc == from) c.newName
          else pc)
        case c: TableChange.DeleteColumn =>
          require(!partCols.contains(c.fieldNames.head),
            s"graft catalog: cannot drop partition column " +
              s"${c.fieldNames.head}")
          one(c.fieldNames.head)(_ => None)
        case c: TableChange.UpdateColumnType =>
          one(c.fieldNames.head)(fld =>
            Some(fld.copy(dataType = c.newDataType)))
        case other => throw new UnsupportedOperationException(
          s"graft catalog: unsupported ALTER TABLE change $other")
      }
      CommitLog.commitNext(fs, p, gen, Nil, meta = Map(
        "schema.ddl" -> schema.toDDL,
        "partition.cols" -> partCols.mkString(",")))
      return loadTable(ident)
    }
    changes.foreach {
      case c: TableChange.RenameColumn =>
        require(c.fieldNames.length == 1,
          "graft catalog: nested columns are not supported")
        SchemaEvolve.renameColumn(spark, p.toString,
          c.fieldNames.head, c.newName)
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames.length == 1,
          "graft catalog: nested columns are not supported")
        SchemaEvolve.dropColumn(spark, p.toString, c.fieldNames.head)
      case c: TableChange.UpdateColumnType =>
        require(c.fieldNames.length == 1,
          "graft catalog: nested columns are not supported")
        SchemaEvolve.widenColumn(spark, p.toString,
          c.fieldNames.head, c.newDataType.sql.toLowerCase(
            java.util.Locale.ROOT))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — " +
          "use the SchemaEvolve/CommitLog operator APIs for " +
          "constraints and properties")
    }
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

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String])
  : util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(catalogName +: namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String])
  : Unit = fs.mkdirs(nsPath(namespace))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces are plain directories — no metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) return false
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"graft catalog: namespace ${namespace.mkString(".")} is " +
          "not empty (use CASCADE)")
    fs.delete(p, true)
  }
}
