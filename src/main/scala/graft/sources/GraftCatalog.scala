package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal [[TableCatalog]] over a warehouse directory of graft table
  * roots, so teams address tables BY NAME instead of by path — at
  * cluster scale the catalog is how tables are shared:
  *
  * {{{
  * spark.sql.catalog.graft      = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.root = /data/graft-warehouse
  *
  * CREATE TABLE graft.ns.t (id BIGINT, v DOUBLE) USING graft
  *   TBLPROPERTIES ('key' = 'id')
  * INSERT INTO graft.ns.t ...               -- V2 write -> CoW version
  * SELECT * FROM graft.ns.t                 -- latest committed state
  * SELECT * FROM graft.ns.t VERSION AS OF 3 -- time travel
  * MERGE INTO graft.ns.t ...                -- SQL DML (GraftDmlRule)
  * DROP TABLE graft.ns.t
  * }}}
  *
  * Identifier `ns...t` maps to `<root>/<ns...>/<t>` — the same versioned
  * layout [[graft.GraftTable]] owns (`base` + `v<n>` snapshots), so
  * path-based and name-based access are interchangeable. CREATE TABLE
  * commits an EMPTY base snapshot (schema + merge key in the manifest,
  * zero data files); the first insert takes the insert-into-empty merge
  * path. The catalog holds NO state of its own — the filesystem layout
  * is the catalog, so there is nothing extra to replicate or recover. */
final class GraftCatalog extends TableCatalog with ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var root: String = _

  /** FUNCTION CATALOG: serves the `bucket` transform function so Spark
    * can resolve the KeyGroupedPartitioning bucketed graft scans report
    * — the handshake storage-partitioned joins need. Path-based reads
    * carry no function catalog, which is why SPJ requires the table to
    * be catalog-addressed. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GraftBucket.BucketUnbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root=<warehouse dir>"))
  }

  override def name(): String = catalogName

  private def dirFor(ident: Identifier): String =
    (root +: (ident.namespace().toSeq :+ ident.name())).mkString("/")

  private def isTableDir(dir: String): Boolean =
    Files.isDirectory(Paths.get(dir, "base"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = (root +: namespace.toSeq).mkString("/")
    if (!Files.isDirectory(Paths.get(nsDir))) return Array.empty
    val s = Files.list(Paths.get(nsDir))
    try s.iterator().asScala
      .filter(p => isTableDir(p.toString))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident)
    if (isTableDir(dir)) return GraftSource.tableFor(Map("path" -> dir))
    // metadata table `<table>.changes` — the change-data feed as a
    // relation: `SELECT * FROM graft.ns.t.changes` (batch) and
    // `spark.readStream.table("graft.ns.t.changes")` (one micro-batch
    // per feed-persisted commit); version bounds come as read options
    // (startingVersion / endingVersion)
    if (ident.namespace().nonEmpty) {
      val parent = (root +: ident.namespace().toSeq).mkString("/")
      if (isTableDir(parent)) ident.name() match {
        case "changes" =>
          return GraftSource.tableFor(
            Map("path" -> parent, "changeFeed" -> "true"))
        // manifest-answered audit relations ([[GraftMetaTables]]):
        // `SELECT * FROM graft.ns.t.history` / `...t.files`
        case "history" =>
          return new GraftRowsTable(s"$parent#history",
            GraftMetaTables.HistorySchema,
            () => GraftMetaTables.historyRows(parent))
        case "files" =>
          return new GraftRowsTable(s"$parent#files",
            GraftMetaTables.FilesSchema,
            () => GraftMetaTables.filesRows(parent))
        case _ => ()
      }
    }
    throw new NoSuchTableException(ident)
  }

  /** SQL time travel: `SELECT ... FROM graft.ns.t VERSION AS OF <n>`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirFor(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    GraftSource.tableFor(Map("path" -> dir, "version" -> version))
  }

  /** SQL time travel by wall clock: `TIMESTAMP AS OF <ts>`. Spark hands
    * the evaluated timestamp as epoch MICROseconds; resolution is the
    * newest version whose manifest `committedAtMs` is at or before it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirFor(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    GraftSource.tableFor(Map("path" -> dir,
      "timestampAsOf" -> java.lang.Long.toString(
        Math.floorDiv(timestamp, 1000L))))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables are key-sorted, not partitioned — Z-order/sort " +
        "within the layout instead of directory partitioning")
    // 'key' = one column, or a comma-separated tuple for COMPOSITE
    // identity: the first column routes (files/zone maps), the full
    // tuple is row identity
    val keyCols = Option(properties.get("key")).map(
        _.split(',').map(_.trim).toSeq.filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        "CREATE TABLE ... USING graft requires TBLPROPERTIES ('key' = '<merge key column[, more]>')"))
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"merge key $k is not a column of ${schema.fieldNames.mkString(", ")}"))
    val dir = dirFor(ident)
    if (isTableDir(dir)) throw new TableAlreadyExistsException(ident)
    MutableParquetTable.commitEmpty(s"$dir/base", keyCols.head, schema,
      keyCols.tail)
    loadTable(ident)
  }

  /** `ALTER TABLE ... ADD COLUMN(S)` as a METADATA-ONLY commit: the next
    * version references every current data file in place with the
    * widened schema — zero data IO at any table size. Existing files
    * simply lack the new column, which the scan reads as null (the same
    * mechanics as schema evolution through merges). Other ALTERs stay
    * unsupported: dropping/renaming/retyping columns would break files
    * already written, and key columns are immutable identity. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirFor(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    val adds = changes.map {
      case a: TableChange.AddColumn => a
      case c => throw new UnsupportedOperationException(
        s"only ADD COLUMN is supported (got ${c.getClass.getSimpleName}) — " +
          "schema otherwise evolves through merges, and existing columns " +
          "cannot change without rewriting committed files")
    }
    val table = loadTable(ident)
    val schema = table.asInstanceOf[GraftBatchTable].schema
    val widened = adds.foldLeft(schema) { (s, a) =>
      require(a.fieldNames().length == 1,
        s"nested column ${a.fieldNames().mkString(".")} is not supported")
      val name = a.fieldNames().head
      require(!s.fieldNames.contains(name), s"column $name already exists")
      require(a.isNullable,
        s"new column $name must be nullable — existing rows have no value")
      s.add(org.apache.spark.sql.types.StructField(name, a.dataType(),
        nullable = true))
    }
    graft.OptimisticCommit.commitSchema(dir, widened)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!isTableDir(dir)) return false
    MutableParquetTable.deleteDir(Paths.get(dir))
    true
  }

  /** SQL `CALL <catalog>.system.<proc>(...)` — table maintenance
    * (history / vacuum / compact / zorder) from pure SQL; see
    * [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(catalogName, root, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = dirFor(oldIdent)
    if (!isTableDir(from)) throw new NoSuchTableException(oldIdent)
    val to = dirFor(newIdent)
    if (isTableDir(to)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(Paths.get(to).getParent)
    Files.move(Paths.get(from), Paths.get(to))
  }
}
