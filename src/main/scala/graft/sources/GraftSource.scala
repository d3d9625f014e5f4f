package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.CdcMergeSink

/** Spark SQL data source (`format("graft")`) over the engine's versioned,
  * manifest-committed table layout — the reference's key-sorted-Parquet
  * data model (/root/reference/README.md:11-21) exposed as a first-class
  * Spark relation:
  *
  * {{{
  * spark.read.format("graft").load(root)                       // latest
  * spark.read.format("graft").option("version", 2).load(root)  // time travel
  * sql("CREATE TEMPORARY VIEW t USING graft OPTIONS (path '...')")
  * }}}
  *
  * `path` may be a [[graft.GraftTable]] / [[CdcMergeSink]] root (`base` +
  * `v<id>` snapshots) or a single manifest-committed snapshot directory.
  * Reads are strictly manifest-trusted: only committed files are scanned,
  * so stray part files from crashed writers are invisible (the
  * object-store read discipline of [[MutableParquetTable.readCommitted]]).
  *
  * DataSource V2: the scan this source builds IS Spark's own parquet
  * batch scan (`ParquetScan`) over the manifest's pruned file list, so
  * reads get vectorized columnar batches and whole-stage codegen — no
  * row-at-a-time InternalRow↔Row boundary (the V1 `PrunedFilteredScan`
  * this replaced ended in `.rdd`, which de-columnarized every row).
  * Relation setup reads the schema straight from the manifest (one
  * driver-side JSON read, zero footer probes); only manifest-less `base`
  * snapshots fall back to a single-file footer probe.
  *
  * Filter pushdown, two levels, both advisory (every filter is also
  * returned as residual, so Catalyst re-applies it and pruning can never
  * change results):
  *  - key-column predicates (`=`, `IN`, ranges) prune the manifest's file
  *    list BEFORE any footer or data IO — the zone-map routing of the
  *    merge path (ParquetRewriter.java:263-283) applied to queries;
  *  - all pushed filters are handed to the parquet scan for row-group
  *    stats pruning within the kept files.
  *
  * Scale: the manifest prune is a driver-side metadata operation (one row
  * per file); at 100 TB a key-range query opens the handful of files the
  * range lives in instead of listing and footer-probing the whole table.
  */
final class GraftSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSource.tableFor(options.asScala.toMap).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    GraftSource.tableFor(properties.asScala.toMap)
}

object GraftSource {

  private[sources] def tableFor(parameters: Map[String, String]): GraftBatchTable = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path (load(path) or OPTIONS (path '...'))"))
    val snapshot = resolveSnapshot(path, parameters.get("version"))
    new GraftBatchTable(SparkSession.active, snapshot)
  }

  /** Resolve `path` (+ optional version) to one snapshot directory.
    * Table roots resolve through the committed-version chain with
    * [[CdcMergeSink.readAsOf]] semantics; bare directories must be the
    * snapshot themselves. */
  private[sources] def resolveSnapshot(path: String,
                                       version: Option[String]): String = {
    val isRoot = java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(path, "base"))
    (isRoot, version) match {
      case (true, Some(v)) =>
        CdcMergeSink.versions(path).takeWhile(_ <= v.toLong).lastOption
          .map(x => s"$path/v$x").getOrElse(s"$path/base")
      case (true, None)  => CdcMergeSink.latestSnapshot(path)
      case (false, Some(v)) => throw new IllegalArgumentException(
        s"version=$v given but $path is not a graft table root (no base/)")
      case (false, None) => path
    }
  }

  /** Files the most recent scan actually planned, per thread — test/
    * telemetry hook for asserting manifest pruning. */
  private val lastScan = new ThreadLocal[Seq[String]]
  def lastScanFiles: Seq[String] = Option(lastScan.get).getOrElse(Nil)
  private[sources] def recordScan(files: Seq[String]): Unit =
    lastScan.set(files)
}

/** One committed snapshot as a V2 [[Table]]. */
final class GraftBatchTable(spark: SparkSession, val snapshotDir: String)
    extends Table with SupportsRead {

  /** Manifest file list when committed; directory listing for a bare
    * `base` snapshot (writeSorted output has no manifest). */
  private[sources] val allFiles: Seq[String] =
    MutableParquetTable.manifestFileNames(snapshotDir)
      .map(_.map(n => s"$snapshotDir/$n"))
      .getOrElse {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(snapshotDir))
        try s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".parquet")).toList.sorted
        finally s.close()
      }

  require(allFiles.nonEmpty, s"$snapshotDir holds no parquet files")

  private[sources] val keyName: Option[String] =
    MutableParquetTable.pruneManifestFiles(snapshotDir, None, None).map(_._1)

  override def name(): String = s"graft:$snapshotDir"

  /** Manifest-embedded schema when present (zero IO beyond the manifest
    * itself); single-file footer probe otherwise — never a probe of the
    * whole file list. */
  override val schema: StructType =
    MutableParquetTable.manifestSchema(snapshotDir)
      .getOrElse(spark.read.parquet(allFiles.head).schema)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, this)
}

/** Scan builder: collects pushed filters + required columns, then builds
  * Spark's own `ParquetScan` over the manifest-pruned file list. */
final class GraftScanBuilder(spark: SparkSession, table: GraftBatchTable)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = table.schema
  private var filters: Array[Filter] = Array.empty

  /** Every filter is both recorded (for pruning) and returned as residual
    * (Catalyst re-applies it above the scan), so pruning stays purely an
    * optimization. */
  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs
  }

  override def pushedFilters(): Array[Filter] = filters

  override def pruneColumns(s: StructType): Unit = required = s

  private var pushedCountRows: Option[Long] = None

  /** Unfiltered, ungrouped `COUNT(*)` is answered from the manifest's row
    * inventory — one driver-side JSON read, ZERO data IO (the metadata
    * count a table format owes its users). Declined whenever a filter is
    * pushed, a group-by exists, any aggregate is not COUNT(*), or the
    * manifest's count is partial (stat-less files) — then the ordinary
    * scan runs and Spark aggregates it. */
  private def countStarAnswer(agg: Aggregation): Option[Long] =
    if (filters.isEmpty && agg.groupByExpressions.isEmpty &&
        agg.aggregateExpressions.nonEmpty &&
        agg.aggregateExpressions.forall(_.isInstanceOf[CountStar]))
      MutableParquetTable.manifestExactRowCount(table.snapshotDir)
    else None

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    countStarAnswer(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    countStarAnswer(agg) match {
      case Some(n) =>
        pushedCountRows = Some(n)
        required = StructType(agg.aggregateExpressions.zipWithIndex.map {
          case (_, i) => StructField(s"count_$i", LongType, nullable = false)
        })
        true
      case None => false
    }

  override def build(): Scan = pushedCountRows match {
    case Some(n) =>
      GraftSource.recordScan(Nil) // metadata-only: no file is planned
      new GraftCountScan(n, required)
    case None =>
      val files = table.keyName.flatMap { k =>
        val (lo, hi) = GraftScanBuilder.keyBounds(k, filters)
        if (lo.isEmpty && hi.isEmpty) None
        else MutableParquetTable.pruneManifestFiles(table.snapshotDir, lo, hi).map(_._2)
      }.getOrElse(table.allFiles)
      GraftSource.recordScan(files)
      val index = new InMemoryFileIndex(spark, files.map(new Path(_)),
        Map.empty[String, String], Some(table.schema),
        FileStatusCache.getOrCreate(spark), None, None)
      ParquetScan(spark, spark.sessionState.newHadoopConf(), index,
        dataSchema = table.schema, readDataSchema = required,
        readPartitionSchema = new StructType(), pushedFilters = filters,
        options = CaseInsensitiveStringMap.empty())
  }
}

/** Completely-pushed COUNT(*): one partition emitting one row whose every
  * column is the manifest row count. */
final class GraftCountScan(rows: Long, schema: StructType)
    extends Scan with Batch with Serializable {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftCountScan(rows=$rows)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftCountPartition(rows, schema.size))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCountReaderFactory
}

final case class GraftCountPartition(rows: Long, nCols: Int)
    extends InputPartition

final class GraftCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftCountPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(Array.fill[Any](gp.nCols)(gp.rows))
      override def close(): Unit = ()
    }
  }
}

private object GraftScanBuilder {

  /** Conjunctive key bounds implied by the pushed filters: [lo, hi] such
    * that every surviving row's key lies within. Non-key / untranslatable
    * filters contribute nothing (Spark re-applies them anyway). Null
    * comparison values are skipped defensively — Catalyst folds such
    * predicates away, but `KeyBytes.fromAny(null)` would throw at
    * planning time if one ever arrived. */
  def keyBounds(key: String,
                filters: Array[Filter]): (Option[Any], Option[Any]) = {
    var lo: Option[Any] = None
    var hi: Option[Any] = None
    def tightenLo(v: Any): Unit = if (v != null)
      lo = Some(lo.filter(l => KeyBytes.compare(
        KeyBytes.fromAny(l), KeyBytes.fromAny(v)) >= 0).getOrElse(v))
    def tightenHi(v: Any): Unit = if (v != null)
      hi = Some(hi.filter(h => KeyBytes.compare(
        KeyBytes.fromAny(h), KeyBytes.fromAny(v)) <= 0).getOrElse(v))
    def walk(f: Filter): Unit = f match {
      case EqualTo(`key`, v)            => tightenLo(v); tightenHi(v)
      case GreaterThan(`key`, v)        => tightenLo(v)
      case GreaterThanOrEqual(`key`, v) => tightenLo(v)
      case LessThan(`key`, v)           => tightenHi(v)
      case LessThanOrEqual(`key`, v)    => tightenHi(v)
      case In(`key`, vs) if vs.nonEmpty && !vs.contains(null) =>
        val sorted = vs.sortWith((a, b) =>
          KeyBytes.compare(KeyBytes.fromAny(a), KeyBytes.fromAny(b)) < 0)
        tightenLo(sorted.head); tightenHi(sorted.last)
      case And(l, r) => walk(l); walk(r)
      case _ => ()
    }
    filters.foreach(walk)
    (lo, hi)
  }
}
