package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

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
  * Filter pushdown: key-column predicates (`=`, `IN`, ranges) prune the
  * manifest's file list BEFORE any footer or data IO — the zone-map
  * routing of the merge path (ParquetRewriter.java:263-283) applied to
  * queries. All filters are also handed to the inner parquet scan, so
  * parquet row-group stats prune a second time within the kept files. The
  * source declares every filter unhandled, so Catalyst re-applies them —
  * pruning is purely an optimization and can never change results.
  *
  * Scale: the manifest prune is a driver-side metadata operation (one row
  * per file); at 100 TB a key-range query opens the handful of files the
  * range lives in instead of listing and footer-probing the whole table.
  */
final class GraftSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path (load(path) or OPTIONS (path '...'))"))
    val snapshot = GraftSource.resolveSnapshot(path, parameters.get("version"))
    new GraftRelation(sqlContext.sparkSession, snapshot)
  }
}

object GraftSource {

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

  /** Files the most recent scan actually read, per thread — test/telemetry
    * hook for asserting manifest pruning (V1 relations expose no plan
    * metric for it). */
  private val lastScan = new ThreadLocal[Seq[String]]
  def lastScanFiles: Seq[String] = Option(lastScan.get).getOrElse(Nil)
  private[sources] def recordScan(files: Seq[String]): Unit =
    lastScan.set(files)
}

/** One committed snapshot as a Spark `BaseRelation` with column pruning
  * and best-effort key-filter file pruning. */
final class GraftRelation(spark: SparkSession, val snapshotDir: String)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext

  /** Manifest file list when committed; directory listing for a bare
    * `base` snapshot (writeSorted output has no manifest). */
  private val allFiles: Seq[String] =
    MutableParquetTable.manifestFileNames(snapshotDir)
      .map(_.map(n => s"$snapshotDir/$n"))
      .getOrElse {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(snapshotDir))
        try s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".parquet")).toList.sorted
        finally s.close()
      }

  require(allFiles.nonEmpty, s"$snapshotDir holds no parquet files")

  private val keyName: Option[String] =
    MutableParquetTable.pruneManifestFiles(snapshotDir, None, None).map(_._1)

  override val schema: StructType =
    spark.read.parquet(allFiles: _*).schema

  /** All filters are re-applied by Spark above this scan; here they only
    * drive pruning (manifest file skip + parquet row-group skip). */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val files = keyName.flatMap { k =>
      val (lo, hi) = GraftRelation.keyBounds(k, filters)
      if (lo.isEmpty && hi.isEmpty) None
      else MutableParquetTable.pruneManifestFiles(snapshotDir, lo, hi).map(_._2)
    }.getOrElse(allFiles)
    GraftSource.recordScan(files)
    if (files.isEmpty)
      return spark.sparkContext.emptyRDD[Row]
    var df: DataFrame = spark.read.schema(schema).parquet(files: _*)
    // hand every translatable filter to the inner scan so parquet
    // row-group stats prune within the kept files (redundant with the
    // re-apply above — never wrong, often faster)
    GraftRelation.toColumn(filters).foreach(c => df = df.where(c))
    df.select(requiredColumns.map(col).toSeq: _*).rdd
  }
}

private object GraftRelation {

  /** Conjunctive key bounds implied by the pushed filters: [lo, hi] such
    * that every surviving row's key lies within. Non-key / untranslatable
    * filters contribute nothing (Spark re-applies them anyway). */
  def keyBounds(key: String,
                filters: Array[Filter]): (Option[Any], Option[Any]) = {
    var lo: Option[Any] = None
    var hi: Option[Any] = None
    def tightenLo(v: Any): Unit =
      lo = Some(lo.filter(l => KeyBytes.compare(
        KeyBytes.fromAny(l), KeyBytes.fromAny(v)) >= 0).getOrElse(v))
    def tightenHi(v: Any): Unit =
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

  /** Best-effort translation of source filters back to Columns for the
    * inner parquet scan. Untranslatable filters are dropped (they are
    * re-applied by Spark above the relation). */
  def toColumn(filters: Array[Filter]): Option[Column] = {
    def tr(f: Filter): Option[Column] = f match {
      case EqualTo(a, v)            => Some(col(a) === lit(v))
      case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
      case GreaterThan(a, v)        => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v)           => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
      case In(a, vs)                => Some(col(a).isInCollection(vs.toSeq))
      case IsNull(a)                => Some(col(a).isNull)
      case IsNotNull(a)             => Some(col(a).isNotNull)
      case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
      case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
      case StringContains(a, v)     => Some(col(a).contains(v))
      case Not(c)                   => tr(c).map(!_)
      case And(l, r) =>
        (tr(l), tr(r)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (a, b)             => a.orElse(b) // partial AND stays sound
        }
      case Or(l, r) =>
        // partial OR would widen incorrectly — translate only if both do
        for (a <- tr(l); b <- tr(r)) yield a || b
      case _ => None
    }
    filters.flatMap(tr(_)).reduceOption(_ && _)
  }
}
