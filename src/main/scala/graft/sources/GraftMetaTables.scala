package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.CdcMergeSink

/** METADATA TABLES of a graft table, by catalog name — the table's own
  * bookkeeping as queryable SQL relations, all answered from manifests
  * (zero data-file IO, one driver-side pass however large the table):
  *
  * {{{
  * SELECT * FROM graft.ns.t.history  -- one row per committed version
  * SELECT * FROM graft.ns.t.files    -- latest snapshot's file inventory
  * }}}
  *
  * `history`: version id, commit wall clock, file/row totals, the
  * streaming sink's txn marker (writer id + epoch) and the feed flag —
  * the audit trail `CALL system.history` prints, but composable
  * (joinable, filterable) as a relation.
  *
  * `files`: the latest snapshot's manifest inventory — resolved path
  * (reference passthrough shows the REAL location in a prior version's
  * dir), row count, typed key range rendered as strings, physical size.
  * What an operator reads before trusting a compaction or debugging a
  * routing decision. */
object GraftMetaTables {

  val HistorySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at_ms", LongType),
    StructField("file_count", LongType),
    StructField("total_rows", LongType),
    StructField("txn_app", StringType),
    StructField("txn_epoch", LongType),
    StructField("feed", BooleanType, nullable = false),
    // merge-on-read deletion tombstones this version carries (0 = none);
    // total_rows stays the PHYSICAL inventory — logical rows = total_rows
    // minus the tombstoned keys still physically present
    StructField("tombstones", LongType, nullable = false)))

  val FilesSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("row_count", LongType),
    StructField("min_key", StringType),
    StructField("max_key", StringType),
    StructField("size_bytes", LongType)))

  private def manifestLong(m: String, field: String): Any =
    s""""$field":(\\d+)""".r.findFirstMatchIn(m)
      .map(_.group(1).toLong).orNull

  def historyRows(root: String): Seq[Array[Any]] =
    CdcMergeSink.versions(root).map { v =>
      val dir = s"$root/v$v"
      val m = MutableParquetTable.readManifest(dir).getOrElse("")
      val txn = MutableParquetTable.manifestTxn(dir)
      Array[Any](v,
        manifestLong(m, "committedAtMs"),
        manifestLong(m, "fileCount"),
        manifestLong(m, "totalRows"),
        txn.map(t => UTF8String.fromString(t._1)).orNull,
        txn.map(t => java.lang.Long.valueOf(t._2)).orNull,
        MutableParquetTable.manifestFeedPending(dir),
        MutableParquetTable.manifestTombstoneRows(dir))
    }

  /** One-row table summary (`SELECT * FROM cat.ns.t.detail` — the
    * DESCRIBE DETAIL analog): location, identity, layout, inventory and
    * retention facts, all from the latest manifest + version listing. */
  val DetailSchema: StructType = StructType(Seq(
    StructField("location", StringType, nullable = false),
    StructField("key", StringType),
    StructField("more_keys", StringType),
    StructField("buckets", IntegerType),
    StructField("num_versions", LongType, nullable = false),
    StructField("latest_version", LongType),
    StructField("file_count", LongType),
    StructField("total_rows", LongType),
    StructField("tombstones", LongType, nullable = false),
    StructField("size_bytes", LongType),
    StructField("committed_at_ms", LongType)))

  def detailRows(root: String): Seq[Array[Any]] = {
    val versions = CdcMergeSink.versions(root)
    val latest = CdcMergeSink.latestSnapshot(root)
    val m = MutableParquetTable.readManifest(latest).getOrElse("")
    val key = MutableParquetTable.pruneManifestFiles(latest, None, None)
      .map(_._1)
    val moreKeys = MutableParquetTable.manifestMoreKeys(latest)
    val sizeBytes = MutableParquetTable.manifestFileNames(latest)
      .map(_.map { e =>
        val p = java.nio.file.Paths.get(
          MutableParquetTable.resolvePath(latest, e))
        if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p) else 0L
      }.sum).map(java.lang.Long.valueOf).orNull
    Seq(Array[Any](
      UTF8String.fromString(root),
      key.map(UTF8String.fromString).orNull,
      if (moreKeys.isEmpty) null
      else UTF8String.fromString(moreKeys.mkString(",")),
      MutableParquetTable.manifestBuckets(latest)
        .map(java.lang.Integer.valueOf).orNull,
      java.lang.Long.valueOf(versions.size.toLong + 1L), // + base
      versions.lastOption.map(java.lang.Long.valueOf).orNull,
      manifestLong(m, "fileCount"),
      manifestLong(m, "totalRows"),
      MutableParquetTable.manifestTombstoneRows(latest),
      sizeBytes,
      manifestLong(m, "committedAtMs")))
  }

  def filesRows(root: String): Seq[Array[Any]] = {
    val latest = CdcMergeSink.latestSnapshot(root)
    MutableParquetTable.manifestRangesAnyKey(latest).getOrElse(Nil).map { r =>
      val p = java.nio.file.Paths.get(r.file)
      Array[Any](UTF8String.fromString(r.file), r.rowCount,
        UTF8String.fromString(String.valueOf(r.min)),
        UTF8String.fromString(String.valueOf(r.max)),
        if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p)
        else null)
    }
  }
}

/** A read-only relation of driver-computed rows; the rows are computed
  * at scan-build time so every query sees the table's CURRENT state. */
final class GraftRowsTable(relName: String, override val schema: StructType,
                           rows: () => Seq[Array[Any]])
    extends Table with SupportsRead {

  override def name(): String = relName

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan with Batch {
      private val data = rows().toArray
      override def readSchema(): StructType = schema
      override def description(): String = relName
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(GraftRowsPartition(data))
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftRowsReaderFactory
    }
  }
}

final case class GraftRowsPartition(rows: Array[Array[Any]])
    extends InputPartition

final class GraftRowsReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[GraftRowsPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i))
      override def close(): Unit = ()
    }
  }
}
