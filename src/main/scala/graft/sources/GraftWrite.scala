package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 write path for graft tables: `INSERT INTO` /
  * `df.write.format("graft").mode("append").save(root)` append as ONE
  * copy-on-write merge commit — the next table version.
  *
  * Executors write the incoming batch as plain parquet into a
  * dot-staging directory (invisible to readers — same convention as the
  * concurrent-run merge staging), one file per task via Spark's own
  * parquet WriteSupport (vectorizable output, micros timestamps so key
  * stats stay usable). The DRIVER-side commit then runs the batch
  * through [[graft.GraftTable.commit]] — routing, passthrough, manifest
  * — and removes the staging dir; abort removes it without committing.
  * Write cost scales with the BATCH (staged once, merged once), never
  * the table.
  *
  * This replaces the earlier V1 `CreatableRelationProvider` bridge: the
  * plan now carries a genuine V2 write node, so `INSERT INTO` by catalog
  * name, path saves, and SQL `INSERT` all share one code path. */
final class GraftWriteBuilder(spark: SparkSession, table: GraftBatchTable,
                              info: LogicalWriteInfo) extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  /** SQL `INSERT OVERWRITE` / `df.write.mode("overwrite")`: Spark calls
    * truncate() when the overwrite condition is the whole table; the
    * commit then REPLACES content ([[graft.GraftTable.replace]]) instead
    * of merging it in. */
  private var replace = false

  override def truncate(): WriteBuilder = { replace = true; this }

  override def build(): Write = {
    val root = table.rootPath.getOrElse(throw new IllegalArgumentException(
      s"${table.snapshotDir} is a bare snapshot, not a versioned table " +
        "root (no base/) — writes need the version chain"))
    val key = table.keyName.getOrElse(throw new IllegalStateException(
      s"${table.snapshotDir} has no manifest key to merge on"))
    // ParquetWriteSupport reads its settings from the task-side
    // Configuration; resolve them HERE from the session's SQLConf (which
    // knows the defaults) — Configuration.get of an unset key is null and
    // the write support does not re-default
    import org.apache.spark.sql.internal.SQLConf
    val hc = spark.sessionState.newHadoopConf()
    val sc = spark.sessionState.conf
    Seq(SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
        SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
        SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE)
      .foreach(e => hc.set(e.key, sc.getConf(e).toString))
    // micros timestamps (stat-carrying) + no rebase, matching every
    // other engine write path
    hc.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    hc.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    hc.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    new GraftWrite(root, key, info.schema(), new SerializableConfiguration(hc),
      replace)
  }
}

final class GraftWrite(root: String, key: String, schema: StructType,
                       conf: SerializableConfiguration,
                       replace: Boolean = false) extends Write {
  override def toBatch: BatchWrite =
    new GraftBatchWrite(root, key, schema, conf, replace)
}

final class GraftBatchWrite(root: String, key: String, schema: StructType,
                            conf: SerializableConfiguration,
                            replace: Boolean = false)
    extends BatchWrite {

  private val staging =
    s"$root/.staging-insert-${java.util.UUID.randomUUID().toString.take(8)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    Files.createDirectories(Paths.get(staging))
    GraftWriterFactory(staging, schema, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    try {
      val staged = messages.collect { case GraftFileCommitted(p) => p }
      if (replace) {
        // INSERT OVERWRITE: the staged batch IS the table's next version
        // (empty select = truncate — an empty snapshot, schema kept)
        val batch =
          if (staged.nonEmpty) spark.read.schema(schema).parquet(staged: _*)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        graft.GraftTable(spark, root, key).replace(batch)
      } else if (staged.nonEmpty) {
        val batch = spark.read.schema(schema).parquet(staged: _*)
          .withColumn("op", org.apache.spark.sql.functions.lit("upsert"))
        graft.GraftTable(spark, root, key).commit(batch)
      }
    } finally MutableParquetTable.deleteDir(Paths.get(staging))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    MutableParquetTable.deleteDir(Paths.get(staging))
}

final case class GraftFileCommitted(path: String) extends WriterCommitMessage

final case class GraftWriterFactory(staging: String, schema: StructType,
                                    conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GraftDataWriter(s"$staging/part-$partitionId-$taskId.parquet",
      schema, conf.value)
}

/** One staged parquet file per task, written row-at-a-time through
  * Spark's ParquetWriteSupport. The writer is created lazily so empty
  * partitions stage nothing. */
final class GraftDataWriter(path: String, schema: StructType,
                            conf: Configuration)
    extends DataWriter[InternalRow] {

  private var writer: ParquetWriter[InternalRow] = _

  private def open(): ParquetWriter[InternalRow] = {
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(schema, c)
    class B(p: Path) extends ParquetWriter.Builder[InternalRow, B](p) {
      override def self(): B = this
      override def getWriteSupport(cc: Configuration)
          : WriteSupport[InternalRow] = new ParquetWriteSupport
    }
    new B(new Path(path))
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  override def write(record: InternalRow): Unit = {
    if (writer == null) writer = open()
    writer.write(record)
  }

  override def commit(): WriterCommitMessage =
    if (writer == null) GraftNothingStaged
    else {
      writer.close()
      GraftFileCommitted(path)
    }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    Files.deleteIfExists(Paths.get(path))
  }

  override def close(): Unit = ()
}

case object GraftNothingStaged extends WriterCommitMessage
