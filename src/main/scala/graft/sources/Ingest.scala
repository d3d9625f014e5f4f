package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** CSV/JSON ingestion into the engine's Parquet layout (SURVEY.md §2b
  * "CSV/JSON ingest"). Schemas should be supplied for production paths —
  * inference costs an extra full scan, which at 100 TB is the difference
  * between one pass and two. */
object Ingest {

  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
          header: Boolean = true, delimiter: String = ","): DataFrame = {
    var r = spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
    schema match {
      case Some(s) => r = r.schema(s)
      case None    => r = r.option("inferSchema", "true")
    }
    r.csv(path)
  }

  def json(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    var r = spark.read
    schema.foreach(s => r = r.schema(s))
    r.json(path)
  }

  /** ORC read/write (Spark-native reader; vectorized, predicate pushdown
    * and column pruning work the same as parquet). ORC is the interchange
    * format Hive-era warehouses hand us — ingest is read → land as the
    * engine's parquet layout via [[toSortedParquet]]. */
  def orc(spark: SparkSession, path: String,
          schema: Option[StructType] = None): DataFrame = {
    var r = spark.read
    schema.foreach(s => r = r.schema(s))
    r.orc(path)
  }

  def toOrc(df: DataFrame, path: String, compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** Land an ingested frame as a key-sorted Parquet table ready for
    * merges and pruning. */
  def toSortedParquet(df: DataFrame, path: String, key: String, numFiles: Int,
                      layout: ParquetLayout = ParquetLayout()): Unit =
    ParquetTable.writeSorted(df, path, key, numFiles, layout)

  // ---- Avro container files ----------------------------------------------
  //
  // Spark's distribution ships the Avro LIBRARY (org.apache.avro) but not
  // the spark-avro DataSource module, so this reads/writes Avro object
  // container files directly with DataFileReader/DataFileWriter inside
  // mapPartitions — one file per partition on write, one partition per
  // file on read (container files are the interchange unit; a 100-TB
  // ingest lands as many files and parallelizes by file). The type map
  // covers the flat-relational profile an interchange dump carries:
  // long/int/double/float/boolean/string/binary plus the date
  // (logicalType date over int) and timestamp-micros logical types,
  // every field nullable via the standard [null, T] union. Nested
  // records are out of profile — refused, never silently flattened.

  private def avroFieldSchema(dt: DataType): String = dt match {
    case LongType => "\"long\""
    case IntegerType => "\"int\""
    case DoubleType => "\"double\""
    case FloatType => "\"float\""
    case BooleanType => "\"boolean\""
    case StringType => "\"string\""
    case BinaryType => "\"bytes\""
    case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
    case TimestampType =>
      "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
    case TimestampNTZType =>
      "{\"type\":\"long\",\"logicalType\":\"local-timestamp-micros\"}"
    case other => throw new IllegalArgumentException(
      s"avro ingest profile does not cover ${other.catalogString}")
  }

  private def avroSchemaJson(schema: StructType): String =
    schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${avroFieldSchema(f.dataType)}]}"""
    }.mkString(
      """{"type":"record","name":"graft_row","fields":[""", ",", "]}")

  private def sparkType(s: org.apache.avro.Schema): DataType = {
    import org.apache.avro.Schema.Type._
    import org.apache.avro.LogicalTypes
    s.getType match {
      case UNION =>
        val nonNull = s.getTypes.stream.filter(_.getType != NULL).toArray
        require(nonNull.length == 1,
          s"avro ingest profile covers only [null, T] unions, got $s")
        sparkType(nonNull(0).asInstanceOf[org.apache.avro.Schema])
      case LONG if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] =>
        TimestampType
      case LONG if s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros] =>
        TimestampNTZType
      case LONG => LongType
      case INT if s.getLogicalType.isInstanceOf[LogicalTypes.Date] => DateType
      case INT => IntegerType
      case DOUBLE => DoubleType
      case FLOAT => FloatType
      case BOOLEAN => BooleanType
      case STRING => StringType
      case BYTES => BinaryType
      case other => throw new IllegalArgumentException(
        s"avro ingest profile does not cover avro type $other")
    }
  }

  /** Write `df` as Avro object container files (zstd-compressed), one
    * file per partition. */
  def toAvro(df: DataFrame, path: String): Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val sparkSchema = df.schema
    sparkSchema.fields.foreach(f => avroFieldSchema(f.dataType)) // validate
    val json = avroSchemaJson(sparkSchema)
    val dir = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(dir)) MutableParquetTable.deleteDir(dir)
    java.nio.file.Files.createDirectories(dir)
    val fields = sparkSchema.fields
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(json)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(CodecFactory.zstandardCodec(3))
      // task-commit protocol: write to a PER-ATTEMPT temp name and
      // atomically rename on success — a retried/speculative attempt
      // never interleaves with another attempt on the final part file,
      // and a mid-write failure leaves only an ignorable .tmp (the
      // reader filters on the .avro suffix), never a truncated part
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val tmp = new java.io.File(s"$path/.part-$pid-$attempt.avro.tmp")
      var committed = false
      try {
        writer.create(schema, tmp)
        var n = 0L
        rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < fields.length) {
            val v =
              if (row.isNullAt(i)) null
              else fields(i).dataType match {
                case DateType =>
                  Int.box(row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
                case TimestampType =>
                  val inst = row.getAs[java.sql.Timestamp](i).toInstant
                  Long.box(Math.addExact(
                    Math.multiplyExact(inst.getEpochSecond, 1000000L),
                    inst.getNano / 1000L))
                case TimestampNTZType =>
                  val ldt = row.getAs[java.time.LocalDateTime](i)
                  Long.box(Math.addExact(Math.multiplyExact(
                    ldt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
                    ldt.getNano / 1000L))
                case BinaryType =>
                  java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
                case _ => row.get(i).asInstanceOf[AnyRef]
              }
            rec.put(i, v)
            i += 1
          }
          writer.append(rec)
          n += 1
        }
        writer.close()
        java.nio.file.Files.move(tmp.toPath,
          java.nio.file.Paths.get(s"$path/part-$pid.avro"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        committed = true
        Iterator.single(n)
      } finally {
        if (!committed) {
          try writer.close() catch { case _: Throwable => () }
          java.nio.file.Files.deleteIfExists(tmp.toPath)
        }
      }
    }.count()
  }

  /** Read a directory of Avro object container files written by
    * [[toAvro]] (or any writer within the flat profile): the schema
    * comes from the first file's header (driver-side), each file is one
    * read partition. File listing and reads go through `java.io` —
    * local/NFS filesystems (the deployment here); a cluster-store
    * variant would swap in Hadoop `FileSystem` streams with
    * `SeekableInput`, the only two touch points. */
  def avro(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      .toArray.map(_.toString).filter(_.endsWith(".avro")).sorted
    require(files.nonEmpty, s"no .avro files under $path")
    val head = new DataFileReader[GenericRecord](
      new java.io.File(files.head), new GenericDatumReader[GenericRecord]())
    val avroSchema = try head.getSchema finally head.close()
    val sparkSchema = StructType(avroSchema.getFields.asScala.map { f =>
      StructField(f.name(), sparkType(f.schema()), nullable = true)
    }.toArray)
    val json = avroSchema.toString
    val fieldTypes = sparkSchema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { file =>
        val reader = new DataFileReader[GenericRecord](
          new java.io.File(file), new GenericDatumReader[GenericRecord](
            new org.apache.avro.Schema.Parser().parse(json)))
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          while (reader.hasNext) {
            val rec = reader.next()
            val vals = new Array[Any](fieldTypes.length)
            var i = 0
            while (i < fieldTypes.length) {
              val v = rec.get(i)
              vals(i) =
                if (v == null) null
                else fieldTypes(i) match {
                  case StringType => v.toString
                  case DateType => java.sql.Date.valueOf(
                    java.time.LocalDate.ofEpochDay(
                      v.asInstanceOf[Int].toLong))
                  case TimestampType =>
                    val micros = v.asInstanceOf[Long]
                    val t = new java.sql.Timestamp(
                      Math.floorDiv(micros, 1000000L) * 1000L)
                    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
                    t
                  case TimestampNTZType =>
                    val micros = v.asInstanceOf[Long]
                    java.time.LocalDateTime.ofEpochSecond(
                      Math.floorDiv(micros, 1000000L),
                      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
                      java.time.ZoneOffset.UTC)
                  case BinaryType =>
                    val bb = v.asInstanceOf[java.nio.ByteBuffer]
                    val arr = new Array[Byte](bb.remaining())
                    bb.duplicate().get(arr)
                    arr
                  case _ => v
                }
              i += 1
            }
            out += Row.fromSeq(vals.toIndexedSeq)
          }
        } finally reader.close()
        out
      }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
