package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Ingest

/** Avro container-file ingest: lossless round-trip across the flat
  * type profile (incl. logical date/timestamp-micros, binary, nulls),
  * per-file read parallelism, and profile refusal for nested types. */
class AvroIngestSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"avro-$name").toString + "/t"

  test("round-trip: every profile type, nulls included") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("ntz", TimestampNTZType)))
    val rows = Seq(
      Row(1L, 7, 3.25, 1.5f, true, "hello",
        Array[Byte](1, 2, 3), java.sql.Date.valueOf("1997-06-15"),
        java.sql.Timestamp.valueOf("2024-08-16 12:45:59.123456"),
        java.time.LocalDateTime.parse("2024-08-16T12:45:59.123456")),
      Row(2L, null, null, null, false, "",
        Array.empty[Byte], java.sql.Date.valueOf("1970-01-01"), null,
        java.time.LocalDateTime.parse("1969-12-31T23:59:59.000001")),
      Row(3L, -1, -0.5, null, null, null, null, null,
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.000001"), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp("types")
    Ingest.toAvro(df, dir)
    val back = Ingest.avro(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = df.orderBy("k").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case v => v
    })
    val b = back.orderBy("k").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case v => v
    })
    assert(b.toSeq === a.toSeq)
  }

  test("one container file per partition; one read partition per file") {
    import spark.implicits._
    val df = (1L to 100L).toDF("k").repartition(4)
    val dir = tmp("parts")
    Ingest.toAvro(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length === 4)
    val back = Ingest.avro(spark, dir)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.agg(sum(col("k"))).head().getLong(0) === 5050L)
  }

  test("nested types refuse (profile boundary), empty dir refuses") {
    import spark.implicits._
    val nested = Seq((1L, Seq(1, 2))).toDF("k", "arr")
    intercept[IllegalArgumentException](
      Ingest.toAvro(nested, tmp("nested")))
    intercept[IllegalArgumentException](
      Ingest.avro(spark, java.nio.file.Files
        .createTempDirectory("avro-empty").toString))
  }
}
