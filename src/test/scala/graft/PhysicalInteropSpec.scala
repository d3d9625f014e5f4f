package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions._

import graft.operators.MergeOps
import graft.sources.MutableParquetTable

/** Physical-type interop through the CoW merge — the reference's
  * multi-type matrix including the cases its own suite leaves commented
  * out (ParquetRewriterTests.java:358-369: int96, fixed_len_byte_array).
  * Tables whose payloads use legacy/external physical encodings must
  * merge exactly, with clean files passed through byte-identical (still
  * in the foreign physical type) and dirty files re-encoded to the
  * engine's layout — a snapshot may therefore hold MIXED physical types
  * under one logical schema, and reads must agree across them. */
class PhysicalInteropSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-interop").toString

  test("INT96 timestamp payloads survive a merge into a mixed-physical snapshot") {
    val s = spark; import s.implicits._
    val dir = freshDir()
    // base written by a LEGACY producer: INT96 timestamps (the deprecated
    // physical type older Spark/Hive/Impala emit by default)
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prev = s.conf.getOption(tsKey)
    s.conf.set(tsKey, "INT96")
    try {
      (0 until 300).map(i => (i.toLong,
          new java.sql.Timestamp(1_600_000_000_000L + i * 1000L + 123L)))
        .toDF("k", "ts")
        .repartitionByRange(3, col("k")).sortWithinPartitions("k")
        .write.mode("overwrite").parquet(dir)
    } finally prev match {
      case Some(v) => s.conf.set(tsKey, v); case None => s.conf.unset(tsKey)
    }
    val base = s.read.parquet(dir)

    val batch = (0 until 10).map(i => (i.toLong,
        new java.sql.Timestamp(1_700_000_000_000L + i), "upsert"))
      .toDF("k", "ts", "op")
    val t = MutableParquetTable(spark, dir, "k")
    val res = t.merge(batch)
    assert(res.passthroughFiles.nonEmpty,
      "expected untouched INT96 files to pass through")
    // mixed snapshot: hard-linked INT96 files + engine-written
    // TIMESTAMP_MICROS files under one logical schema
    val got = MutableParquetTable.readCommitted(spark, res.snapshotDir)
    val expect = MergeOps.applyMutations(base, batch, "k")
    assert(got.count() === 300)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("fixed_len_byte_array payloads from a parquet-mr producer merge exactly") {
    val s = spark; import s.implicits._
    val dir = freshDir()
    // external producer writing FIXED_LEN_BYTE_ARRAY(3) — not a layout
    // Spark ever emits for binary, so build the files with parquet-mr's
    // Group API directly (two files, disjoint sorted key ranges)
    val schema = MessageTypeParser.parseMessageType(
      "message m { required int64 k; required fixed_len_byte_array(3) fb; }")
    val gf = new SimpleGroupFactory(schema)
    val conf = spark.sparkContext.hadoopConfiguration
    def fb(i: Int): Array[Byte] =
      Array((0x80 | (i >> 8)).toByte, (i & 0xff).toByte, 0x5A.toByte)
    Seq(0 until 100, 100 until 200).zipWithIndex.foreach { case (ks, fi) =>
      val w = ExampleParquetWriter.builder(new Path(s"$dir/ext-$fi.parquet"))
        .withConf(conf).withType(schema).build()
      try ks.foreach { i =>
        val g = gf.newGroup()
        g.add("k", i.toLong)
        g.add("fb", Binary.fromConstantByteArray(fb(i)))
        w.write(g)
      } finally w.close()
    }
    val base = s.read.parquet(dir)
    assert(base.count() === 200)

    val batch =
      (0 until 5).map(i => (i.toLong, Array(1.toByte, 2.toByte), "upsert"))
        .toDF("k", "fb", "op")
    val t = MutableParquetTable(spark, dir, "k")
    val res = t.merge(batch)
    assert(res.rewrittenFiles.size === 1 && res.passthroughFiles.size === 1)
    val got = MutableParquetTable.readCommitted(spark, res.snapshotDir)
    val expect = MergeOps.applyMutations(base, batch, "k")
    assert(got.count() === 200)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    // the untouched file still carries its foreign physical type
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(res.passthroughFiles.map(f =>
          s"${res.snapshotDir}/${Paths.get(f).getFileName}").head), conf))
    try {
      val fbType = footer.getFooter.getFileMetaData.getSchema
        .getType(Seq("fb"): _*)
      assert(fbType.asPrimitiveType().getPrimitiveTypeName.name ===
        "FIXED_LEN_BYTE_ARRAY")
    } finally footer.close()
  }
}
