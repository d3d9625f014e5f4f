package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.operators.MergeOps
import graft.sources.{MutableParquetTable, ParquetLayout, ParquetStats, ParquetTable}

/** Copy-on-write merge over a key-sorted multi-file table — the engine's
  * analog of the reference's dirty-row-group rewrite + raw passthrough
  * (ParquetRewriter.java:312-322, noChangesTest :318-323). */
class CowMergeSpec extends SparkSpec {

  private def freshDir(): String = {
    Files.createTempDirectory("graft-cow").toString
  }

  private def listParquet(dir: String): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(dir))
    try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toList
    finally s.close()
  }

  private def writeBase(dir: String, nFiles: Int = 5): Unit = {
    val c = Tables.customer(spark, sf())
    ParquetTable.writeSorted(c, dir, "c_custkey", nFiles)
  }

  test("files hold disjoint sorted key ranges after writeSorted") {
    val dir = freshDir(); writeBase(dir)
    val ranges = ParquetStats.fileKeyRanges(spark, dir, "c_custkey")
      .orderBy(col("minKey")).collect()
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1),
        s"overlap: ${a} vs ${b}")
      case _ =>
    }
  }

  test("no-op merge touches zero data files (noChangesTest analog)") {
    val dir = freshDir(); writeBase(dir)
    val before = listParquet(dir).map(p => p.getFileName.toString -> Files.size(p)).toMap
    val t = MutableParquetTable(spark, dir, "c_custkey")
    val emptyBatch = Tables.customer(spark, sf())
      .withColumn("op", lit("upsert")).limit(0)
    val res = t.merge(emptyBatch)
    assert(res.rewrittenFiles.isEmpty)
    assert(res.passthroughFiles.size === before.size)
    val after = listParquet(res.snapshotDir)
      .map(p => p.getFileName.toString -> Files.size(p)).toMap
    assert(after === before) // bit-identical passthrough (hard links)
  }

  test("narrow-key merge rewrites only the owning file") {
    val dir = freshDir(); writeBase(dir)
    val nFiles = listParquet(dir).size
    val c = Tables.customer(spark, sf())
    // mutate 3 keys from the lowest range only
    val lowKeys = c.orderBy(col("c_custkey")).limit(3)
    val batch = lowKeys.withColumn("c_acctbal", lit(1234.56))
      .withColumn("op", lit("upsert"))
    val t = MutableParquetTable(spark, dir, "c_custkey")
    val res = t.merge(batch)
    assert(res.rewrittenFiles.size === 1, s"expected 1 dirty file, got ${res.rewrittenFiles}")
    assert(res.passthroughFiles.size === nFiles - 1)

    // semantic check: snapshot content == full-table merge
    val expect = MergeOps.applyMutations(c, batch, "c_custkey")
      .orderBy(col("c_custkey")).collect()
    val got = spark.read.parquet(res.snapshotDir)
      .orderBy(col("c_custkey")).collect()
    assert(got.map(_.toString).toSeq === expect.map(_.toString).toSeq)
  }

  test("inserts beyond the last range route to the last file; deletes apply") {
    val dir = freshDir(); writeBase(dir)
    val c = Tables.customer(spark, sf())
    val maxKey = c.agg(max(col("c_custkey"))).head().getLong(0)
    val s = spark; import s.implicits._
    val insert = c.limit(1)
      .withColumn("c_custkey", lit(maxKey + 1000))
      .withColumn("op", lit("upsert"))
    val dels = c.orderBy(col("c_custkey")).limit(2)
      .withColumn("op", lit("delete"))
    val batch = insert.unionByName(dels)
    val t = MutableParquetTable(spark, dir, "c_custkey")
    val res = t.merge(batch)
    assert(res.rewrittenFiles.size === 2) // first file (deletes) + last file (insert)
    val got = spark.read.parquet(res.snapshotDir)
    assert(got.where(col("c_custkey") === maxKey + 1000).count() === 1)
    assert(got.count() === c.count() - 2 + 1)
  }

  test("row-group layout controls are honored (S15/S18-S21)") {
    val dir = freshDir()
    val li = Tables.lineitem(spark, sf())
    ParquetTable.write(li, dir,
      ParquetLayout(rowGroupBytes = Some(64 * 1024), maxRecordsPerFile = Some(2000),
        compression = "zstd", dictionaryEnabled = false))
    val stats = ParquetStats.rowGroupStats(spark, dir)
    assert(stats.agg(sum(col("rowCount"))).head().getLong(0) === li.count())
    // maxRecordsPerFile forces multiple files; small block size → >1 row group
    assert(stats.select(col("file")).distinct().count() >= 3)
  }

  test("inferRowGroupBytes returns the source average (S18)") {
    val dir = freshDir()
    ParquetTable.write(Tables.customer(spark, sf()), dir, ParquetLayout())
    val avg = ParquetTable.inferRowGroupBytes(spark, dir)
    assert(avg > 0)
  }
}
