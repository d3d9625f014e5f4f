package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.{MutableParquetTable, ParquetTable}
import graft.streaming.CdcMergeSink

/** Streaming CDC apply: micro-batches merged through the CoW path with
  * per-batch snapshot commits and failure-replay idempotency. */
class CdcSinkSpec extends SparkSpec {

  // base table: 100 rows, key-sorted into 4 files
  private def mkBase(root: String): Unit = {
    val base = spark.range(0, 100)
      .select(col("id"), (col("id") * 2).cast("double").as("v"))
    ParquetTable.writeSorted(base, s"$root/base", "id", 4)
  }

  test("two micro-batches apply through CoW merges; final state exact") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    mkBase(root)

    val in = MemoryStream[(Long, Double, String, Long)]
    val mut = in.toDF().toDF("id", "v", "op", "seq")
    val q = CdcMergeSink.start(mut, root, "id", seqCol = Some("seq"))
    try {
      // batch 0: update 5, delete 7, insert 150; key 9 gets two ops —
      // the later seq (delete) must win
      in.addData((5L, 555.0, "upsert", 1L), (7L, 0.0, "delete", 2L),
        (150L, 300.0, "upsert", 3L), (9L, 9.9, "upsert", 4L),
        (9L, 0.0, "delete", 5L))
      q.processAllAvailable()
      val v0 = CdcMergeSink.latestSnapshot(root)
      assert(v0.endsWith("/v0") && MutableParquetTable.isCommitted(v0))

      // batch 1: resurrect 7, delete 5 — applies on TOP of v0
      in.addData((7L, 77.0, "upsert", 6L), (5L, 0.0, "delete", 7L))
      q.processAllAvailable()
      assert(CdcMergeSink.latestSnapshot(root).endsWith("/v1"))
    } finally q.stop()

    val got = MutableParquetTable
      .readCommitted(spark, CdcMergeSink.latestSnapshot(root))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val expected = (0L until 100L).filterNot(Set(5L, 9L))
      .map(i => (i, if (i == 7) 77.0 else i * 2.0)) :+ (150L, 300.0)
    assert(got === expected.sortBy(_._1))

    // time travel: as-of batch 0 still shows the pre-batch-1 state
    assert(CdcMergeSink.versions(root) === Seq(0L, 1L))
    val v0state = CdcMergeSink.readAsOf(spark, root, 0L)
    assert(v0state.where(col("id") === 5L).head().getDouble(1) === 555.0)
    assert(v0state.where(col("id") === 7L).isEmpty) // deleted in batch 0
    // as-of a pre-history batch id: the base snapshot
    assert(CdcMergeSink.readAsOf(spark, root, -1L).count() === 100)

    // change feed base -> v0: exactly batch 0's collapsed effect
    val feed0 = CdcMergeSink.changeFeed(spark, root, -1L, 0L, "id")
      .select(col("id"), col("change_type")).as[(Long, String)]
      .collect().sortBy(_._1)
    assert(feed0 === Array((5L, "update"), (7L, "delete"), (9L, "delete"),
      (150L, "insert")))
    // before/after images carry the values
    val u5 = CdcMergeSink.changeFeed(spark, root, -1L, 0L, "id")
      .where(col("id") === 5L).head()
    assert(u5.getStruct(2).getDouble(0) === 10.0)  // before: 5*2
    assert(u5.getStruct(3).getDouble(0) === 555.0) // after: batch 0 upsert

    // change feed v0 -> v1: resurrect 7, delete 5
    val feed1 = CdcMergeSink.changeFeed(spark, root, 0L, 1L, "id")
      .select(col("id"), col("change_type")).as[(Long, String)]
      .collect().sortBy(_._1)
    assert(feed1 === Array((5L, "delete"), (7L, "insert")))

    // delta pruning: files shared between the two snapshots (hard-linked
    // passthroughs) are never opened by the feed
    val shared = MutableParquetTable.manifestFileNames(s"$root/v0").get.toSet
      .intersect(MutableParquetTable.manifestFileNames(s"$root/v1").get.toSet)
    assert(shared.nonEmpty, "fixture should share passthrough files")
    val feedFiles = CdcMergeSink.changeFeed(spark, root, 0L, 1L, "id")
      .inputFiles.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    assert(feedFiles.intersect(shared).isEmpty,
      s"feed must not read shared files: $feedFiles vs $shared")

    // identical endpoints -> empty feed (with the right schema)
    assert(CdcMergeSink.changeFeed(spark, root, 1L, 1L, "id").isEmpty)

    // retention: vacuum to the newest version only
    assert(CdcMergeSink.vacuum(root, keepLast = 1) === Seq(0L))
    assert(CdcMergeSink.versions(root) === Seq(1L))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/v0")))
    // latest state intact; below-horizon as-of degrades to base
    assert(MutableParquetTable
      .readCommitted(spark, CdcMergeSink.latestSnapshot(root))
      .orderBy("id").as[(Long, Double)].collect().toSeq === expected.sortBy(_._1))
    assert(CdcMergeSink.readAsOf(spark, root, 0L).count() === 100)
  }

  test("property: delta-pruned feed == brute-force snapshot diff under random batches") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cdcp").toString
    mkBase(root)
    val rnd = new scala.util.Random(11)
    // 3 random batches: updates, deletes, inserts over a 150-key space
    for (b <- 0 until 3) {
      val mutations = (0 until 30).map { _ =>
        val k = rnd.nextInt(150).toLong
        if (rnd.nextBoolean()) (k, rnd.nextInt(1000).toDouble, "upsert")
        else (k, 0.0, "delete")
      }.groupBy(_._1).map(_._2.head).toSeq // one op per key per batch
      CdcMergeSink.applyBatch(spark, mutations.toDF("id", "v", "op"),
        root, "id", batchId = b.toLong)
    }
    for ((from, to) <- Seq((-1L, 0L), (0L, 1L), (1L, 2L), (-1L, 2L), (0L, 2L))) {
      val pruned = CdcMergeSink.changeFeed(spark, root, from, to, "id")
        .orderBy("id").collect().map(_.toString).toSeq
      // brute force: same rowDiff but over the FULL snapshots, no pruning
      val brute = CdcMergeSink.rowDiff(
        CdcMergeSink.readAsOf(spark, root, from),
        CdcMergeSink.readAsOf(spark, root, to), "id")
        .orderBy("id").collect().map(_.toString).toSeq
      assert(pruned === brute, s"feed($from->$to) diverged from brute diff")
    }
  }

  test("replaying a committed batch is a no-op; a crashed half-apply is rebuilt") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cdc2").toString
    mkBase(root)
    val batch = Seq((3L, 33.0, "upsert")).toDF("id", "v", "op")

    CdcMergeSink.applyBatch(spark, batch, root, "id", batchId = 0L)
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/v0", "_manifest.json"))
    // replay with DIFFERENT data: committed snapshot must win untouched
    CdcMergeSink.applyBatch(spark, Seq((3L, -1.0, "upsert")).toDF("id", "v", "op"),
      root, "id", batchId = 0L)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/v0", "_manifest.json")) === manifest)

    // crashed half-apply: version dir exists, no manifest → rebuilt cleanly
    val half = java.nio.file.Paths.get(s"$root/v1")
    java.nio.file.Files.createDirectories(half)
    java.nio.file.Files.writeString(half.resolve("junk.parquet"), "not parquet")
    CdcMergeSink.applyBatch(spark, Seq((4L, 44.0, "upsert")).toDF("id", "v", "op"),
      root, "id", batchId = 1L)
    assert(MutableParquetTable.isCommitted(s"$root/v1"))
    val v1 = MutableParquetTable.readCommitted(spark, s"$root/v1")
    assert(v1.where(col("id") === 4L).head().getDouble(1) === 44.0)
    assert(v1.where(col("id") === 3L).head().getDouble(1) === 33.0)
    assert(v1.count() === 100)
  }

  test("empty micro-batch leaves the snapshot chain unchanged") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cdc3").toString
    mkBase(root)
    CdcMergeSink.applyBatch(spark,
      Seq.empty[(Long, Double, String)].toDF("id", "v", "op"),
      root, "id", batchId = 0L)
    assert(CdcMergeSink.latestSnapshot(root).endsWith("/base"))
  }
}
