package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.CompactionUtil

/** The reference-shaped public API (GraftRewriter) and the raw row-group
  * passthrough compaction utility. */
class RewriterApiSpec extends SparkSpec {

  test("GraftRewriter: create, upsert, delete, commit — reference lifecycle") {
    val dir = Files.createTempDirectory("graft-rw").toString + "/t"
    val c = Tables.customer(spark, sf())
    val rw = GraftRewriter.create(c, dir, "c_custkey", numFiles = 4)

    val ups = c.where(col("c_custkey") % 10 === 1)
      .withColumn("c_acctbal", lit(42.42))
    val dels = c.where(col("c_custkey") % 10 === 2).select(col("c_custkey"))
    val res = rw.upsert(ups).delete(dels).commit()

    val out = spark.read.parquet(res.snapshotDir)
    val nDel = dels.count()
    assert(out.count() === c.count() - nDel)
    assert(out.where(col("c_custkey") % 10 === 2).count() === 0)
    val bals = out.where(col("c_custkey") % 10 === 1)
      .select(col("c_acctbal")).distinct().collect()
    assert(bals.length === 1 && bals(0).getDouble(0) === 42.42)
  }

  test("GraftRewriter: later buffered batches win on key collisions") {
    val dir = Files.createTempDirectory("graft-rw2").toString + "/t"
    val c = Tables.customer(spark, sf())
    val rw = GraftRewriter.create(c, dir, "c_custkey", numFiles = 2)
    val k = c.orderBy(col("c_custkey")).limit(1)
    val res = rw
      .upsert(k.withColumn("c_acctbal", lit(1.0)))
      .upsert(k.withColumn("c_acctbal", lit(2.0)))
      .commit()
    val key = k.head().getLong(0)
    val got = spark.read.parquet(res.snapshotDir)
      .where(col("c_custkey") === key).select("c_acctbal").head().getDouble(0)
    assert(got === 2.0)
  }

  test("GraftRewriter: empty commit is metadata-only passthrough") {
    val dir = Files.createTempDirectory("graft-rw3").toString + "/t"
    val rw = GraftRewriter.create(Tables.customer(spark, sf()), dir, "c_custkey", 3)
    val res = rw.commit()
    assert(res.rewrittenFiles.isEmpty)
    assert(res.passthroughFiles.size === 3)
  }

  test("CompactionUtil concatenates files byte-for-byte (no decode)") {
    val work = Files.createTempDirectory("graft-compact").toString
    val c = Tables.customer(spark, sf())
    graft.sources.ParquetTable.writeSorted(c, s"$work/in", "c_custkey", 6)
    val outs = CompactionUtil.compactDir(spark, s"$work/in", s"$work/out", 2)
    assert(outs.size === 2)
    val back = spark.read.parquet(s"$work/out")
    assert(back.count() === c.count())
    // content identical under key order
    val a = back.orderBy("c_custkey").collect().map(_.toString).toSeq
    val b = c.orderBy("c_custkey").collect().map(_.toString).toSeq
    assert(a === b)
    // compacted output must contain the original row groups (passthrough,
    // not rewrite): row-group count is preserved, just re-packed
    val rgIn = graft.sources.ParquetStats.rowGroupStats(spark, s"$work/in").count()
    val rgOut = graft.sources.ParquetStats.rowGroupStats(spark, s"$work/out").count()
    assert(rgOut === rgIn)
  }

  test("planBySize packs contiguously and respects the byte target") {
    val files = Seq("a" -> 10L, "b" -> 20L, "c" -> 80L, "d" -> 5L,
      "e" -> 200L, "f" -> 5L)
    val groups = CompactionUtil.planBySize(files, targetBytes = 100L)
    // contiguity: concatenation of groups == input order
    assert(groups.flatten === files.map(_._1))
    // a+b+c=110 > 100 -> c starts a new bin; e oversized -> alone
    assert(groups === Seq(Seq("a", "b"), Seq("c", "d"), Seq("e"), Seq("f")))
  }

  test("size-targeted compaction folds small files, preserving groups and order") {
    val work = Files.createTempDirectory("graft-compact2").toString
    val c = Tables.customer(spark, sf())
    // many small files of uneven size
    graft.sources.ParquetTable.writeSorted(c, s"$work/in", "c_custkey", 10)
    val inBytes = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(java.nio.file.Paths.get(s"$work/in"))
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(Files.size).sum
      finally s.close()
    }
    val target = inBytes / 3
    val outs = CompactionUtil.compactDirBySize(spark, s"$work/in", s"$work/out", target)
    assert(outs.size >= 3 && outs.size < 10, s"got ${outs.size} outputs")
    val back = spark.read.parquet(s"$work/out")
    assert(back.orderBy("c_custkey").collect().map(_.toString).toSeq ===
      c.orderBy("c_custkey").collect().map(_.toString).toSeq)
    // passthrough, not rewrite
    assert(graft.sources.ParquetStats.rowGroupStats(spark, s"$work/out").count() ===
      graft.sources.ParquetStats.rowGroupStats(spark, s"$work/in").count())
    // disjoint key ranges survive: per-output min/max don't overlap
    val ranges = graft.sources.ParquetStats
      .fileKeyRangesTyped(spark, s"$work/out", "c_custkey")
      .sortBy(_.min.asInstanceOf[Long])
    ranges.sliding(2).foreach {
      case Seq(x, y) =>
        assert(x.max.asInstanceOf[Long] <= y.min.asInstanceOf[Long],
          s"overlap between ${x.file} and ${y.file}")
      case _ =>
    }
  }
}
