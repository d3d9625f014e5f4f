package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftBucket, MutableParquetTable}

/** Bucket-count evolution ([[GraftTable.rebucket]] / `CALL
  * <cat>.system.rebucket`): the one layout parameter CREATE pins forever
  * becomes a maintenance commit — re-hash to a new count, add SPJ
  * bucketing to a plain table, or de-bucket back to the range layout.
  * Necessarily a full rewrite (the bucket function moves every row), so
  * it also materializes dropped columns, renames, and tombstones away,
  * like the purging compact. */
class RebucketSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-rebucket").toString

  private def bucketOf(f: String): Option[Int] =
    GraftBucket.bucketOfName(f.substring(f.lastIndexOf('/') + 1))

  private def files(root: String, v: Long): Seq[String] =
    MutableParquetTable.manifestFileNames(s"$root/v$v").get
      .map(n => MutableParquetTable.resolvePath(s"$root/v$v", n))

  test("plain -> bucketed: layout converts, merges route by the new spec") {
    val root = freshRoot()
    val t = GraftTable.create(
      spark.range(0, 500).select(col("id").as("k"), (col("id") * 2).as("v")),
      root, "k", numFiles = 4)
    assert(MutableParquetTable.manifestBuckets(s"$root/base").isEmpty)
    val v = t.rebucket(Some(4))
    assert(v === 0L)
    assert(MutableParquetTable.manifestBuckets(s"$root/v0") === Some(4))
    // every file carries its bucket id, and rows are in the right bucket
    files(root, v).foreach { f =>
      val b = bucketOf(f).getOrElse(fail(s"$f has no bucket prefix"))
      val ks = spark.read.parquet(f).select("k").as[Long].collect()
      assert(ks.nonEmpty)
      val expected = spark.range(0, 500)
        .select(GraftBucket.bucketIdCol(col("id"), 4).as("b"), col("id"))
        .where(col("b") === b).select("id").as[Long].collect().toSet
      assert(ks.toSet.subsetOf(expected), s"rows of $f belong to bucket $b")
    }
    assert(t.read().count() === 500)
    // bucket-routed merge on the new layout
    t.commit(Seq((7L, -7L, "upsert")).toDF("k", "v", "op")) // v1
    assert(t.read().where(col("k") === 7L).head().getLong(1) === -7L)
    assert(MutableParquetTable.manifestBuckets(s"$root/v1") === Some(4))
  }

  test("bucketed n -> m and back to plain; time travel keeps old layouts") {
    val root = freshRoot()
    val t = GraftTable.create(
      spark.range(0, 500).select(col("id").as("k"), (col("id") + 1).as("v")),
      root, "k", numFiles = 4, buckets = Some(2))
    t.commit(Seq((3L, 30L, "upsert")).toDF("k", "v", "op")) // v0
    val v1 = t.rebucket(Some(8))                            // v1
    assert(MutableParquetTable.manifestBuckets(s"$root/v$v1") === Some(8))
    assert(files(root, v1).flatMap(bucketOf).distinct.sorted.forall(_ < 8))
    assert(t.read().count() === 500)
    assert(t.read().where(col("k") === 3L).head().getLong(1) === 30L)

    val v2 = t.rebucket(None)                               // v2: de-bucket
    assert(MutableParquetTable.manifestBuckets(s"$root/v$v2").isEmpty)
    assert(files(root, v2).flatMap(bucketOf).isEmpty,
      "de-bucketed files must not carry bucket prefixes")
    assert(t.read().count() === 500)
    // the de-bucketed layout is key-sorted + range-routable: a point
    // merge dirties one file, not the table
    val latest = graft.streaming.CdcMergeSink.latestSnapshot(root)
    val mr = graft.sources.MutableParquetTable(spark, latest, "k")
      .merge(Seq((3L, 33L, "upsert")).toDF("k", "v", "op"),
        snapshotDir = Some(s"$root/v${v2 + 1}"))
    assert(mr.rewrittenFiles.size === 1,
      s"point merge must dirty one range-routed file, " +
        s"got ${mr.rewrittenFiles.size}")
    assert(t.read().where(col("k") === 3L).head().getLong(1) === 33L)

    // versions keep their own layout
    assert(MutableParquetTable.manifestBuckets(s"$root/v0") === Some(2))
    assert(MutableParquetTable.readCommitted(spark, s"$root/v0")
      .where(col("k") === 3L).head().getLong(1) === 30L)
  }

  test("rebucket materializes renames, dropped columns, and tombstones") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 100L).map(i => (i, i * 10, s"e$i")).toDF("k", "v", "extra"),
      root, "k", numFiles = 4)
    t.renameColumn("extra", "note")          // v0 (mapping live)
    t.deleteKeys(Seq(1L, 2L).toDF("k"))      // v1 (sidecar live)
    val v = t.rebucket(Some(4))              // v2: full logical rewrite
    val dir = s"$root/v$v"
    assert(MutableParquetTable.manifestRenames(dir).isEmpty,
      "a full rewrite materializes the rename mapping away")
    assert(MutableParquetTable.manifestTombstoneRows(dir) === 0,
      "tombstones fold into the rewrite")
    assert(t.read().count() === 98)
    assert(t.read().schema.fieldNames.toSeq === Seq("k", "v", "note"))
    files(root, v).foreach(f => assert(spark.read.parquet(f)
      .schema.fieldNames.contains("note"),
      s"$f must physically carry the materialized name"))
    // the birth name is free again
    OptimisticCommit.commitSchema(root, t.read().schema
      .add("extra", org.apache.spark.sql.types.StringType))
    assert(t.read().where(col("extra").isNotNull).count() === 0)
  }

  test("SQL surface: CALL system.rebucket changes the spec atomically") {
    val w = java.nio.file.Files.createTempDirectory("graft-rebucket-cat").toString
    spark.conf.set("spark.sql.catalog.rb",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rb.root", w)
    spark.sql("""CREATE TABLE rb.ns.t (k BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key' = 'k', 'buckets' = '2')""")
    spark.sql("INSERT INTO rb.ns.t SELECT id, id * 2 FROM range(0, 300)")
    val res = spark.sql("CALL rb.system.rebucket('ns.t', 8)").collect().head
    assert(res.getInt(1) === 2 && res.getInt(2) === 8)
    assert(MutableParquetTable.manifestBuckets(
      graft.streaming.CdcMergeSink.latestSnapshot(s"$w/ns/t")) === Some(8))
    assert(spark.sql("SELECT count(*) AS c FROM rb.ns.t").head()
      .getLong(0) === 300L)
    // DML keeps working on the re-bucketed layout
    spark.sql("UPDATE rb.ns.t SET v = 0 WHERE k = 7")
    assert(spark.sql("SELECT v FROM rb.ns.t WHERE k = 7").head()
      .getLong(0) === 0L)
    // de-bucket via 0
    spark.sql("CALL rb.system.rebucket('ns.t', 0)")
    assert(MutableParquetTable.manifestBuckets(
      graft.streaming.CdcMergeSink.latestSnapshot(s"$w/ns/t")).isEmpty)
    assert(spark.sql("SELECT count(*) AS c FROM rb.ns.t").head()
      .getLong(0) === 300L)
  }

  test("empty table rebuckets at metadata price; contract carried") {
    val root = freshRoot()
    val t = GraftTable.create(
      spark.range(0, 10).select(col("id").as("k"), col("id").as("v")),
      root, "k", numFiles = 1)
    t.addCheck("v_nn", "v IS NOT NULL") // v0
    t.replace(spark.range(0, 0).select(col("id").as("k"), col("id").as("v"))) // v1: truncate
    val v = t.rebucket(Some(4)) // v2, empty content
    assert(MutableParquetTable.manifestBuckets(s"$root/v$v") === Some(4))
    assert(MutableParquetTable.manifestFileNames(s"$root/v$v").get.isEmpty)
    assert(t.checks.keySet === Set("v_nn"), "constraints survive the rebucket")
    assert(t.read().count() === 0)
    // the next insert lands bucketed under the new spec
    t.commit(Seq((1L, 1L, "upsert")).toDF("k", "v", "op"))
    val fs = MutableParquetTable.manifestFileNames(
      graft.streaming.CdcMergeSink.latestSnapshot(root)).get
    assert(fs.nonEmpty && fs.forall(f =>
      GraftBucket.bucketOfName(f.split('/').last).isDefined))
  }
}
