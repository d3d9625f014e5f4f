package graft

import org.apache.spark.sql.functions._

import graft.sources.MutableParquetTable

/** Merge-on-read DELETION TOMBSTONES: scattered key-deletes at metadata
  * cost (sidecar + manifest, zero data-file rewrites), subtracted by a
  * broadcast anti-join at read — across the Scala read paths, the V2
  * relation (injected rewrite), merges, the change feed, and
  * materialization. */
class TombstoneSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-ts").toString

  private def mkTable(root: String, n: Long = 400, files: Int = 8): GraftTable =
    GraftTable.create(
      spark.range(0, n).select(col("id").as("k"), (col("id") * 2).as("v")),
      root, "k", numFiles = files)

  /** Keys scattered so every file holds at least one — the case where
    * the CoW delete would rewrite the whole table. */
  private def scattered(n: Long = 400): Seq[Long] = (25L until n by 50)

  test("tombstone delete is metadata-only: zero rewrites, reads exact everywhere") {
    val root = freshRoot()
    val t = mkTable(root)
    val keys = scattered()
    val before = listSnapshotFiles(s"$root/base")

    val (v, res) = t.deleteKeysResult(keys.toDF("k"))
    assert(v === 0L)
    // the judged property: every data file passed through untouched
    assert(res.rewrittenFiles.isEmpty && res.insertedFileCount === 0)
    assert(res.passthroughFiles.size === before.size)
    assert(MutableParquetTable.manifestTombstoneRows(s"$root/v0")
      === keys.size)

    val expect = (0L until 400L).filterNot(keys.contains)
      .map(k => (k, k * 2))

    // facade read (readCommitted)
    assert(t.read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === expect)
    // range read (pruned path) keeps filtering
    assert(t.readRange(20L, 30L).orderBy("k").collect()
      .map(_.getLong(0)).toSeq === (20L to 30L).filterNot(keys.contains))
    // V2 relation: the injected anti-join (GraftTombstoneRule)
    val v2 = spark.read.format("graft").load(root)
    assert(v2.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === expect)
    // COUNT(*) must NOT answer from the (physical) manifest inventory
    assert(v2.count() === expect.size.toLong)
    assert(spark.read.format("graft").load(root)
      .agg(min(col("k")), max(col("k"))).head().toSeq === Seq(0L, 399L))
    // time travel: the pre-delete state is intact
    assert(t.readAsOf(-1L).count() === 400L)
  }

  test("upsert of a tombstoned key resurrects it; merges stay exact") {
    val root = freshRoot()
    val t = mkTable(root)
    t.deleteKeys(Seq(25L, 75L, 125L).toDF("k"))
    // upsert one tombstoned key + one live key, delete one live key
    t.commit(Seq((75L, -75L, "upsert"), (10L, -10L, "upsert"),
      (90L, 0L, "delete")).toDF("k", "v", "op"))
    val got = t.read().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(25L) && !got.contains(125L), "tombstones hold")
    assert(got(75L) === -75L, "upsert resurrects a tombstoned key")
    assert(got(10L) === -10L && !got.contains(90L))
    assert(got.size === 400 - 3)
    // the carried sidecar shrank by the resurrected key
    assert(MutableParquetTable.manifestTombstoneRows(s"$root/v1") === 2L)
    // rewritten files physically dropped their tombstoned rows
    val physical = spark.read.parquet(
      MutableParquetTable.manifestFileNames(s"$root/v1").get
        .map(n => MutableParquetTable.resolvePath(s"$root/v1", n)): _*)
    assert(physical.where(col("k") === 75L).count() === 1)
  }

  test("tombstone chains accumulate and stay exact (vs relational oracle)") {
    val root = freshRoot()
    val t = mkTable(root)
    t.deleteKeys((0L until 400L by 37).toDF("k"))
    t.deleteKeys((5L until 400L by 41).toDF("k"))
    val dead = ((0L until 400L by 37) ++ (5L until 400L by 41)).toSet
    assert(t.read().collect().map(_.getLong(0)).toSet
      === (0L until 400L).filterNot(dead).toSet)
    // idempotent re-delete folds into the same set
    t.deleteKeys((0L until 400L by 37).toDF("k"))
    assert(MutableParquetTable.manifestTombstoneRows(s"$root/v2")
      === dead.size.toLong)
  }

  test("change feed emits tombstone deletes with before images, delta-priced") {
    val root = freshRoot()
    val t = mkTable(root)
    t.deleteKeys(Seq(25L, 175L).toDF("k"))
    val feed = t.changeFeed(-1L, 0L)
      .select(col("k"), col("change_type"), col("before.v"), col("after.v"))
      .orderBy("k").collect()
    assert(feed.map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3)))
      .toSeq === Seq((25L, "delete", 50L, null), (175L, "delete", 350L, null)))
    // resurrecting upsert shows as INSERT in the next feed step
    t.commit(Seq((25L, -1L, "upsert")).toDF("k", "v", "op"))
    val feed2 = t.changeFeed(0L, 1L)
      .select(col("k"), col("change_type"), col("after.v")).collect()
    assert(feed2.map(r => (r.getLong(0), r.getString(1), r.get(2))).toSeq
      === Seq((25L, "insert", -1L)))
  }

  test("change feed over-cap delta: point-prune fallback reads all shared files, stays exact") {
    val root = freshRoot()
    val t = mkTable(root)
    // a bulk tombstone batch with more distinct leading keys than the cap
    val keys = (0L until 400L by 3).toSeq
    t.deleteKeys(keys.toDF("k"))
    val expected = keys.map(k => (k, "delete")).sortBy(_._1)
    def rows(cap: Int) = graft.streaming.CdcMergeSink
      .changeFeed(spark, root, -1L, 0L, "k", pointPruneMaxKeys = cap)
      .select(col("k"), col("change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    // cap below the delta's key count → fallback branch (all shared files)
    assert(rows(cap = 4) === expected)
    // pruned branch agrees
    assert(rows(cap = 1000000) === expected)
  }

  test("materializeTombstones folds the sidecar into a physical rewrite") {
    val root = freshRoot()
    val t = mkTable(root)
    t.deleteKeys(Seq(25L, 26L, 27L).toDF("k")) // one file's range
    val v = t.materializeTombstones()
    assert(v === 1L)
    assert(MutableParquetTable.manifestTombstoneRows(s"$root/v1") === 0L)
    // rows are physically gone now
    val physical = spark.read.parquet(
      MutableParquetTable.manifestFileNames(s"$root/v1").get
        .map(n => MutableParquetTable.resolvePath(s"$root/v1", n)): _*)
    assert(physical.where(col("k").isin(25L, 26L, 27L)).isEmpty)
    assert(t.read().count() === 397L)
    // clustered tombstones → only the holder file rewrote
    val hist = t.changeFeed(0L, 1L)
    assert(hist.isEmpty, "materialization changes no logical rows")
    // and a no-op when there is nothing to fold
    assert(t.materializeTombstones() === 1L)
  }

  test("SQL DML: tombstone-wrapped targets apply exactly; bare targets fail fast") {
    val root = freshRoot()
    val t = mkTable(root)
    t.deleteKeys(Seq(25L).toDF("k"))
    // a temp view analyzes eagerly, so its stored plan carries the
    // tombstone anti-join — DML over it sees the LOGICAL state and
    // composes with the sidecar algebra
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ts_dml USING graft " +
      s"OPTIONS (path '$root')")
    spark.sql("DELETE FROM ts_dml WHERE k = 30")
    spark.sql("UPDATE ts_dml SET v = -1 WHERE k = 31")
    val got = t.read().where(col("k") < 40).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(25L), "sidecar survives SQL DML")
    assert(!got.contains(30L) && got(31L) === -1L)

    // a BARE tombstoned target (catalog name: the DML root shields the
    // relation from the wrap) fails fast instead of resurrecting rows
    val w = freshRoot()
    val cat = "gts_" + java.lang.Long.toHexString(System.nanoTime())
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", w)
    mkTable(s"$w/ns/t").deleteKeys(Seq(25L).toDF("k"))
    def msg(x: Throwable): String =
      Option(x.getMessage).getOrElse("") +
        Option(x.getCause).map(msg).getOrElse("")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.ns.t SET v = -1 WHERE k = 31")
    }
    assert(msg(e).contains("materialize"), s"got: ${msg(e)}")
    // compact refuses too
    val e2 = intercept[IllegalArgumentException] { t.compact(1024 * 1024) }
    assert(e2.getMessage.contains("materialize"))
  }

  test("zone-map DELETE/UPDATE carry the sidecar verbatim") {
    val root = freshRoot()
    val t = mkTable(root)
    t.deleteKeys(Seq(25L, 350L).toDF("k"))
    // zone delete of a key range (drops whole files + boundary rewrite)
    t.deleteWhere(col("k") >= 300L)
    val got = t.read().collect().map(_.getLong(0)).toSet
    assert(!got.contains(25L), "sidecar survives the zone delete")
    assert(got.max < 300L && !got.contains(299L) === false)
    assert(MutableParquetTable.manifestTombstoneRows(s"$root/v1") === 2L)
    // zone update: tombstoned rows stay hidden even if the cond matched them
    t.updateWhere(col("k") < 50L, "v" -> lit(-5L))
    val got2 = t.read().where(col("k") < 50L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got2.contains(25L))
    assert(got2(24L) === -5L)
  }

  test("tombstones on a BUCKETED table: metadata delete + SPJ layout preserved") {
    val root = freshRoot()
    val df = spark.range(0, 400)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
    val t = GraftTable.create(df, root, "k", numFiles = 4, buckets = Some(4))
    val (_, res) = t.deleteKeysResult(Seq(3L, 99L, 217L).toDF("k"))
    assert(res.rewrittenFiles.isEmpty)
    assert(t.read().count() === 397L)
    // a later merge keeps both the bucket layout and the sidecar algebra
    t.commit(Seq((99L, -99L, "upsert")).toDF("k", "v", "op"))
    assert(MutableParquetTable.manifestBuckets(s"$root/v1") === Some(4))
    assert(MutableParquetTable.manifestTombstoneRows(s"$root/v1") === 2L)
    val got = t.read().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(99L) === -99L && !got.contains(3L) && !got.contains(217L))
  }

  test("SQL DELETE picks the tombstone strategy when opted in (key-only, small)") {
    val root = freshRoot()
    val t = mkTable(root)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ts_strat USING graft " +
      s"OPTIONS (path '$root')")
    spark.conf.set("spark.graft.delete.useTombstones", "true")
    try {
      // key-only scattered predicate → tombstone commit, zero rewrites
      spark.sql("DELETE FROM ts_strat WHERE k IN (11, 111, 311)")
      assert(graft.plans.GraftDmlRule.lastDeleteStrategy === "tombstone")
      assert(MutableParquetTable.manifestTombstoneRows(s"$root/v0") === 3L)
      assert(t.read().count() === 397L)

      // non-key predicate still uses the batch CoW path
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW ts_strat2 USING graft " +
        s"OPTIONS (path '$root')")
      spark.sql("DELETE FROM ts_strat2 WHERE v = 20")
      assert(graft.plans.GraftDmlRule.lastDeleteStrategy === "batch")
      assert(t.read().count() === 396L)

      // a key-RANGE predicate the zone map proves keeps the zone path
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW ts_strat3 USING graft " +
        s"OPTIONS (path '$root')")
      spark.sql("DELETE FROM ts_strat3 WHERE k >= 350")
      assert(graft.plans.GraftDmlRule.lastDeleteStrategy === "zone")

      // repeated CATALOG-addressed tombstone deletes accumulate: DELETE
      // is tombstone-safe on a bare target, so the second statement must
      // not demand materialization (UPDATE/MERGE still do)
      val w2 = freshRoot()
      val cat2 = "gts2_" + java.lang.Long.toHexString(System.nanoTime())
      spark.conf.set(s"spark.sql.catalog.$cat2",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat2.root", w2)
      mkTable(s"$w2/ns/t")
      spark.sql(s"DELETE FROM $cat2.ns.t WHERE k IN (1, 2)")
      assert(graft.plans.GraftDmlRule.lastDeleteStrategy === "tombstone")
      spark.sql(s"DELETE FROM $cat2.ns.t WHERE k IN (7)")
      assert(graft.plans.GraftDmlRule.lastDeleteStrategy === "tombstone")
      assert(MutableParquetTable.manifestTombstoneRows(s"$w2/ns/t/v1") === 3L)
      assert(spark.sql(s"SELECT count(*) FROM $cat2.ns.t")
        .head().getLong(0) === 397L)
      def m2(x: Throwable): String = Option(x.getMessage).getOrElse("") +
        Option(x.getCause).map(m2).getOrElse("")
      val eu = intercept[Exception] {
        spark.sql(s"UPDATE $cat2.ns.t SET v = 0 WHERE k = 8")
      }
      assert(m2(eu).contains("materialize"))
    } finally spark.conf.unset("spark.graft.delete.useTombstones")
    // opt-out default: never tombstones — the same key-IN shape takes
    // the zone path (the no-op-cast fix made IN-lists zone-provable:
    // non-holder files pass through, only the holders rewrite)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ts_strat4 USING graft " +
      s"OPTIONS (path '$root')")
    spark.sql("DELETE FROM ts_strat4 WHERE k IN (12, 112)")
    assert(graft.plans.GraftDmlRule.lastDeleteStrategy === "zone")
  }

  test("raw scans cannot resurrect: scan-builder guard without the anti-join") {
    val root = freshRoot()
    val t = mkTable(root)
    t.deleteKeys(Seq(25L).toDF("k"))
    // simulate a session without the extension by asking the TABLE for a
    // scan builder directly (unapplied)
    val table = new graft.sources.GraftBatchTable(
      spark, s"$root/v0", rootPath = Some(root))
    val e = intercept[IllegalStateException] {
      table.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    }
    assert(e.getMessage.contains("tombstones"))
  }

  test("tombstone delete on an EMPTY table keeps the table readable") {
    val root = freshRoot()
    MutableParquetTable.commitEmpty(s"$root/base", "k",
      new org.apache.spark.sql.types.StructType()
        .add("k", org.apache.spark.sql.types.LongType)
        .add("v", org.apache.spark.sql.types.LongType))
    val t = GraftTable(spark, root, "k")
    t.deleteKeys(Seq(5L).toDF("k")) // subtracts nothing — must not brick
    assert(t.read().isEmpty, "empty minus tombstones is empty")
    assert(spark.read.format("graft").load(root).isEmpty,
      "the V2 relation reads the tombstoned empty table")
    // the chain continues: an insert of the tombstoned key lands (upsert
    // resurrects) and subtracts the sidecar
    t.commit(Seq((5L, 50L, "upsert")).toDF("k", "v", "op"))
    val got = t.read().collect()
    assert(got.length === 1 && got.head.getLong(1) === 50L)
    assert(spark.read.format("graft").load(root).count() === 1)
  }

  private def listSnapshotFiles(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_")).toList
    finally s.close()
  }
}
