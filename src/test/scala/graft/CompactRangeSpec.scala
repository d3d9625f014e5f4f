package graft

import org.apache.spark.sql.functions._

import graft.sources.MutableParquetTable

/** Range-scoped compaction: only the files intersecting [lo, hi] fold;
  * everything else passes through metadata-only — the maintenance shape
  * for a write-hot key range on a big table. */
class CompactRangeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-rc").toString

  /** 8-file table over keys 0..799, then a point merge that fragments
    * the low range (files 0-1 rewritten into small pieces). */
  private def seed(root: String): GraftTable = {
    val df = spark.range(0, 800).select(col("id").as("k"),
      (col("id") % 97).as("v"))
    val t = GraftTable.create(df, root, "k", numFiles = 8)
    // two point merges fragment the low range: each rewrites its dirty
    // file into a slice, leaving small files only below k=200
    t.commit(spark.range(5, 6).select(col("id").as("k"), lit(1L).as("v"),
      lit("upsert").as("op")))
    t.commit(spark.range(150, 151).select(col("id").as("k"),
      lit(2L).as("v"), lit("upsert").as("op")))
    t
  }

  test("folds only the selected range; clean files pass through by name; data exact") {
    val root = freshRoot()
    val t = seed(root)
    val latest = graft.streaming.CdcMergeSink.latestSnapshot(root)
    val beforeNames = MutableParquetTable.manifestFileNames(latest).get.toSet
    val beforeCount = beforeNames.size
    val v = t.compactRange(0L, 199L, 1L << 30) // fold the low range into 1
    val vd = s"$root/v$v"
    val afterNames = MutableParquetTable.manifestFileNames(vd).get.toSet
    // the fold produced strictly fewer files and exactly the spliced one
    // is new (rc- prefix); every out-of-range file survives UNDER ITS
    // OWN NAME (metadata passthrough, not a rewrite)
    assert(afterNames.size < beforeCount)
    val newOnes = afterNames.diff(beforeNames)
    assert(newOnes.nonEmpty && newOnes.forall(n =>
      n.split('/').last.startsWith("rc-")), s"unexpected new names $newOnes")
    val survivors = afterNames.intersect(beforeNames)
    assert(survivors.nonEmpty, "out-of-range files must carry through")
    // rows exact, including both point merges
    val now = t.read()
    assert(now.count() === 800)
    assert(now.where(col("k") === 5L).head().getLong(1) === 1L)
    assert(now.where(col("k") === 150L).head().getLong(1) === 2L)
    assert(now.agg(sum(col("v"))).head().getLong(0) ===
      (0L until 800L).map(_ % 97).sum - 5 + 1 - (150 % 97) + 2)
    // time travel intact, and the next merge routes through the new map
    assert(MutableParquetTable.readCommitted(spark, latest).count() === 800)
    t.commit(spark.range(42, 43).select(col("id").as("k"), lit(9L).as("v"),
      lit("upsert").as("op")))
    assert(t.read().where(col("k") === 42L).head().getLong(1) === 9L)
  }

  test("empty selection is a no-op; guards: bucketed and tombstoned refuse") {
    val root = freshRoot()
    val t = seed(root)
    val cur = t.versions.last
    assert(t.compactRange(100000L, 200000L, 1L << 20) === cur,
      "a range selecting nothing must not commit a version")
    assert(t.versions.last === cur)

    val broot = freshRoot()
    val df = spark.range(0, 100).select(col("id").as("k"), col("id").as("v"))
    val bt = GraftTable.create(df, broot, "k", numFiles = 4,
      buckets = Some(4))
    intercept[IllegalArgumentException] {
      bt.compactRange(0L, 10L, 1L << 20)
    }

    val troot = freshRoot()
    val tt = seed(troot)
    tt.deleteKeys(spark.range(10, 12).select(col("id").as("k")))
    intercept[IllegalArgumentException] {
      tt.compactRange(0L, 199L, 1L << 20)
    }
  }

  test("live DROP marker: scoped purge keeps the blocklist; full-range purge clears it") {
    val root = freshRoot()
    val t = seed(root)
    // merge schema evolution adds `extra`; a partial upsert leaves
    // pre-evolution files physically without it (and post-drop, some
    // files physically WITH it)
    t.commit(spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 97).as("v"), col("id").as("extra"),
      lit("upsert").as("op")))
    t.dropColumn("extra")
    // scoped: files outside [0,199] still carry the dropped bytes — the
    // blocklist must survive this commit
    val v1 = t.compactRange(0L, 199L, 1L << 30)
    assert(MutableParquetTable.manifestDroppedColumns(s"$root/v$v1")
      === Seq("extra"))
    // the scoped outputs decoded through the LOGICAL schema: no `extra`
    // physically in the rc- files
    val rcFiles = MutableParquetTable.manifestFileNames(s"$root/v$v1").get
      .filter(_.split('/').last.startsWith("rc-"))
      .map(n => MutableParquetTable.resolvePath(s"$root/v$v1", n))
    rcFiles.foreach(f => assert(
      !spark.read.parquet(f).schema.fieldNames.contains("extra"),
      s"$f must not carry dropped bytes"))
    // full-range: every pre-drop file rewritten → survivors rule clears
    val v2 = t.compactRange(Long.MinValue, Long.MaxValue, 1L << 30)
    assert(MutableParquetTable.manifestDroppedColumns(s"$root/v$v2").isEmpty,
      "no pre-drop file survives a full-range purge")
    assert(t.read().count() === 800)
  }

  test("SQL surface: CALL system.compact_range coerces bounds through the key type") {
    val w = java.nio.file.Files.createTempDirectory("graft-rc-cat").toString
    spark.conf.set("spark.sql.catalog.rc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rc.root", w)
    spark.sql("""CREATE TABLE rc.ns.t (k BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key' = 'k')""")
    spark.sql("INSERT INTO rc.ns.t SELECT id, id % 7 FROM range(0, 400)")
    spark.sql("UPDATE rc.ns.t SET v = 99 WHERE k = 3")
    val before = spark.sql("SELECT sum(v) AS s FROM rc.ns.t").head().getLong(0)
    val res = spark.sql(
      "CALL rc.system.compact_range('ns.t', '0', '50', 1024)").collect()
    assert(res.length === 1)
    assert(spark.sql("SELECT sum(v) AS s FROM rc.ns.t").head().getLong(0)
      === before)
    assert(spark.sql("SELECT v FROM rc.ns.t WHERE k = 3").head().getLong(0)
      === 99L)
  }
}
