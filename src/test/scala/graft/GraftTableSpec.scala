package graft

import org.apache.spark.sql.functions._

/** The versioned-table facade end to end: create, commit, time travel,
  * change feed, materialized view, vacuum. */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  test("manifests record per-file bytes; carried entries inherit with zero stat calls") {
    import graft.sources.MutableParquetTable
    val root = java.nio.file.Files.createTempDirectory("graft-bytes").toString
    val t = GraftTable.create(
      spark.range(0, 100).select(col("id"), (col("id") * 2).as("v")),
      root, "id", numFiles = 4)
    def actualSizes(dir: String): Map[String, Long] =
      MutableParquetTable.manifestFileNames(dir).get.map { n =>
        val p = java.nio.file.Paths.get(
          MutableParquetTable.resolvePath(dir, n))
        p.getFileName.toString -> java.nio.file.Files.size(p)
      }.toMap
    assert(MutableParquetTable.manifestBytesByName(s"$root/base") ===
      actualSizes(s"$root/base"))

    // a merge: 3 carried entries inherit the recorded size, the
    // rewritten file stats once — every entry sized, all exact
    t.commit(Seq((7L, 700L, "upsert")).toDF("id", "v", "op"))
    val v0 = MutableParquetTable.manifestBytesByName(s"$root/v0")
    assert(v0.size === 4)
    assert(v0 === actualSizes(s"$root/v0"))

    // metadata-only commits carry sizes through verbatim
    t.addCheck("v_any", "v IS NOT NULL OR v IS NULL")
    assert(MutableParquetTable.manifestBytesByName(s"$root/v1") === v0)
  }

  test("full lifecycle through the facade") {
    val root = java.nio.file.Files.createTempDirectory("graft-table").toString
    val t = GraftTable.create(
      spark.range(0, 100).select(col("id"),
        concat(lit("c"), (col("id") % 3).cast("string")).as("cat"),
        (col("id") * 2).cast("double").as("v")),
      root, "id", numFiles = 4)

    assert(t.versions.isEmpty)
    assert(t.read().count() === 100)

    val v0 = t.commit(Seq((7L, "c1", 700.0, "upsert"), (9L, "", 0.0, "delete"))
      .toDF("id", "cat", "v", "op"))
    assert(v0 === 0L)
    val v1 = t.commit(Seq((200L, "c2", 5.0, "upsert")).toDF("id", "cat", "v", "op"))
    assert(v1 === 1L)

    assert(t.read().count() === 100) // -1 delete +1 insert
    assert(t.readAsOf(0L).where(col("id") === 200L).isEmpty)
    assert(t.read().where(col("id") === 7L).head().getDouble(2) === 700.0)

    val feed = t.changeFeed(0L, 1L)
      .select(col("id"), col("change_type")).as[(Long, String)].collect()
    assert(feed === Array((200L, "insert")))

    // empty commit changes nothing and reports the current version
    assert(t.commit(Seq.empty[(Long, String, Double, String)]
      .toDF("id", "cat", "v", "op")) === 1L)
    assert(t.versions === Seq(0L, 1L))

    t.refreshAggView(Seq("cat"), Seq("v"))
    val view = t.readAggView().orderBy("cat").collect().map(_.toSeq)
    val full = t.read().groupBy("cat")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
      .orderBy("cat").collect().map(_.toSeq)
    assert(view.toSeq === full.toSeq)

    assert(t.vacuum(keepLast = 1) === Seq(0L))
    assert(t.versions === Seq(1L))
    assert(t.read().count() === 100)
  }

  test("restoreTo rolls back as a metadata-only commit, history intact") {
    val root = java.nio.file.Files.createTempDirectory("graft-restore").toString
    val t = GraftTable.create(
      (0L until 200L).map(i => (i, s"v$i")).toDF("id", "s"), root, "id",
      numFiles = 4)
    t.commit((0L until 200L by 10).map(i => (i, s"upd-$i", "upsert"))
      .toDF("id", "s", "op"))                                    // v0
    t.commit(Seq((7L, "", "delete"), (300L, "new", "upsert"))
      .toDF("id", "s", "op"))                                    // v1
    val stateV0 = t.readAsOf(0L).orderBy("id").collect()

    val v = t.restoreTo(0L)                                      // v2
    assert(v === 2L)
    // logical state is exactly v0 (the v1 delete undone, 300 gone)
    assert(t.read().orderBy("id").collect() === stateV0)
    assert(t.read().where(col("id") === 7L).count() === 1)
    assert(t.read().where(col("id") === 300L).isEmpty)

    // metadata-only: the restored snapshot holds no data files of its
    // own — every manifest entry is a reference into prior snapshots
    val dir = java.nio.file.Paths.get(s"$root/v2")
    val stream = java.nio.file.Files.list(dir)
    val local = try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toList
    } finally stream.close()
    assert(local.isEmpty, s"restore must not copy data files: $local")

    // history preserved: the undone v1 state is still time travelable
    assert(t.readAsOf(1L).where(col("id") === 300L).count() === 1)
    assert(t.readAsOf(1L).where(col("id") === 7L).isEmpty)

    // the chain continues: a merge on top of the restore routes and
    // commits normally (manifest zone maps survived the re-addressing)
    t.commit(Seq((7L, "post-restore", "upsert")).toDF("id", "s", "op")) // v3
    assert(t.read().where(col("id") === 7L).head().getString(1)
      === "post-restore")
    assert(t.read().count() === stateV0.length)

    // restore through the V2 source reads identically
    val viaSource = spark.read.format("graft").option("version", 2).load(root)
    assert(viaSource.orderBy("id").collect() === stateV0)

    // tombstoned state restores with its sidecar: delete via tombstone,
    // commit more, restore back to the tombstoned version
    t.deleteKeys(Seq(11L, 13L).toDF("id"))                       // v4
    val tombState = t.read().orderBy("id").collect()
    t.commit(Seq((11L, "back", "upsert")).toDF("id", "s", "op")) // v5
    val v6 = t.restoreTo(4L)
    assert(v6 === 6L)
    assert(t.read().orderBy("id").collect() === tombState)
    assert(t.read().where(col("id") === 11L).isEmpty)
  }

  test("restore re-addresses dim zone-map entries — dim pruning survives") {
    val root = java.nio.file.Files.createTempDirectory("graft-restore-dim").toString
    val t = GraftTable.create(
      spark.range(0, 1000).select(col("id"),
        (col("id") / 250).cast("long").as("d")),
      root, "id", numFiles = 4)
    graft.sources.MutableParquetTable.attachDimRanges(
      spark, s"$root/base", Seq("d"))
    val v = t.restoreTo(-1L) // v0: pure references into base
    assert(v === 0L)
    val snap = graft.streaming.CdcMergeSink.latestSnapshot(root)
    val dims = graft.sources.MutableParquetTable.manifestDimRanges(snap)
    assert(dims.get("d").exists(_.size === 4),
      s"restored manifest must carry the dim entries: ${dims.keySet}")
    dims("d").foreach(r =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(r.file)),
        s"dfile entry must re-address to a live file: ${r.file}"))
    // end-to-end: a dim point filter prunes through the restored manifest
    val g = spark.read.format("graft").load(root)
    g.select("id").collect()
    val full = graft.sources.GraftSource.lastScanFiles.size
    val got = g.where(col("d") === 0L).collect()
    assert(got.length === 250)
    assert(graft.sources.GraftSource.lastScanFiles.size < full,
      s"dim pruning must survive the restore: " +
        s"${graft.sources.GraftSource.lastScanFiles}")
  }

  test("time-based retention vacuum drops only out-of-window versions") {
    val root = java.nio.file.Files.createTempDirectory("graft-vacret").toString
    val t = GraftTable.create(
      (0L until 100L).map(i => (i, i)).toDF("id", "v"), root, "id",
      numFiles = 2)
    (1 to 3).foreach(i =>
      t.commit(Seq((i.toLong, i * 100L, "upsert")).toDF("id", "v", "op")))
    assert(t.versions === Seq(0L, 1L, 2L))
    // age v0 and v1 out of the window (commit times stay monotone)
    def age(v: Long, ms: Long): Unit = {
      val p = java.nio.file.Paths.get(s"$root/v$v", "_manifest.json")
      val m = java.nio.file.Files.readString(p)
        .replaceFirst("\"committedAtMs\":\\d+", s""""committedAtMs":$ms""")
      java.nio.file.Files.writeString(p, m)
    }
    val old = System.currentTimeMillis() - 10L * 24 * 3600 * 1000
    age(0L, old); age(1L, old + 1000)
    val dropped = t.vacuumRetain(7L * 24 * 3600 * 1000)
    assert(dropped === Seq(0L, 1L))
    assert(t.versions === Seq(2L))
    assert(t.read().where(col("id") === 3L).head().getLong(1) === 300L)
    // everything in-window: nothing to drop (minKeepLast floors at 1)
    assert(t.vacuumRetain(7L * 24 * 3600 * 1000).isEmpty)
    // zero retention still keeps minKeepLast
    assert(t.vacuumRetain(0L).isEmpty)
    assert(t.versions === Seq(2L))
  }

  test("bucketed compaction folds per bucket, layout and content intact") {
    val root = java.nio.file.Files.createTempDirectory("graft-bcompact").toString
    val base = (0L until 2000L).map(i => (i, i * 3)).toDF("k", "v")
    // small maxRecordsPerFile = several files PER BUCKET (the bucketed
    // writer otherwise lands one file per bucket task)
    val t = GraftTable.create(base, root, "k", numFiles = 0,
      layout = graft.sources.ParquetLayout(maxRecordsPerFile = Some(150)),
      buckets = Some(4))
    // a small merge: dirty buckets rewrite, clean buckets keep their
    // multi-file form — compaction must handle the mix
    t.commit(Seq((1L, -1L, "upsert"), (2L, -2L, "upsert"))
      .toDF("k", "v", "op"))
    val before = t.read().orderBy("k").collect()
    val filesBefore = graft.sources.MutableParquetTable.manifestFileNames(
      graft.streaming.CdcMergeSink.latestSnapshot(root)).get.size

    val v = t.compact(targetBytes = 512L * 1024 * 1024)
    val latest = s"$root/v$v"
    // content identical, bucket spec carried, every file bucket-encoded
    assert(t.read().orderBy("k").collect() === before)
    assert(graft.sources.MutableParquetTable.manifestBuckets(latest)
      === Some(4))
    val names = graft.sources.MutableParquetTable.manifestFileNames(latest)
      .get.map(e => e.substring(e.lastIndexOf('/') + 1))
    assert(names.nonEmpty && names.size < filesBefore,
      s"compaction should fold files: $filesBefore -> ${names.size}")
    assert(names.forall(n =>
      graft.sources.GraftBucket.bucketOfName(n).isDefined),
      s"outputs must keep the bucket encoding: $names")
    assert(names.flatMap(graft.sources.GraftBucket.bucketOfName).toSet
      === Set(0, 1, 2, 3))

    // the compacted table still merges (bucket routing unaffected)
    t.commit(Seq((1L, 999L, "upsert")).toDF("k", "v", "op"))
    assert(t.read().where(col("k") === 1L).head().getLong(1) === 999L)
  }

  test("cloneFrom: zero-copy shallow clone with independent lineage") {
    val work = java.nio.file.Files.createTempDirectory("graft-clone").toString
    val src = GraftTable.create(
      (0L until 500L).map(i => (i, s"s$i")).toDF("id", "s"),
      s"$work/src", "id", numFiles = 4)
    src.commit(Seq((7L, "srcv0", "upsert")).toDF("id", "s", "op"))
    val srcState = src.read().orderBy("id").collect()

    val dst = GraftTable.cloneFrom(spark, s"$work/src", s"$work/dst")
    // identical content, ZERO local data files (manifest references only)
    assert(dst.read().orderBy("id").collect() === srcState)
    val ls = java.nio.file.Files.list(java.nio.file.Paths.get(s"$work/dst/base"))
    val local = try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.count(_.toString.endsWith(".parquet"))
    } finally ls.close()
    assert(local === 0, "clone must not copy data files")

    // diverge: a merge on the clone neither touches nor is seen by the
    // source, and vice versa
    dst.commit(Seq((7L, "dstv0", "upsert"), (900L, "new", "upsert"))
      .toDF("id", "s", "op"))
    src.commit(Seq((8L, "srcv1", "upsert")).toDF("id", "s", "op"))
    assert(dst.read().where(col("id") === 7L).head().getString(1) === "dstv0")
    assert(dst.read().where(col("id") === 8L).head().getString(1) === "s8")
    assert(src.read().where(col("id") === 7L).head().getString(1) === "srcv0")
    assert(src.read().where(col("id") === 900L).isEmpty)

    // an occupied target refuses
    intercept[IllegalArgumentException] {
      GraftTable.cloneFrom(spark, s"$work/src", s"$work/dst")
    }
  }

  test("SQL: CALL system.clone creates a referencing catalog table") {
    val root = java.nio.file.Files.createTempDirectory("graft-clone-sql").toString
    spark.conf.set("spark.sql.catalog.gcl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcl.root", root)
    try {
      spark.sql("""CREATE TABLE gcl.ns.src (id BIGINT, v BIGINT)
                   USING graft TBLPROPERTIES ('key' = 'id')""")
      spark.sql("INSERT INTO gcl.ns.src SELECT id, id * 2 FROM range(0, 100)")
      val out = spark.sql("CALL gcl.system.clone('ns.src', 'ns.copy')")
        .collect()
      assert(out.head.getLong(2) === 100L)
      assert(spark.sql("SELECT count(*) FROM gcl.ns.copy").head().getLong(0)
        === 100L)
      spark.sql("INSERT INTO gcl.ns.copy VALUES (500, 1)")
      assert(spark.sql("SELECT count(*) FROM gcl.ns.copy").head().getLong(0)
        === 101L)
      assert(spark.sql("SELECT count(*) FROM gcl.ns.src").head().getLong(0)
        === 100L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gcl")
      spark.conf.unset("spark.sql.catalog.gcl.root")
    }
  }

  test("SQL: CALL system.restore rolls a catalog table back") {
    val root = java.nio.file.Files.createTempDirectory("graft-restore-sql").toString
    spark.conf.set("spark.sql.catalog.gres", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gres.root", root)
    try {
      spark.sql("""CREATE TABLE gres.ns.t (id BIGINT, s STRING)
                   USING graft TBLPROPERTIES ('key' = 'id')""")
      spark.sql("INSERT INTO gres.ns.t VALUES (1, 'a'), (2, 'b')") // v0
      spark.sql("INSERT INTO gres.ns.t VALUES (3, 'c')")           // v1
      val out = spark.sql("CALL gres.system.restore('ns.t', 0)").collect()
      assert(out.head.getLong(0) === 0L) // restored_to
      assert(out.head.getLong(1) === 2L) // new version
      assert(spark.sql("SELECT count(*) FROM gres.ns.t").head().getLong(0) === 2L)
      assert(spark.sql("SELECT * FROM gres.ns.t VERSION AS OF 1")
        .count() === 3L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gres")
      spark.conf.unset("spark.sql.catalog.gres.root")
    }
  }

  test("composite-key facade: create records the tuple, commits discover it") {
    val root = java.nio.file.Files.createTempDirectory("graft-table-ck").toString
    val t = GraftTable.create(
      spark.range(0, 60).select((col("id") % 6).as("g"),
        concat(lit("u"), (col("id") / 6).cast("long")).as("u"), col("id").as("v")),
      root, "g", numFiles = 3, moreKeys = Seq("u"))
    // tuple identity through a facade commit — no moreKeys at the call site
    import spark.implicits._
    t.commit(Seq((3L, "u2", -1L, "upsert"), (3L, "u5", 0L, "delete"))
      .toDF("g", "u", "v", "op"))
    val got = t.read().where(col("g") === 3).orderBy("u").collect()
    assert(got.length === 9)
    assert(got.find(_.getString(1) == "u2").get.getLong(2) === -1L)
    assert(!got.exists(_.getString(1) == "u5"))
    assert(got.find(_.getString(1) == "u1").get.getLong(2) === 9L)
  }

  test("compaction commits as a version: content identical, feed empty, range scan prunes") {
    val root = java.nio.file.Files.createTempDirectory("graft-table-c").toString
    val t = GraftTable.create(
      spark.range(0, 200).select(col("id"), (col("id") * 3).cast("double").as("v")),
      root, "id", numFiles = 8)
    t.commit(Seq((5L, 555.0, "upsert")).toDF("id", "v", "op"))
    val before = t.read().orderBy("id").collect().map(_.toSeq).toSeq

    val totalBytes = {
      import scala.jdk.CollectionConverters._
      val dir = graft.streaming.CdcMergeSink.latestSnapshot(root)
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum
      finally s.close()
    }
    val cv = t.compact(targetBytes = totalBytes / 2)
    assert(cv === 1L)
    assert(t.versions === Seq(0L, 1L))
    // identical content, fewer files
    assert(t.read().orderBy("id").collect().map(_.toSeq).toSeq === before)
    assert(graft.sources.MutableParquetTable
      .manifestFileNames(s"$root/v1").get.size < 8)
    // compaction changes no rows
    assert(t.changeFeed(0L, 1L).isEmpty)
    // manifest-pruned range scan touches a strict file subset
    val sub = t.readRange(10L, 20L)
    assert(sub.orderBy("id").select("id").as[Long].collect().toSeq ===
      (10L to 20L))
    assert(sub.inputFiles.length <
      graft.sources.MutableParquetTable.manifestFileNames(s"$root/v1").get.size
      || sub.inputFiles.length == 1)
  }

  test("commitWithFeed + changeFeedStream: commits arrive as exactly-once micro-batches") {
    val root = java.nio.file.Files.createTempDirectory("graft-cfs").toString
    val t = GraftTable.create(
      spark.range(0, 50).select(col("id"), (col("id") * 2).cast("double").as("v")),
      root, "id", numFiles = 2)
    val v0 = t.commitWithFeed(
      Seq((3L, -3.0, "upsert"), (10L, 0.0, "delete")).toDF("id", "v", "op"))
    assert(v0 === 0L)

    val q = t.changeFeedStream().writeStream
      .format("memory").queryName("graft_cfs").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got0 = spark.table("graft_cfs")
      val expect0 = t.changeFeed(-1L, 0L)
      assert(got0.count() === expect0.count())
      assert(got0.select(col("id"), col("change_type")).exceptAll(
        expect0.select(col("id"), col("change_type"))).isEmpty)
      assert(got0.select("_commit_version").distinct().head().getLong(0) === 0L)

      // a LATER commit arrives as a new micro-batch; earlier feed files
      // are not re-emitted (the file source's processed-file tracking)
      t.commitWithFeed(Seq((100L, 1.0, "upsert")).toDF("id", "v", "op"))
      q.processAllAvailable()
      val got1 = spark.table("graft_cfs")
      assert(got1.count() === expect0.count() + 1)
      val ins = got1.where(col("_commit_version") === 1L)
      assert(ins.count() === 1L)
      assert(ins.head().getAs[Long]("id") === 100L)
      assert(ins.head().getAs[String]("change_type") === "insert")

      // plain commit (no feed) leaves a gap, not a failure
      t.commit(Seq((101L, 2.0, "upsert")).toDF("id", "v", "op"))
      q.processAllAvailable()
      assert(spark.table("graft_cfs").count() === expect0.count() + 1)
    } finally q.stop()

    // vacuum drops the vacuumed versions' feed dirs with them
    t.commitWithFeed(Seq((102L, 3.0, "upsert")).toDF("id", "v", "op"))
    t.vacuum(keepLast = 1)
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$root/_changes/v0")))
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$root/_changes/v3")))
  }

  test("streaming attach maintains the table AND the view per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    implicit val ctx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-table-s").toString
    val t = GraftTable.create(
      spark.range(0, 60).select(col("id"),
        concat(lit("s"), (col("id") % 2).cast("string")).as("cat"),
        col("id").cast("double").as("v")),
      root, "id", numFiles = 2)

    val in = MemoryStream[(Long, String, Double, String)]
    val q = t.stream(in.toDF().toDF("id", "cat", "v", "op"),
      aggView = Some((Seq("cat"), Seq("v"))))
    try {
      in.addData((5L, "s1", 500.0, "upsert"), (6L, "", 0.0, "delete"))
      q.processAllAvailable()
      assert(t.versions === Seq(0L))
      // the view is already current — no explicit refresh call
      val view = t.readAggView().orderBy("cat").collect().map(_.toSeq).toSeq
      val full = t.read().groupBy("cat")
        .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
        .orderBy("cat").collect().map(_.toSeq).toSeq
      assert(view === full)

      in.addData((70L, "s0", 7.0, "upsert"))
      q.processAllAvailable()
      assert(t.readAggView().agg(sum(col("cnt"))).head().getLong(0) === 60L)
    } finally q.stop()
  }

  test("replicateTo: delta sync, watermark no-op, crash-idempotent re-apply") {
    val base = java.nio.file.Files.createTempDirectory("graft-repl").toString
    val df = (1L to 100L).map(i => (i, s"n$i", i * 10)).toDF("k", "name", "v")
    val src = GraftTable.create(df, s"$base/s", "k", numFiles = 4)
    val tgt = GraftTable.create(df, s"$base/t", "k", numFiles = 4)
    def snap(t: GraftTable) =
      t.read().orderBy("k").collect().toSeq
    src.commit(df.where(col("k") % 9 === 0)
      .withColumn("v", col("v") + 1).withColumn("op", lit("upsert")), "op")
    src.commit(df.where(col("k") % 4 === 0)
      .withColumn("op", lit("delete")), "op")
    assert(src.replicateTo(tgt).isDefined)
    assert(snap(tgt) === snap(src))
    // current target: sync is a watermark no-op, no empty commit
    val vBefore = tgt.versions.size
    assert(src.replicateTo(tgt).isEmpty)
    assert(tgt.versions.size === vBefore)
    // incremental: only the new delta applies
    src.commit(df.where(col("k") === 3L)
      .withColumn("name", lit("three")).withColumn("op", lit("upsert")), "op")
    assert(src.replicateTo(tgt).isDefined)
    assert(snap(tgt) === snap(src))
    // crash between apply and watermark write: re-applying the SAME net
    // feed converges (upserts overwrite equals, absent-key deletes no-op)
    GraftTable.writeReplicationWatermark(s"$base/t", s"$base/s", -1L)
    assert(src.replicateTo(tgt).isDefined)
    assert(snap(tgt) === snap(src))
    // self-replication refused
    intercept[IllegalArgumentException] { src.replicateTo(src) }
  }

  test("replicateStream: continuous replica via the persisted feed") {
    val base = java.nio.file.Files.createTempDirectory("graft-rs").toString
    val df = (1L to 50L).map(i => (i, i * 10)).toDF("k", "v")
    val src = GraftTable.create(df, s"$base/s", "k", numFiles = 2)
    GraftTable.create(df, s"$base/t", "k", numFiles = 2) // seeded replica
    src.commitWithFeed(df.where(col("k") % 5 === 0)
      .withColumn("v", col("v") + 1).withColumn("op", lit("upsert")), "op")
    val q = src.replicateStream(s"$base/t")
    try {
      q.processAllAvailable()
      val tgt = GraftTable(spark, s"$base/t", "k")
      def snap(t: GraftTable) = t.read().orderBy("k").collect().toSeq
      assert(snap(tgt) === snap(src))
      // keep flowing: a delete batch lands in the next micro-batch
      src.commitWithFeed(df.where(col("k") % 4 === 0)
        .withColumn("op", lit("delete")), "op")
      q.processAllAvailable()
      assert(snap(tgt) === snap(src))
      assert(tgt.read().count() === 50 - 12) // 12 multiples of 4 in 1..50
    } finally q.stop()
  }

  test("diffVersions: added/removed/updated/unchanged; evolution-safe") {
    val root = java.nio.file.Files.createTempDirectory("graft-diff").toString
    val df = (1L to 20L).map(i => (i, i * 10)).toDF("k", "v")
    val t = GraftTable.create(df, root, "k", numFiles = 2)
    t.commit(
      Seq((3L, 999L, "upsert"), (7L, 70L, "upsert"), // 7 -> identical values
        (5L, 0L, "delete"), (21L, 210L, "upsert"))
        .toDF("k", "v", "op")) // v0
    val d = t.diffVersions(-1L, 0L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d(3L) === "updated")
    assert(d(5L) === "removed")
    assert(d(21L) === "added")
    assert(d(7L) === "unchanged", "an upsert writing identical values is no change")
    assert(d(1L) === "unchanged")
    assert(d.size === 21)
    // a column added AFTER vOld (merge evolution) never flips
    // common-projection rows — k=1 keeps its v, gains only w
    t.commit(Seq((1L, 10L, 77L, "upsert")).toDF("k", "v", "w", "op")) // v1
    val d2 = t.diffVersions(0L, 1L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2.values.forall(_ == "unchanged"),
      s"schema-only evolution must diff clean, got ${d2.filter(_._2 != "unchanged")}")
  }
}
