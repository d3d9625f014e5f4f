package graft

import org.apache.spark.sql.functions._

import graft.sources.MutableParquetTable
import graft.streaming.CdcMergeSink

/** SQL `CALL` table maintenance ([[graft.sources.GraftProcedures]]):
  * history / vacuum / compact / zorder driven purely through SQL, with
  * the identity (composite keys) and layout metadata (dim zone maps)
  * surviving every maintenance commit. */
class SqlProcedureSpec extends SparkSpec {

  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft-wh-proc").toString
    spark.conf.set("spark.sql.catalog.gp", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gp.root", w)
    w
  }

  private def mk(table: String, rows: Int = 200): Unit = {
    spark.sql(s"""CREATE TABLE gp.ns.$table (id BIGINT, grp BIGINT, v BIGINT)
                  USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql(s"INSERT INTO gp.ns.$table SELECT id, id % 7, id * 10 FROM range(0, $rows)")
  }

  test("history reports base + per-version files/rows/bytes") {
    warehouse; mk("h1")
    spark.sql("INSERT INTO gp.ns.h1 VALUES (500, 3, 0)")
    val h = spark.sql("CALL gp.system.history(table => 'ns.h1')")
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(-1L, 0L, 1L))
    // CREATE TABLE commits an EMPTY base (zero files by design)
    assert(h.head.getInt(2) === 0)
    assert(h.drop(1).forall(_.getInt(2) > 0), "committed versions list files")
    assert(h.map(_.getLong(3)).toSeq === Seq(0L, 200L, 201L))
    assert(h.last.getLong(4) > 0, "bytes resolve through manifest entries")
  }

  test("SHOW PROCEDURES lists the maintenance surface; unknown names fail") {
    warehouse
    val names = spark.sql("SHOW PROCEDURES IN gp.system")
      .select("procedure_name").collect().map(_.getString(0)).toSet
    assert(Set("history", "vacuum", "compact", "zorder", "repair_feed",
      "materialize_tombstones").subsetOf(names))
    val e = intercept[Exception] {
      spark.sql("CALL gp.system.nope(table => 'ns.x')").collect()
    }
    assert(e.getMessage.contains("nope"))
  }

  test("repair_feed recomputes a missing feed; the result equals the live diff") {
    warehouse
    import spark.implicits._
    spark.sql("""CREATE TABLE gp.ns.rf (id BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("INSERT INTO gp.ns.rf SELECT id, id FROM range(0, 30)")
    spark.sql("INSERT INTO gp.ns.rf VALUES (5, -5), (40, 40)")
    val dir = s"${spark.conf.get("spark.sql.catalog.gp.root")}/ns/rf"
    // plain INSERTs persist no feed; repair_feed backfills v1's diff
    val rep = spark.sql(
      "CALL gp.system.repair_feed(table => 'ns.rf', version => 1)").head()
    assert(rep.getLong(0) === 1L && rep.getLong(1) === 2L)
    val feed = spark.read.parquet(s"$dir/_changes/v1")
      .select(col("id"), col("change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(feed === Seq((5L, "update"), (40L, "insert")))
  }

  test("vacuum drops old versions and keeps the latest readable") {
    warehouse; mk("v1")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO gp.ns.v1 VALUES (${1000 + i}, 0, $i)"))
    val dropped = spark.sql(
      "CALL gp.system.vacuum(table => 'ns.v1', keep_last => 2)")
      .collect().map(_.getLong(0)).toSeq
    assert(dropped === Seq(0L, 1L))
    assert(spark.sql("SELECT count(*) FROM gp.ns.v1").head().getLong(0) === 203)
    // pre-history versions resolve to the base (readAsOf semantics) —
    // for a catalog table the base is the empty CREATE TABLE snapshot
    assert(spark.sql("SELECT count(*) FROM gp.ns.v1 VERSION AS OF 0")
      .head().getLong(0) === 0)
  }

  test("vacuum retain_hours: time-based retention through SQL") {
    warehouse; mk("vr")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO gp.ns.vr VALUES (${1000 + i}, 0, $i)"))
    val dir = s"$warehouse/ns/vr"
    // age v0 out of a 24h window; v1/v2 stay current
    val p = java.nio.file.Paths.get(s"$dir/v0", "_manifest.json")
    val aged = java.nio.file.Files.readString(p).replaceFirst(
      "\"committedAtMs\":\\d+",
      s""""committedAtMs":${System.currentTimeMillis() - 48L * 3600 * 1000}""")
    java.nio.file.Files.writeString(p, aged)
    val dropped = spark.sql(
      "CALL gp.system.vacuum(table => 'ns.vr', keep_last => 1, retain_hours => 24)")
      .collect().map(_.getLong(0)).toSeq
    assert(dropped === Seq(0L))
    assert(spark.sql("SELECT count(*) FROM gp.ns.vr").head().getLong(0) === 203)
  }

  test("compact folds files as the next version; rows and identity survive") {
    warehouse
    // path/name interop: build a deliberately fragmented table with the
    // Scala facade INSIDE the warehouse, then maintain it by name
    val src = spark.range(0, 200)
      .selectExpr("id % 4 AS d", "id DIV 4 AS u", "id AS v")
    graft.GraftTable.create(src, s"$warehouse/ns/c1", "d", numFiles = 4,
      moreKeys = Seq("u"))
    val before = spark.sql("SELECT * FROM gp.ns.c1").collect().toSet
    val r = spark.sql(
      "CALL gp.system.compact(table => 'ns.c1', target_mb => 64)").head()
    assert(r.getInt(2) < r.getInt(1), "compaction folded files")
    val dir = s"$warehouse/ns/c1"
    val latest = CdcMergeSink.latestSnapshot(dir)
    assert(latest.endsWith(s"/v${r.getLong(0)}"))
    // composite identity survives the maintenance commit
    assert(MutableParquetTable.manifestMoreKeys(latest) === Seq("u"))
    assert(spark.sql("SELECT * FROM gp.ns.c1").collect().toSet === before)
    // a tuple-keyed merge after compaction touches exactly one row
    spark.sql("UPDATE gp.ns.c1 SET v = -1 WHERE d = 2 AND u = 10")
    val got = spark.sql("SELECT v FROM gp.ns.c1 WHERE u = 10 ORDER BY d")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(40L, 41L, -1L, 43L))
  }

  test("zorder re-clusters with dim zone maps; later merges stay correct") {
    warehouse
    spark.sql("""CREATE TABLE gp.ns.z1 (id BIGINT, x BIGINT, y BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("""INSERT INTO gp.ns.z1
                 SELECT id, id % 61, (id * 17) % 53 FROM range(0, 3000)""")
    val before = spark.sql("SELECT * FROM gp.ns.z1").collect().toSet
    val r = spark.sql(
      """CALL gp.system.zorder(table => 'ns.z1', dims => 'x,y',
              target_files => 8)""").head()
    assert(r.getString(2) === "x,y")
    val dir = s"$warehouse/ns/z1"
    val latest = CdcMergeSink.latestSnapshot(dir)
    assert(latest.endsWith(s"/v${r.getLong(0)}"))
    // rows unchanged, dim zone maps attached for both curve dims
    assert(spark.sql("SELECT * FROM gp.ns.z1").collect().toSet === before)
    val dimRanges = MutableParquetTable.manifestDimRanges(latest)
    assert(Set("x", "y").subsetOf(dimRanges.keySet))
    // the z-layout's per-file KEY ranges overlap — merges must still
    // route correctly (range intersection marks every holder dirty)
    spark.sql("UPDATE gp.ns.z1 SET y = -1 WHERE id % 293 = 0")
    spark.sql("DELETE FROM gp.ns.z1 WHERE id % 307 = 0")
    val expect = before.map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
      .filter(_._1 % 307 != 0)
      .map { case (id, x, y) => (id, x, if (id % 293 == 0) -1L else y) }
    val got = spark.sql("SELECT * FROM gp.ns.z1").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
    assert(got === expect)
  }

  test("materialize_tombstones folds the sidecar from pure SQL") {
    warehouse; mk("mt1")
    import spark.implicits._
    val root = s"$warehouse/ns/mt1"
    GraftTable(spark, root, "id").deleteKeys(Seq(3L, 77L, 150L).toDF("id"))
    // history shows the sidecar on the tombstone version
    val h = spark.sql("CALL gp.system.history(table => 'ns.mt1')")
    assert(h.columns.contains("version"))
    assert(spark.sql("SELECT tombstones FROM gp.ns.mt1.history " +
      "ORDER BY version DESC LIMIT 1").head().getLong(0) === 3L)
    val r = spark.sql(
      "CALL gp.system.materialize_tombstones(table => 'ns.mt1')").head()
    assert(r.getLong(1) === 3L, "folded count")
    assert(MutableParquetTable.manifestTombstoneRows(
      CdcMergeSink.latestSnapshot(root)) === 0L)
    assert(spark.sql("SELECT count(*) FROM gp.ns.mt1").head().getLong(0)
      === 197L)
    // idempotent: a second call is a no-op at the same version
    val r2 = spark.sql(
      "CALL gp.system.materialize_tombstones(table => 'ns.mt1')").head()
    assert(r2.getLong(0) === r.getLong(0) && r2.getLong(1) === 0L)
  }

  test("rebuild_index flips a dedup index between layouts as a maintenance commit") {
    warehouse
    val s = spark; import s.implicits._
    val baseText = "the quick brown fox jumps over the lazy dog near the " +
      "river bank while birds sing in the morning light and the wind " +
      "moves through tall grass"
    val docs = Seq(
      (0L, baseText),
      (1L, baseText),                          // exact dup of 0
      (2L, baseText.replace("quick", "slow")), // near dup of 0
      (3L, "completely different content about spark query engines and " +
        "columnar storage formats with vectorized execution")
    ).toDF("doc_id", "text")
    val oldDocs = docs.where(col("doc_id") < 2)
    val newDocs = docs.where(col("doc_id") >= 2)
    val root = s"$warehouse/idx/mh"
    // seed in the default ingest layout: no dim zone maps
    graft.operators.Dedup.dedupIncremental(root, oldDocs, "text", "doc_id",
      bands = 16, rowsPerBand = 2)
    assert(MutableParquetTable
      .manifestDimRanges(CdcMergeSink.latestSnapshot(root)).isEmpty)
    val probe = () => graft.operators.Dedup.dedupIncremental(root, newDocs,
      "text", "doc_id", bands = 16, rowsPerBand = 2, extendIndex = false)
      .pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probe()
    assert(before.contains((0L, 2L)), "near dup must surface pre-rebuild")

    // flip to the probe layout through pure SQL
    // the seed ingest is the table's `base`, so the rebuild commits v0
    val r = spark.sql("CALL gp.system.rebuild_index(" +
      "table => 'idx.mh', layout => 'probe')").head()
    assert(r.getLong(0) === 0L && r.getString(1) === "probe")
    assert(r.getInt(2) > 0, "relaid version lists files")
    val dims = MutableParquetTable
      .manifestDimRanges(CdcMergeSink.latestSnapshot(root)).keySet
    assert(dims.intersect(Set("band", "bucket")) === Set("band", "bucket"),
      "probe layout must attach dim zone maps on (band, bucket)")
    assert(probe() === before, "probe results are layout-independent")

    // and back: the physical rewrite sheds the dim maps
    val r2 = spark.sql("CALL gp.system.rebuild_index(" +
      "table => 'idx.mh', layout => 'ingest')").head()
    assert(r2.getLong(0) === 1L && r2.getString(1) === "ingest")
    assert(MutableParquetTable
      .manifestDimRanges(CdcMergeSink.latestSnapshot(root)).isEmpty,
      "ingest layout carries no dim maps")
    assert(probe() === before)
    // time travel keeps the pre-rebuild layout readable
    assert(spark.read.format("graft").option("version", 0)
      .load(root).count() ===
      spark.read.format("graft").load(root).count())

    val e = intercept[Exception] {
      spark.sql("CALL gp.system.rebuild_index(" +
        "table => 'idx.mh', layout => 'zorder')").collect()
    }
    assert(e.getMessage.contains("probe"))
  }

  test("diff_versions summarizes per-key changes between any versions") {
    warehouse; mk("dv", rows = 100)                                 // v0
    spark.sql("UPDATE gp.ns.dv SET v = v + 1 WHERE id % 10 = 0")    // v1
    spark.sql("DELETE FROM gp.ns.dv WHERE id % 25 = 3")             // v2
    spark.sql("INSERT INTO gp.ns.dv VALUES (900, 1, 1), (901, 1, 1)") // v3
    val d = spark.sql(
        "CALL gp.system.diff_versions(table => 'ns.dv', v_old => 0, v_new => 3)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d("added") === 2L)
    assert(d("removed") === 4L)   // ids 3, 28, 53, 78
    assert(d("updated") === 10L)  // ids 0, 10, ..., 90
    assert(d("unchanged") === 100L - 10L - 4L)
    // identical endpoints diff clean
    val same = spark.sql(
        "CALL gp.system.diff_versions(table => 'ns.dv', v_old => 3, v_new => 3)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(same === Map("unchanged" -> 98L))
  }

  test("graph procedures: pagerank/connected_components/scc write " +
      "result tables an orchestrator can read back") {
    warehouse
    // a directed edge table: two 3-cycles joined by a one-way bridge +
    // a feeder — the GraphSpec SCC fixture, through pure SQL
    spark.sql("""CREATE TABLE gp.ns.edges (eid BIGINT, s BIGINT, d BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'eid')""")
    spark.sql("INSERT INTO gp.ns.edges VALUES (1,1,2),(2,2,3),(3,3,1)," +
      "(4,4,5),(5,5,6),(6,6,4),(7,3,4),(8,7,1)")
    val cc = spark.sql("CALL gp.system.connected_components(" +
      "table => 'ns.edges', result => 'ns.cc_out', src => 's', " +
      "dst => 'd')").head()
    assert(cc.getLong(1) === 7L)
    val ccRows = spark.sql("SELECT * FROM gp.ns.cc_out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccRows.values.toSet === Set(1L), "one weak component")
    val scc = spark.sql("CALL gp.system.scc(table => 'ns.edges', " +
      "result => 'ns.scc_out', src => 's', dst => 'd')").head()
    assert(scc.getLong(1) === 7L)
    val sccRows = spark.sql("SELECT * FROM gp.ns.scc_out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sccRows === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L))
    val pr = spark.sql("CALL gp.system.pagerank(table => 'ns.edges', " +
      "result => 'ns.pr_out', src => 's', dst => 'd', iterations => 3)")
      .head()
    assert(pr.getLong(1) === 7L)
    val prRows = spark.sql("SELECT * FROM gp.ns.pr_out").collect()
    assert(prRows.length === 7 && prRows.forall(_.getLong(1) > 0L))
    // the result is a real catalog table: maintenance procedures apply
    val h = spark.sql("CALL gp.system.history(table => 'ns.scc_out')")
      .collect()
    assert(h.nonEmpty)
    // an existing target refuses instead of clobbering
    val e = intercept[Exception] {
      spark.sql("CALL gp.system.scc(table => 'ns.edges', " +
        "result => 'ns.scc_out', src => 's', dst => 'd')").collect()
    }
    assert(e.getMessage.contains("already exists"))
  }
}
