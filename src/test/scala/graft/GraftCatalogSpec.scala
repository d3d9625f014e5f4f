package graft

import org.apache.spark.sql.functions._

/** Name-based table access: the graft TableCatalog + V2 write path.
  * CREATE TABLE / INSERT INTO / SELECT / VERSION AS OF / SQL DML / DROP
  * all by `graft.<ns>.<table>` name — no paths in user SQL. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft-warehouse-cat").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", w)
    w
  }

  test("CREATE TABLE / INSERT INTO / SELECT by name round-trips") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.t1 (id BIGINT, cat STRING, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    // empty table reads as empty with the declared schema
    val empty = spark.sql("SELECT * FROM graft.ns.t1")
    assert(empty.schema.fieldNames.toSeq === Seq("id", "cat", "v"))
    assert(empty.count() === 0)

    spark.sql("INSERT INTO graft.ns.t1 SELECT id, concat('c', id % 3), id * 10 FROM range(0, 50)")
    assert(spark.sql("SELECT count(*) FROM graft.ns.t1").head().getLong(0) === 50)

    // second insert upserts by key: overlapping ids replace, new append
    spark.sql("INSERT INTO graft.ns.t1 SELECT id, 'x', -1 FROM range(48, 52)")
    val got = spark.sql("SELECT * FROM graft.ns.t1 ORDER BY id").collect()
    assert(got.length === 52)
    assert(got(47).getString(1) === "c2" && got(48).getString(1) === "x")
  }

  test("VERSION AS OF time travel by name") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.t2 (id BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("INSERT INTO graft.ns.t2 SELECT id, id FROM range(0, 10)")
    spark.sql("INSERT INTO graft.ns.t2 VALUES (5, -5)")
    assert(spark.sql("SELECT v FROM graft.ns.t2 VERSION AS OF 0 WHERE id = 5")
      .head().getLong(0) === 5L)
    assert(spark.sql("SELECT v FROM graft.ns.t2 WHERE id = 5")
      .head().getLong(0) === -5L)
  }

  test("SQL DML by catalog name: MERGE INTO, UPDATE, DELETE") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.t3 (id BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("INSERT INTO graft.ns.t3 SELECT id, id * 2 FROM range(0, 30)")
    Seq((1L, 100L), (99L, 990L)).toDF("id", "nv").createOrReplaceTempView("catsrc")
    spark.sql("""MERGE INTO graft.ns.t3 t USING catsrc s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.nv
                 WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""")
    spark.sql("DELETE FROM graft.ns.t3 WHERE id = 2")
    spark.sql("UPDATE graft.ns.t3 SET v = 0 WHERE id = 3")
    val got = spark.sql("SELECT * FROM graft.ns.t3 ORDER BY id").collect()
    assert(got.length === 30) // +1 insert, -1 delete
    assert(got.find(_.getLong(0) == 1L).get.getLong(1) === 100L)
    assert(got.find(_.getLong(0) == 99L).get.getLong(1) === 990L)
    assert(!got.exists(_.getLong(0) == 2L))
    assert(got.find(_.getLong(0) == 3L).get.getLong(1) === 0L)
  }

  test("SHOW TABLES lists, DROP TABLE removes") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns2.d1 (id BIGINT) USING graft
                 TBLPROPERTIES ('key' = 'id')""")
    val listed = spark.sql("SHOW TABLES IN graft.ns2").collect().map(_.getString(1))
    assert(listed.contains("d1"))
    spark.sql("DROP TABLE graft.ns2.d1")
    assert(spark.sql("SHOW TABLES IN graft.ns2").collect().isEmpty)
  }

  test("composite-key table by name: tuple identity through INSERT and MERGE INTO") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.ck (d BIGINT, u STRING, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'd, u')""")
    spark.sql("""INSERT INTO graft.ns.ck
                 SELECT id % 10, concat('u', id DIV 10), id FROM range(0, 40)""")
    assert(spark.sql("SELECT count(*) FROM graft.ns.ck").head().getLong(0) === 40)
    // upsert ONE (d, u) tuple by a second insert: its date-sibling stays
    spark.sql("INSERT INTO graft.ns.ck VALUES (3, 'u1', -1)")
    val got = spark.sql("SELECT * FROM graft.ns.ck WHERE d = 3 ORDER BY u").collect()
    assert(got.length === 4)
    assert(got(1).getString(1) === "u1" && got(1).getLong(2) === -1L)
    assert(got(2).getString(1) === "u2" && got(2).getLong(2) != -1L)
    // MERGE INTO on the full tuple
    import spark.implicits._
    Seq((3L, "u2", 99L)).toDF("d", "u", "nv").createOrReplaceTempView("cksrc")
    spark.sql("""MERGE INTO graft.ns.ck t USING cksrc s
                 ON t.d = s.d AND t.u = s.u
                 WHEN MATCHED THEN UPDATE SET v = s.nv""")
    val after = spark.sql("SELECT * FROM graft.ns.ck WHERE d = 3 ORDER BY u").collect()
    assert(after(2).getLong(2) === 99L)
    assert(after(1).getLong(2) === -1L, "sibling tuple untouched")
    // changing a SECONDARY key column is rejected like the leading one
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.ns.ck SET u = 'moved' WHERE d = 3")
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("merge key")), s"unexpected: $e")
  }

  test("CREATE TABLE validation: key property required and must be a column") {
    warehouse
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.ns.bad1 (id BIGINT) USING graft")
    }
    intercept[Exception] {
      spark.sql("""CREATE TABLE graft.ns.bad2 (id BIGINT) USING graft
                   TBLPROPERTIES ('key' = 'nope')""")
    }
  }

  test("TIMESTAMP AS OF time travel resolves by manifest commit time") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.tt (id BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("INSERT INTO graft.ns.tt SELECT id, id FROM range(0, 10)")
    Thread.sleep(20)
    val mid = System.currentTimeMillis()
    Thread.sleep(20)
    spark.sql("INSERT INTO graft.ns.tt VALUES (5, -5), (100, 1)")
    // SQL surface: epoch-exact timestamp literal via timestamp_millis
    assert(spark.sql(
        s"SELECT count(*) FROM graft.ns.tt TIMESTAMP AS OF timestamp_millis(${mid}L)")
      .head().getLong(0) === 10L)
    assert(spark.sql(
        s"SELECT v FROM graft.ns.tt TIMESTAMP AS OF timestamp_millis(${mid}L) WHERE id = 5")
      .head().getLong(0) === 5L)
    // now() resolves to the latest state
    assert(spark.sql(
        "SELECT count(*) FROM graft.ns.tt TIMESTAMP AS OF current_timestamp()")
      .head().getLong(0) === 11L)
    // path surface: the same resolution through option("timestampAsOf")
    val dir = s"$warehouse/ns/tt"
    assert(spark.read.format("graft").option("timestampAsOf", mid.toString)
      .load(dir).count() === 10L)
    // a timestamp before the table existed is an error, not silent-empty
    val e = intercept[Exception] {
      spark.read.format("graft").option("timestampAsOf", "1000")
        .load(dir).count()
    }
    assert(e.getMessage.contains("predates"), s"unexpected: $e")
  }

  test("INSERT OVERWRITE replaces content; prior versions stay readable") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.ow (id BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("INSERT INTO graft.ns.ow SELECT id, id FROM range(0, 100)")
    spark.sql(
      "INSERT OVERWRITE graft.ns.ow SELECT id, id * 10 FROM range(50, 60)")
    val got = spark.sql("SELECT * FROM graft.ns.ow ORDER BY id").collect()
    assert(got.length === 10)
    assert(got.head.getLong(0) === 50L && got.head.getLong(1) === 500L)
    // the pre-overwrite version is still there — time travel is the undo
    assert(spark.sql("SELECT count(*) FROM graft.ns.ow VERSION AS OF 0")
      .head().getLong(0) === 100L)
    // the replaced layout is a first-class table state: a later upsert
    // merges against it exactly
    spark.sql("INSERT INTO graft.ns.ow VALUES (55, -1), (200, 2000)")
    val after = spark.sql("SELECT * FROM graft.ns.ow ORDER BY id").collect()
    assert(after.length === 11)
    assert(after.find(_.getLong(0) == 55L).get.getLong(1) === -1L)
    assert(after.find(_.getLong(0) == 200L).get.getLong(1) === 2000L)
  }

  test("INSERT OVERWRITE of an empty select truncates; TRUNCATE TABLE too") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.tr (id BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("INSERT INTO graft.ns.tr SELECT id, id FROM range(0, 20)")
    spark.sql(
      "INSERT OVERWRITE graft.ns.tr SELECT id, id FROM range(0, 5) WHERE id < 0")
    assert(spark.sql("SELECT count(*) FROM graft.ns.tr").head().getLong(0) === 0L)
    assert(spark.sql("SELECT * FROM graft.ns.tr").schema.fieldNames.toSeq
      === Seq("id", "v"), "truncate keeps the schema")
    // refill, then SQL TRUNCATE TABLE
    spark.sql("INSERT INTO graft.ns.tr SELECT id, -id FROM range(0, 7)")
    assert(spark.sql("SELECT count(*) FROM graft.ns.tr").head().getLong(0) === 7L)
    spark.sql("TRUNCATE TABLE graft.ns.tr")
    assert(spark.sql("SELECT count(*) FROM graft.ns.tr").head().getLong(0) === 0L)
    // table still merges after a truncate
    spark.sql("INSERT INTO graft.ns.tr VALUES (1, 10)")
    assert(spark.sql("SELECT v FROM graft.ns.tr WHERE id = 1")
      .head().getLong(0) === 10L)
  }

  test("path-based mode(overwrite) replaces through the same V2 write") {
    val root = java.nio.file.Files.createTempDirectory("graft-v2ow").toString
    GraftTable.create(
      spark.range(0, 40).select(col("id"), (col("id") * 2).as("v")),
      root, "id", numFiles = 2)
    spark.range(100, 110).select(col("id"), lit(7L).as("v"))
      .write.format("graft").mode("overwrite").save(root)
    val t = GraftTable(spark, root, "id")
    val got = t.read().orderBy("id").collect()
    assert(got.length === 10)
    assert(got.head.getLong(0) === 100L && got.head.getLong(1) === 7L)
    // replace commits a manifest-complete snapshot: zone-map reads work
    assert(t.readRange(102L, 104L).count() === 3)
  }

  test("ALTER TABLE ADD COLUMN is a metadata-only commit") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.ac (id BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("INSERT INTO graft.ns.ac SELECT id, id * 2 FROM range(0, 30)")
    spark.sql("ALTER TABLE graft.ns.ac ADD COLUMNS (tag STRING, w BIGINT)")
    // widened schema, existing rows read the new columns as null
    val got = spark.sql("SELECT * FROM graft.ns.ac ORDER BY id").collect()
    assert(got.head.schema.fieldNames.toSeq === Seq("id", "v", "tag", "w"))
    assert(got.forall(r => r.isNullAt(2) && r.isNullAt(3)))
    // the ALTER version owns ZERO data files — every entry is a reference
    val dir = s"$warehouse/ns/ac"
    val alterDir = s"$dir/v${GraftTable(spark, dir, "id").versions.last}"
    val owned = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(alterDir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.toString.endsWith(".parquet"))
      } finally s.close()
    }
    assert(owned === 0, "ALTER must not copy or link any data file")
    // DML can now fill the new columns; pre-alter time travel still works
    spark.sql("UPDATE graft.ns.ac SET tag = 'hot', w = v * 10 WHERE id < 3")
    val hot = spark.sql(
      "SELECT * FROM graft.ns.ac WHERE tag = 'hot' ORDER BY id").collect()
    assert(hot.length === 3 && hot.head.getLong(3) === 0L &&
      hot.last.getLong(3) === 40L)
    assert(spark.sql("SELECT * FROM graft.ns.ac VERSION AS OF 0")
      .schema.fieldNames.toSeq === Seq("id", "v"))
    // RENAME COLUMN is a metadata-only commit now (RenameColumnSpec owns
    // that surface); retype alters stay rejected
    spark.sql("ALTER TABLE graft.ns.ac RENAME COLUMN v TO v2")
    assert(spark.sql("SELECT * FROM graft.ns.ac ORDER BY id")
      .schema.fieldNames.toSeq === Seq("id", "v2", "tag", "w"))
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ns.ac ALTER COLUMN v2 TYPE STRING")
    }
  }

  test("INSERT OVERWRITE publishes the query's own ordered output directly") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.ov (k BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'k')""")
    spark.sql("INSERT INTO graft.ns.ov SELECT id, id * 2 FROM range(0, 1000)")
    OptimisticCommit.lastReplaceDirect = false
    // an UNSORTED source: the write's declared ordered distribution must
    // range-partition + sort it, and the staged files publish as-is —
    // one materialization, no second re-read/re-sort pass
    spark.sql("""INSERT OVERWRITE graft.ns.ov
                 SELECT id AS k, id * 3 AS v FROM range(0, 500)
                 WHERE id % 2 = 0""")
    assert(OptimisticCommit.lastReplaceDirect,
      "ordered staged files must publish directly")
    val got = spark.sql("SELECT * FROM graft.ns.ov ORDER BY k").collect()
    assert(got.length === 250)
    assert(got.forall(r => r.getLong(1) === r.getLong(0) * 3))

    // the direct-committed snapshot is a full citizen: manifest-ranged,
    // disjoint, sized — and the next merge routes on it normally
    val dir = graft.streaming.CdcMergeSink.latestSnapshot(
      s"$warehouse/ns/ov")
    val ranges = graft.sources.MutableParquetTable
      .manifestRanges(dir, "k").get
    assert(ranges.nonEmpty)
    val sorted = ranges.sortBy(_.minBytes)(graft.sources.KeyBytes.ordering)
    sorted.iterator.zip(sorted.iterator.drop(1)).foreach { case (a, b) =>
      assert(graft.sources.KeyBytes.compare(b.minBytes, a.maxBytes) > 0,
        "direct-committed files must be key-disjoint")
    }
    val bytes = graft.sources.MutableParquetTable.manifestBytesByName(dir)
    assert(ranges.forall(r => bytes.contains(r.file.split('/').last)))
    spark.sql("INSERT INTO graft.ns.ov VALUES (4, -1)")
    assert(spark.sql("SELECT v FROM graft.ns.ov WHERE k = 4")
      .head().getLong(0) === -1L)
    assert(spark.sql("SELECT count(*) FROM graft.ns.ov").head().getLong(0)
      === 250)
  }

  test("first INSERT into an empty table publishes directly; duplicates fall back to the collapsing merge") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.fi (k BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'k')""")
    OptimisticCommit.lastReplaceDirect = false
    spark.sql("INSERT INTO graft.ns.fi SELECT id, id * 2 FROM range(0, 1000)")
    assert(OptimisticCommit.lastReplaceDirect,
      "the first load of an empty table must publish its ordered " +
        "staged files directly (no repartition(1) funnel, no re-sort)")
    assert(spark.sql("SELECT count(*) FROM graft.ns.fi").head().getLong(0)
      === 1000)
    // the direct snapshot merges normally afterwards
    spark.sql("INSERT INTO graft.ns.fi VALUES (5, -1)")
    assert(spark.sql("SELECT v FROM graft.ns.fi WHERE k = 5")
      .head().getLong(0) === -1L)

    // duplicate keys in the first load are OUT-OF-CONTRACT data; the
    // merge path passes them through un-collapsed (no seqColumn), and
    // the direct path must preserve exactly that
    spark.sql("""CREATE TABLE graft.ns.fd (k BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'k')""")
    spark.sql("""INSERT INTO graft.ns.fd
                 SELECT id % 10 AS k, id AS v FROM range(0, 100)""")
    assert(spark.sql("SELECT count(*) FROM graft.ns.fd").head().getLong(0)
      === 100, "duplicates pass through, same as the merge path")
  }

  test("ALTER after zorder: dim zone maps re-address and still prune") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.az (id BIGINT, a BIGINT, b BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("""INSERT INTO graft.ns.az
                 SELECT id, id % 100, (id * 7) % 100 FROM range(0, 20000)""")
    spark.sql("""CALL graft.system.zorder(table => 'ns.az',
                 dims => 'a,b', target_files => 8)""")
    spark.sql("ALTER TABLE graft.ns.az ADD COLUMNS (note STRING)")
    // dim pruning survives the metadata-only commit: a selective filter
    // on a curve dimension reads fewer files than the table holds
    val n = spark.sql(
      "SELECT count(*) FROM graft.ns.az WHERE a = 3").head().getLong(0)
    assert(n === 200L)
    val planned = graft.sources.GraftSource.lastScanFiles.size
    assert(planned > 0 && planned < 8,
      s"dim zone maps must still prune after ALTER (planned $planned/8)")
    // and the referenced files resolve — full scan is intact
    assert(spark.sql("SELECT count(*) FROM graft.ns.az").head().getLong(0)
      === 20000L)
  }

  test("metadata tables by name: history audits versions, files shows the inventory") {
    warehouse
    spark.sql("""CREATE TABLE graft.ns.meta1 (id BIGINT, v BIGINT)
                 USING graft TBLPROPERTIES ('key' = 'id')""")
    spark.sql("INSERT INTO graft.ns.meta1 SELECT id, id FROM range(0, 100)")
    spark.sql("INSERT INTO graft.ns.meta1 VALUES (5, -5), (200, 1)")

    // CREATE commits the BASE snapshot (not a version): two inserts =
    // versions 0 and 1
    val hist = spark.sql(
      "SELECT version, total_rows, file_count, txn_app, feed " +
        "FROM graft.ns.meta1.history ORDER BY version").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(hist.map(_.getLong(1)).toSeq === Seq(100L, 101L))
    assert(hist.forall(r => r.isNullAt(3) && !r.getBoolean(4)))

    // files: manifest inventory of the LATEST snapshot, rows add up,
    // key ranges are rendered and ordered
    val files = spark.sql(
      "SELECT file, row_count, min_key, max_key, size_bytes " +
        "FROM graft.ns.meta1.files ORDER BY min_key").collect()
    assert(files.map(_.getLong(1)).sum === 101L)
    assert(files.forall(_.getLong(4) > 0))
    assert(files.map(_.getString(0)).forall(_.endsWith(".parquet")))

    // metadata relations are SQL-composable: join history against itself
    assert(spark.sql(
      """SELECT count(*) FROM graft.ns.meta1.history h
         JOIN graft.ns.meta1.history p ON h.version = p.version + 1""")
      .head().getLong(0) === 1L)

    // detail: the one-row DESCRIBE DETAIL analog, manifest-answered
    val det = spark.sql(
      "SELECT key, num_versions, latest_version, total_rows, tombstones, " +
        "size_bytes, buckets FROM graft.ns.meta1.detail").collect()
    assert(det.length === 1)
    val d = det.head
    assert(d.getString(0) === "id")
    assert(d.getLong(1) === 3L) // base + v0 + v1
    assert(d.getLong(2) === 1L)
    assert(d.getLong(3) === 101L)
    assert(d.getLong(4) === 0L)
    assert(d.getLong(5) > 0L)
    assert(d.isNullAt(6)) // not bucketed

    // a streaming-sink commit shows its txn marker in history
    import java.nio.file.Files
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-meta-cp").toString)
      .start(s"$warehouse/ns/meta1")
    try { in.addData((7L, 77L)); q.processAllAvailable() } finally q.stop()
    val last = spark.sql(
      "SELECT txn_app, txn_epoch FROM graft.ns.meta1.history " +
        "ORDER BY version DESC LIMIT 1").head()
    assert(!last.isNullAt(0) && last.getLong(1) === 0L)
  }

  test("path-based V2 append still commits a version (no V1 bridge left)") {
    val root = java.nio.file.Files.createTempDirectory("graft-v2w").toString
    GraftTable.create(
      spark.range(0, 40).select(col("id"), (col("id") * 2).as("v")),
      root, "id", numFiles = 2)
    // GraftSource no longer implements CreatableRelationProvider — this
    // save can only go through the V2 SupportsWrite path
    assert(!classOf[org.apache.spark.sql.sources.CreatableRelationProvider]
      .isAssignableFrom(classOf[graft.sources.GraftSource]))
    spark.range(38, 42).select(col("id"), lit(-1L).as("v"))
      .write.format("graft").mode("append").save(root)
    val t = GraftTable(spark, root, "id")
    assert(t.versions === Seq(0L))
    val got = t.read().orderBy("id").collect()
    assert(got.length === 42)
    assert(got(37).getLong(1) === 74L && got(38).getLong(1) === -1L)
  }

  test("CTAS stages atomically; RTAS swaps; failed CTAS leaves nothing") {
    warehouse
    // CTAS: create-from-query in one statement, atomic publish
    spark.sql("""CREATE TABLE graft.ns.ctas USING graft
                 TBLPROPERTIES ('key' = 'id')
                 AS SELECT id, id * 3 AS v FROM range(0, 40)""")
    val t = spark.sql("SELECT * FROM graft.ns.ctas ORDER BY id").collect()
    assert(t.length === 40 && t(7).getLong(1) === 21L)
    // the created table is a full graft table: merge + time travel work
    spark.sql("""MERGE INTO graft.ns.ctas t USING (SELECT 5 AS id) s
                 ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = -5""")
    assert(spark.sql("SELECT v FROM graft.ns.ctas WHERE id = 5")
      .head().getLong(0) === -5L)
    assert(spark.sql(
      "SELECT v FROM graft.ns.ctas VERSION AS OF 0 WHERE id = 5")
      .head().getLong(0) === 15L)

    // duplicate CTAS fails fast and leaves the original intact
    val dup = intercept[Exception] {
      spark.sql("""CREATE TABLE graft.ns.ctas USING graft
                   TBLPROPERTIES ('key' = 'id')
                   AS SELECT id, id AS v FROM range(0, 3)""")
    }
    assert(dup.getMessage.toLowerCase.contains("exists") ||
      Option(dup.getCause).exists(_.getMessage.toLowerCase.contains("exists")))
    assert(spark.sql("SELECT count(*) FROM graft.ns.ctas")
      .head().getLong(0) === 40)

    // RTAS: REPLACE swaps content + schema wholesale
    spark.sql("""REPLACE TABLE graft.ns.ctas USING graft
                 TBLPROPERTIES ('key' = 'id')
                 AS SELECT id, concat('n', id) AS name FROM range(0, 7)""")
    val r = spark.sql("SELECT * FROM graft.ns.ctas ORDER BY id").collect()
    assert(r.length === 7 && r(2).getString(1) === "n2")

    // a FAILING CTAS query aborts the stage: no table, no debris visible
    intercept[Exception] {
      spark.sql("""CREATE TABLE graft.ns.ctasfail USING graft
                   TBLPROPERTIES ('key' = 'id')
                   AS SELECT id, CAST(raise_error('boom') AS BIGINT) AS v
                   FROM range(0, 3)""")
    }
    assert(!spark.catalog.tableExists("graft.ns.ctasfail"))
    assert(!spark.sql("SHOW TABLES IN graft.ns").collect()
      .exists(_.getString(1) == "ctasfail"))

    // CTAS into a BUCKETED layout: spec recorded, files bucket-named
    spark.sql("""CREATE TABLE graft.ns.ctasb USING graft
                 TBLPROPERTIES ('key' = 'id', 'buckets' = '4')
                 AS SELECT id, id * 2 AS v FROM range(0, 100)""")
    val w = spark.conf.get("spark.sql.catalog.graft.root")
    assert(graft.sources.MutableParquetTable.manifestBuckets(
      graft.streaming.CdcMergeSink.latestSnapshot(s"$w/ns/ctasb"))
      === Some(4))
    assert(spark.sql("SELECT count(*) FROM graft.ns.ctasb")
      .head().getLong(0) === 100)
  }
}
