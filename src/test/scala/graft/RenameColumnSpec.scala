package graft

import org.apache.spark.sql.functions._

import graft.sources.MutableParquetTable

/** `ALTER TABLE ... RENAME COLUMN` as a METADATA-ONLY commit: data files
  * keep the column's PHYSICAL (birth) name forever, the manifest maps
  * logical→physical, scans alias at the file boundary and rewrites
  * write the physical name back — so a rename never touches a data file
  * at any table size. A non-empty mapping stamps the `columnRenames`
  * required feature (readers without the mapping refuse instead of
  * silently returning the old name), and materializes away on the next
  * full physical rewrite (replace / z-order). */
class RenameColumnSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-rencol").toString

  private def seed(root: String): GraftTable =
    GraftTable.create(
      (0L until 100L).map(i => (i, i * 10, s"e$i")).toDF("k", "v", "extra"),
      root, "k", numFiles = 4)

  private def dataFileCount(dir: String): Int = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
    finally s.close()
  }

  test("rename is metadata-only; reads alias; time travel keeps the old name") {
    val root = freshRoot()
    val t = seed(root)
    t.commit(Seq((5L, 55L, "e5b", "upsert"))
      .toDF("k", "v", "extra", "op"))          // v0
    val v = t.renameColumn("extra", "note")    // v1
    assert(v === 1L)
    assert(dataFileCount(s"$root/v1") === 0,
      "RENAME COLUMN must be a reference-only commit")
    assert(MutableParquetTable.manifestRenames(s"$root/v1") ===
      Map("note" -> "extra"))
    assert(MutableParquetTable.manifestRequiredFeatures(s"$root/v1")
      .contains("columnRenames"),
      "a rename must stamp the feature so pre-rename readers refuse")

    val now = t.read()
    assert(now.schema.fieldNames.toSeq === Seq("k", "v", "note"))
    assert(now.count() === 100)
    assert(now.where(col("k") === 5L).head().getString(2) === "e5b",
      "values must survive the rename (they were never moved)")

    // per-version state: the pre-rename version keeps the old name
    val old = MutableParquetTable.readCommitted(spark, s"$root/v0")
    assert(old.schema.fieldNames.toSeq === Seq("k", "v", "extra"))
    assert(old.where(col("k") === 5L).head().getString(2) === "e5b")
  }

  test("merges after a rename: logical batch, physical bytes, mapping carried") {
    val root = freshRoot()
    val t = seed(root)
    t.renameColumn("extra", "note") // v0
    // the batch speaks the CURRENT logical names
    t.commit(Seq((5L, 1L, "n5", "upsert"))
      .toDF("k", "v", "note", "op")) // v1: one dirty file rewritten
    assert(t.read().where(col("k") === 5L).head().getString(2) === "n5")
    assert(t.read().count() === 100)
    assert(MutableParquetTable.manifestRenames(s"$root/v1") ===
      Map("note" -> "extra"), "CoW merges carry the mapping")
    // the rewritten file physically carries the BIRTH name — that is the
    // whole design: one uniform physical name per column, ever
    val files = MutableParquetTable.manifestFileNames(s"$root/v1").get
      .map(n => MutableParquetTable.resolvePath(s"$root/v1", n))
    files.foreach { f =>
      val phys = spark.read.parquet(f).schema.fieldNames.toSet
      assert(phys === Set("k", "v", "extra"),
        s"$f must carry the physical name, got $phys")
    }
    // deletes and updates under the new name
    t.updateWhere(col("note") === "n5", "v" -> lit(-1L)) // v2
    assert(t.read().where(col("k") === 5L).head().getLong(1) === -1L)
    t.deleteWhere(col("k") >= 90L) // v3
    assert(t.read().count() === 90)
    assert(t.read().schema.fieldNames.toSeq === Seq("k", "v", "note"))
  }

  test("guards: key / nested-key / collisions / checks / dropped refuse") {
    val root = freshRoot()
    val t = seed(root)
    intercept[IllegalArgumentException] { t.renameColumn("k", "id") }
    intercept[IllegalArgumentException] { t.renameColumn("nope", "x") }
    intercept[IllegalArgumentException] { t.renameColumn("extra", "v") }
    intercept[IllegalArgumentException] { t.renameColumn("extra", "a.b") }

    t.addCheck("extra_nn", "extra IS NOT NULL")
    val e = intercept[IllegalArgumentException] {
      t.renameColumn("extra", "note") }
    assert(e.getMessage.contains("CHECK constraint"), e.getMessage)
    t.dropCheck("extra_nn")

    // renaming TO a dropped (blocklisted) name refuses
    t.dropColumn("v")
    val e2 = intercept[IllegalArgumentException] {
      t.renameColumn("extra", "v") }
    assert(e2.getMessage.contains("DROPPED"), e2.getMessage)

    // nested merge key: renaming the root struct refuses
    val root2 = freshRoot()
    val df = spark.sql("""
      SELECT named_struct('uuid', concat('u', id), 'name', concat('n', id))
               AS person, id AS bal
      FROM range(0, 10)""")
    val t2 = GraftTable.create(df, root2, "person.uuid", numFiles = 1)
    intercept[IllegalArgumentException] { t2.renameColumn("person", "p") }
  }

  test("physical-name protection: evolution/ADD of the birth name refuses; logical re-use is fresh") {
    val root = freshRoot()
    val t = seed(root)
    t.renameColumn("extra", "note") // v0
    // merge schema evolution bringing back the PHYSICAL name would read
    // the renamed column's values on every existing file
    val e = intercept[Exception] {
      t.commit(Seq((5L, 1L, "n", "boom", "upsert"))
        .toDF("k", "v", "note", "extra", "op"))
    }
    assert(e.getMessage.contains("PHYSICAL") ||
      Option(e.getCause).exists(_.getMessage.contains("PHYSICAL")),
      e.getMessage)
    // metadata ADD of the physical name refuses the same way
    val e2 = intercept[Exception] {
      OptimisticCommit.commitSchema(root, t.read().schema
        .add("extra", org.apache.spark.sql.types.StringType))
    }
    assert(e2.getMessage.contains("PHYSICAL"), e2.getMessage)
  }

  test("chained renames resolve to the birth name; renaming back clears the mapping") {
    val root = freshRoot()
    val t = seed(root)
    t.renameColumn("extra", "note")  // v0: note→extra
    t.renameColumn("note", "remark") // v1: remark→extra (never note)
    assert(MutableParquetTable.manifestRenames(s"$root/v1") ===
      Map("remark" -> "extra"))
    assert(t.read().where(col("k") === 7L).head().getString(2) === "e7")
    t.renameColumn("remark", "extra") // v2: back to birth — entry clears
    assert(MutableParquetTable.manifestRenames(s"$root/v2").isEmpty)
    assert(!MutableParquetTable.manifestRequiredFeatures(s"$root/v2")
      .contains("columnRenames"),
      "an empty mapping must not keep refusing old readers")
    assert(t.read().schema.fieldNames.toSeq === Seq("k", "v", "extra"))
  }

  test("replace materializes the rename: mapping clears, files carry the new name") {
    val root = freshRoot()
    val t = seed(root)
    t.renameColumn("extra", "note") // v0
    t.replace((0L until 10L).map(i => (i, i, s"n$i")).toDF("k", "v", "note")) // v1
    assert(MutableParquetTable.manifestRenames(s"$root/v1").isEmpty)
    assert(!MutableParquetTable.manifestRequiredFeatures(s"$root/v1")
      .contains("columnRenames"))
    val files = MutableParquetTable.manifestFileNames(s"$root/v1").get
      .map(n => MutableParquetTable.resolvePath(s"$root/v1", n))
    files.foreach(f => assert(spark.read.parquet(f)
      .schema.fieldNames.contains("note"),
      s"$f must physically carry the materialized name"))
    assert(t.read().count() === 10)
    // the birth name is free again after the materializing rewrite
    t.renameColumn("note", "extra")
    assert(t.read().schema.fieldNames.toSeq === Seq("k", "v", "extra"))
  }

  test("compact splices carry the mapping; drop of a renamed column blocklists the PHYSICAL name") {
    val root = freshRoot()
    val t = seed(root)
    t.renameColumn("extra", "note") // v0
    val vc = t.compact(1L << 20)    // v1: raw splice — physical bytes
    assert(MutableParquetTable.manifestRenames(s"$root/v$vc") ===
      Map("note" -> "extra"), "byte splices keep physical names, so the " +
        "mapping must survive compaction")
    assert(t.read().schema.fieldNames.toSeq === Seq("k", "v", "note"))
    assert(t.read().count() === 100)

    t.dropColumn("note") // v2 — files still carry `extra` physically
    assert(MutableParquetTable.manifestDroppedColumns(s"$root/v2") ===
      Seq("extra"), "the blocklist must record the on-file name")
    assert(MutableParquetTable.manifestRenames(s"$root/v2").isEmpty)
    // re-ADD of the physical name refuses; the logical name is fresh
    intercept[Exception] {
      OptimisticCommit.commitSchema(root, t.read().schema
        .add("extra", org.apache.spark.sql.types.StringType))
    }
    OptimisticCommit.commitSchema(root, t.read().schema
      .add("note", org.apache.spark.sql.types.StringType)) // v3: fine
    assert(t.read().where(col("note").isNotNull).count() === 0,
      "no file ever carried `note` physically — re-use reads fresh nulls")
  }

  test("SQL surface: RENAME COLUMN, filtered reads, UPDATE, time travel") {
    val w = java.nio.file.Files.createTempDirectory("graft-rencol-cat").toString
    spark.conf.set("spark.sql.catalog.rc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rc.root", w)
    spark.sql("""CREATE TABLE rc.ns.r (k BIGINT, v BIGINT, extra STRING)
      USING graft TBLPROPERTIES ('key' = 'k')""")
    spark.sql(
      "INSERT INTO rc.ns.r SELECT id, id * 2, concat('e', id) FROM range(0, 20)")
    spark.sql("ALTER TABLE rc.ns.r RENAME COLUMN extra TO note")
    val got = spark.sql("SELECT * FROM rc.ns.r ORDER BY k")
    assert(got.schema.fieldNames.toSeq === Seq("k", "v", "note"))
    assert(got.count() === 20)
    // filters on the renamed column return correct rows (pushed or not)
    assert(spark.sql("SELECT k FROM rc.ns.r WHERE note = 'e7'")
      .head().getLong(0) === 7L)
    // projection of just the renamed column
    assert(spark.sql("SELECT note FROM rc.ns.r WHERE k = 3").head()
      .getString(0) === "e3")
    // DML under the new name
    spark.sql("UPDATE rc.ns.r SET v = -1 WHERE note = 'e5'")
    assert(spark.sql("SELECT v FROM rc.ns.r WHERE k = 5").head()
      .getLong(0) === -1L)
    spark.sql("DELETE FROM rc.ns.r WHERE note = 'e6'")
    assert(spark.sql("SELECT count(*) AS c FROM rc.ns.r").head()
      .getLong(0) === 19L)
    // time travel across the rename shows each version's own shape
    val v0 = spark.sql("SELECT * FROM rc.ns.r VERSION AS OF 0")
    assert(v0.schema.fieldNames.toSeq === Seq("k", "v", "extra"))
    assert(v0.count() === 20)
    // ADD COLUMN still guarded against the physical name
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE rc.ns.r ADD COLUMN extra STRING") }
    def msg(x: Throwable): String =
      Option(x.getMessage).getOrElse("") +
        Option(x.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("PHYSICAL"), msg(e))
  }

  test("change feed across a rename uses the CURRENT names; rebase carries the mapping") {
    val root = freshRoot()
    val t = seed(root)
    t.commit(Seq((3L, 33L, "x3", "upsert"))
      .toDF("k", "v", "extra", "op"))  // v0
    t.renameColumn("extra", "note")    // v1
    t.commit(Seq((4L, 44L, "n4", "upsert"))
      .toDF("k", "v", "note", "op"))   // v2
    val feed = t.changeFeed(-1L, 2L)
    val afterFields = feed.schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(afterFields === Seq("v", "note"),
      "the feed follows the CURRENT table shape")
    // keys 3 and 4 pre-exist in the seed, so both commits are UPDATEs
    val got = feed.where(col("change_type") === "update")
      .select(col("k"), col("after.note")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((3L, "x3"), (4L, "n4")))

    // concurrent disjoint commits on the renamed table: the metadata
    // rebase must re-declare the mapping, not drop it
    import org.apache.spark.sql.DataFrame
    val mine = Seq.tabulate(3)(i => (i.toLong, -i.toLong, s"m$i", "upsert"))
      .toDF("k", "v", "note", "op")
    val theirs = Seq.tabulate(3)(i => (97L - i, 0L, s"t$i", "upsert"))
      .toDF("k", "v", "note", "op")
    var fired = false
    val r = OptimisticCommit.commit(spark, root, "k", mine,
      testHookAfterStage = () => {
        if (!fired) { fired = true
          OptimisticCommit.commit(spark, root, "k", theirs)
        }
      })
    assert(r.rebases === 1, "disjoint files must resolve by manifest rebase")
    assert(MutableParquetTable.manifestRenames(s"$root/v${r.version}") ===
      Map("note" -> "extra"),
      "the rebased manifest must keep the rename mapping")
    assert(t.read().where(col("k") === 0L).head().getString(2) === "m0")
    assert(t.read().where(col("k") === 97L).head().getString(2) === "t0")
  }

  test("bucketed table: rename survives bucket-routed merges and SPJ layout") {
    val root = freshRoot()
    val t = GraftTable.create(
      spark.range(0, 200).select(col("id").as("k"), (col("id") + 1).as("v"),
        concat(lit("e"), col("id")).as("extra")),
      root, "k", numFiles = 4, buckets = Some(4))
    t.renameColumn("extra", "note") // v0
    t.commit(Seq((3L, 30L, "n3", "upsert")).toDF("k", "v", "note", "op")) // v1
    assert(MutableParquetTable.manifestBuckets(s"$root/v1") === Some(4))
    assert(MutableParquetTable.manifestRenames(s"$root/v1") ===
      Map("note" -> "extra"))
    assert(t.read().where(col("k") === 3L).head().getString(2) === "n3")
    assert(t.read().count() === 200)
  }

  test("tombstone deletes and the state/latest reads coexist with renames") {
    val root = freshRoot()
    val t = seed(root)
    t.renameColumn("extra", "note") // v0
    t.deleteKeys(Seq(1L, 3L, 5L).toDF("k")) // v1: sidecar, no rewrite
    val now = t.read()
    assert(now.count() === 97)
    assert(now.schema.fieldNames.toSeq === Seq("k", "v", "note"))
    assert(now.where(col("k") === 7L).head().getString(2) === "e7")
    t.materializeTombstones() // v2: CoW folds the sidecar, physical names
    assert(t.read().count() === 97)
    assert(MutableParquetTable.manifestRenames(
      graft.streaming.CdcMergeSink.latestSnapshot(root)) ===
      Map("note" -> "extra"))
  }
}
