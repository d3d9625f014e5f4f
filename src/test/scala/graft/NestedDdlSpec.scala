package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.MutableParquetTable

/** NESTED struct-field DDL: `ADD COLUMNS (s.c T)` / `DROP COLUMN s.c`
  * as the same METADATA-ONLY commits as their top-level forms — old
  * files read an added field as null (parquet missing-field semantics)
  * and stop projecting a dropped one; the resurrection blocklist
  * carries DOTTED paths (physical container names under renames);
  * fields inside array/map elements refuse. */
class NestedDdlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-nested-ddl").toString

  private def seed(root: String): GraftTable =
    GraftTable.create(
      spark.range(0, 60).select(col("id").as("k"),
        struct(col("id").cast("int").as("a"),
          concat(lit("n"), col("id")).as("b")).as("s")),
      root, "k", numFiles = 3)

  private def dataFilesOf(dir: String): Int = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
    finally s.close()
  }

  test("nested ADD: metadata-only, old files read null on both reader paths, merge fills") {
    val w = java.nio.file.Files.createTempDirectory("graft-nadd").toString
    spark.conf.set("spark.sql.catalog.nd1",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.nd1.root", w)
    spark.sql("""CREATE TABLE nd1.ns.t (k BIGINT, s STRUCT<a: INT, b: STRING>)
      USING graft TBLPROPERTIES ('key' = 'k')""")
    spark.sql("""INSERT INTO nd1.ns.t
      SELECT id, named_struct('a', CAST(id AS INT), 'b', concat('n', id))
      FROM range(0, 60)""")
    spark.sql("ALTER TABLE nd1.ns.t ADD COLUMNS (s.c BIGINT)")
    // metadata-only: the ALTER version owns zero data files
    assert(dataFilesOf(s"$w/ns/t/v1") === 0)
    val now = spark.sql("SELECT * FROM nd1.ns.t")
    assert(now.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq
      === Seq("a", "b", "c"))
    assert(now.count() === 60)
    assert(now.where(col("k") === 5L).select(col("s.c")).head().isNullAt(0),
      "old files read the added nested field as null")
    withSQLConf("spark.sql.parquet.enableVectorizedReader" -> "false") {
      assert(spark.sql("SELECT s.c FROM nd1.ns.t WHERE k = 5").head().isNullAt(0))
    }
    // a whole-row write fills it; untouched rows stay null
    spark.sql("""UPDATE nd1.ns.t SET s = named_struct(
      'a', s.a, 'b', s.b, 'c', k * 100) WHERE k = 7""")
    val r7 = spark.sql("SELECT s.a, s.c FROM nd1.ns.t WHERE k = 7").head()
    assert(r7.getInt(0) === 7 && r7.getLong(1) === 700L)
    assert(spark.sql(
      "SELECT count(*) FROM nd1.ns.t WHERE s.c IS NOT NULL").head().getLong(0) === 1L)
    // time travel: the pre-ALTER version keeps the narrow struct
    assert(spark.sql("SELECT * FROM nd1.ns.t VERSION AS OF 0")
      .schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq
      === Seq("a", "b"))
  }

  test("nested DROP: metadata-only narrow, dotted blocklist, purge clears, re-add cycles") {
    val root = freshRoot()
    val t = seed(root)
    val v = t.dropColumn("s.b")    // v0
    assert(dataFilesOf(s"$root/v$v") === 0, "nested DROP is reference-only")
    val now = t.read()
    assert(now.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq
      === Seq("a"))
    assert(now.count() === 60)
    assert(now.where(col("k") === 5L).select(col("s.a")).head().getInt(0) === 5)
    // dotted blocklist entry; re-ADD of the same path refuses, a sibling adds
    assert(MutableParquetTable.manifestDroppedColumns(s"$root/v$v") === Seq("s.b"))
    intercept[Exception] {
      graft.OptimisticCommit.commitSchema(root,
        GraftTable.addNestedField(t.read().schema, Seq("s", "b"), StringType))
    }
    graft.OptimisticCommit.commitSchema(root,
      GraftTable.addNestedField(t.read().schema, Seq("s", "d"), LongType)) // v1
    assert(t.read().schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("a", "d"))
    // the purging compact sheds the stale nested bytes and clears the list
    val vc = t.compact(1L << 20)
    assert(MutableParquetTable.manifestDroppedColumns(s"$root/v$vc").isEmpty)
    val files = MutableParquetTable.manifestFileNames(s"$root/v$vc").get
      .map(n => MutableParquetTable.resolvePath(s"$root/v$vc", n))
    files.foreach { f =>
      val st = spark.read.parquet(f).schema("s").dataType.asInstanceOf[StructType]
      assert(!st.fieldNames.contains("b"), s"$f must not carry s.b bytes")
    }
    // after the purge the path is free again
    graft.OptimisticCommit.commitSchema(root,
      GraftTable.addNestedField(t.read().schema, Seq("s", "b"), StringType))
    assert(t.read().where(col("s.b").isNotNull).count() === 0,
      "re-added nested field must NOT resurrect pre-drop values")
    // time travel shows the original wide struct
    assert(MutableParquetTable.readCommitted(spark, s"$root/base")
      .select(col("s.b")).where(col("k") === 5L).head().getString(0) === "n5")
  }

  test("guards: nested keys, empty struct, array/map paths, IF EXISTS, checks") {
    // a table keyed on a nested path: neither the path nor its container drops
    val rootK = freshRoot()
    val dfK = spark.range(0, 20).select(
      struct(concat(lit("u"), col("id")).as("uuid"),
        col("id").as("n")).as("person"),
      col("id").as("v"))
    val tK = GraftTable.create(dfK, rootK, "person.uuid", numFiles = 2)
    intercept[IllegalArgumentException] { tK.dropColumn("person.uuid") }
    intercept[IllegalArgumentException] { tK.dropColumn("person") }
    tK.dropColumn("person.n") // a sibling of the key is free to go
    assert(tK.read().schema("person").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("uuid"))

    val root = freshRoot()
    val t = seed(root)
    // dropping the last field would leave an empty struct
    t.dropColumn("s.b")
    val e = intercept[IllegalArgumentException] { t.dropColumn("s.a") }
    assert(e.getMessage.contains("drop the struct column itself"))
    // paths through arrays/maps refuse as malformed, not "missing"
    val rootA = freshRoot()
    val tA = GraftTable.create(
      spark.range(0, 10).select(col("id").as("k"),
        array(struct(col("id").as("x"))).as("arr")),
      rootA, "k", numFiles = 1)
    val eA = intercept[IllegalArgumentException] { tA.dropColumn("arr.x") }
    assert(eA.getMessage.contains("array/map"))
    // IF EXISTS on a missing nested path is a no-op, not an error
    val before = t.versions.last
    assert(t.dropColumns(Seq("s.nope"), ifExists = true) === before)
    intercept[IllegalArgumentException] { t.dropColumn("s.nope") }
    // a CHECK referencing the nested field blocks its drop
    val root2 = freshRoot()
    val t2 = seed(root2)
    t2.addCheck("a_nn", "s.a IS NOT NULL")
    val e2 = intercept[IllegalArgumentException] { t2.dropColumn("s.a") }
    assert(e2.getMessage.contains("drop the check first"))
  }

  test("SQL surface: ADD COLUMNS (s.c), DROP COLUMN s.c, IF EXISTS batch") {
    val w = java.nio.file.Files.createTempDirectory("graft-nsql").toString
    spark.conf.set("spark.sql.catalog.nd2",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.nd2.root", w)
    spark.sql("""CREATE TABLE nd2.ns.t (k BIGINT, s STRUCT<a: INT, b: STRING>)
      USING graft TBLPROPERTIES ('key' = 'k')""")
    spark.sql("""INSERT INTO nd2.ns.t
      SELECT id, named_struct('a', CAST(id AS INT), 'b', concat('n', id))
      FROM range(0, 30)""")
    spark.sql("ALTER TABLE nd2.ns.t DROP COLUMN s.b")
    assert(spark.sql("SELECT * FROM nd2.ns.t").schema("s").dataType
      .asInstanceOf[StructType].fieldNames.toSeq === Seq("a"))
    // re-ADD of the dropped path refuses through SQL while the pre-drop
    // file survives
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE nd2.ns.t ADD COLUMNS (s.b STRING)") }
    assert(e.getMessage.contains("DROPPED"))
    spark.sql("ALTER TABLE nd2.ns.t ADD COLUMNS (s.c BIGINT)")
    spark.sql("""UPDATE nd2.ns.t SET s = named_struct('a', s.a, 'c', k + 1)
      WHERE k = 3""")
    assert(spark.sql("SELECT s.c FROM nd2.ns.t WHERE k = 3").head().getLong(0) === 4L)
    // that UPDATE rewrote the (single-file) table through the narrow
    // logical schema — no s.b bytes survive, so the blocklist clears
    // and the path is legitimately free again (the survivors rule)
    spark.sql("ALTER TABLE nd2.ns.t ADD COLUMNS (s.b STRING)")
    assert(spark.sql(
      "SELECT count(*) FROM nd2.ns.t WHERE s.b IS NOT NULL").head().getLong(0) === 0L,
      "re-added nested path must not resurrect values")
    spark.sql("ALTER TABLE nd2.ns.t DROP COLUMN IF EXISTS s.zzz") // no-op
    assert(spark.sql("SELECT count(*) FROM nd2.ns.t").head().getLong(0) === 30L)
  }

  test("rename interplay: dropping x.b under a renamed container blocklists the PHYSICAL path") {
    val root = freshRoot()
    val t = seed(root)
    t.renameColumn("s", "t2")      // v0: logical t2 -> physical s
    t.dropColumn("t2.b")           // v1: blocklist must carry s.b
    assert(MutableParquetTable.manifestDroppedColumns(s"$root/v1") === Seq("s.b"))
    // re-adding the LOGICAL path t2.b reads physical s.b on old files — refuse
    intercept[Exception] {
      graft.OptimisticCommit.commitSchema(root,
        GraftTable.addNestedField(t.read().schema, Seq("t2", "b"), StringType))
    }
    // values still read through the mapping, minus the dropped field
    val now = t.read()
    assert(now.schema("t2").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("a"))
    assert(now.where(col("k") === 5L).select(col("t2.a")).head().getInt(0) === 5)
  }
}
