package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.MutableParquetTable

/** `ALTER COLUMN ... TYPE` for the WIDENING-safe pairs as a
  * METADATA-ONLY commit: the manifest schema takes the wide type,
  * existing files keep their narrow physical bytes (Spark's parquet
  * readers upcast on read — the Delta type-widening mechanic), rewrites
  * write wide going forward, and a `widenedColumns` marker keeps
  * byte-splice maintenance from mixing physical shapes in one file
  * until a rewrite clears it. */
class WidenTypeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-widen").toString

  private def seed(root: String): GraftTable = {
    val df = spark.range(0, 100).select(col("id").as("k"),
      col("id").cast("int").as("cnt"),
      (col("id") * 0.5).cast("float").as("ratio"))
    GraftTable.create(df, root, "k", numFiles = 4)
  }

  test("widen int->long and float->double: metadata-only, out-of-range values writable") {
    val root = freshRoot()
    val t = seed(root)
    t.commit(spark.range(5, 6).select(col("id").as("k"),
      lit(7).cast("int").as("cnt"), lit(0.5f).as("ratio"),
      lit("upsert").as("op")))                     // v0
    val v1 = t.alterColumnType("cnt", LongType)    // v1, 0 IO
    val v2 = t.alterColumnType("ratio", DoubleType) // v2
    assert(MutableParquetTable.manifestWidened(s"$root/v$v2").toSet ===
      Set("cnt", "ratio"))
    // metadata-only: no data files owned by the ALTER versions
    Seq(v1, v2).foreach { v =>
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/v$v"))
      val n = try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally s.close()
      assert(n === 0, s"ALTER TYPE version v$v must own zero data files")
    }
    val now = t.read()
    assert(now.schema("cnt").dataType === LongType)
    assert(now.schema("ratio").dataType === DoubleType)
    assert(now.count() === 100)
    assert(now.where(col("k") === 5L).head().getLong(1) === 7L,
      "narrow physical bytes upcast on read")
    // a value beyond Int.MaxValue is now writable — proves REAL widening
    val big = 3000000000L
    t.commit(Seq((9L, big, 9.5, "upsert")).toDF("k", "cnt", "ratio", "op")) // v3
    assert(t.read().where(col("k") === 9L).head().getLong(1) === big)
    assert(t.read().agg(sum(col("cnt"))).head().getLong(0) ===
      (0L until 100L).sum - 5 + 7 - 9 + big)
    // time travel shows each version's own type
    assert(MutableParquetTable.readCommitted(spark, s"$root/v0")
      .schema("cnt").dataType === IntegerType)
  }

  test("guards: key, narrowing, cross-family, check interplay, drift") {
    val root = freshRoot()
    val t = seed(root)
    intercept[IllegalArgumentException] { t.alterColumnType("k", LongType) }
    intercept[IllegalArgumentException] {
      t.alterColumnType("cnt", ShortType) }   // narrowing
    intercept[IllegalArgumentException] {
      t.alterColumnType("cnt", StringType) }  // cross-family
    intercept[IllegalArgumentException] {
      t.alterColumnType("ratio", LongType) }  // float->long unsafe
    intercept[IllegalArgumentException] {
      t.alterColumnType("nope", LongType) }
    // checks that still resolve under the wide type survive; the widened
    // batch is validated against them
    t.addCheck("cnt_nn", "cnt IS NOT NULL")
    t.alterColumnType("cnt", LongType)
    assert(t.checks.keySet === Set("cnt_nn"))
    intercept[Exception] {
      t.commit(Seq((1L, null.asInstanceOf[java.lang.Long], 0.5f, "upsert"))
        .toDF("k", "cnt", "ratio", "op"))
    }
  }

  test("marker lifecycle: splice-compact purges, merge-all-files clears, rebase carries") {
    val root = freshRoot()
    val t = seed(root)
    t.alterColumnType("cnt", LongType) // v0
    // compact must NOT splice narrow+wide shapes — the purge rewrite
    // clears the marker and materializes the wide type physically
    val vc = t.compact(1L << 20)       // v1
    assert(MutableParquetTable.manifestWidened(s"$root/v$vc").isEmpty,
      "a purging compact materializes the widening")
    val files = MutableParquetTable.manifestFileNames(s"$root/v$vc").get
      .map(n => MutableParquetTable.resolvePath(s"$root/v$vc", n))
    files.foreach(f => assert(
      spark.read.parquet(f).schema("cnt").dataType === LongType,
      s"$f must physically carry the wide type after the purge"))
    assert(t.read().count() === 100)

    // full-rewrite merge clears by the survivors rule
    val root2 = freshRoot()
    val t2 = seed(root2)
    t2.alterColumnType("cnt", LongType) // v0
    val all = spark.range(0, 100).select(col("id").as("k"),
      col("id").as("cnt"), (col("id") * 0.5).cast("float").as("ratio"),
      lit("upsert").as("op"))
    t2.commit(all)                      // v1: every file dirty
    assert(MutableParquetTable.manifestWidened(s"$root2/v1").isEmpty,
      "no pre-widen file survives — the marker clears")

    // a PARTIAL merge keeps it (narrow files survive via passthrough)
    val root3 = freshRoot()
    val t3 = seed(root3)
    t3.alterColumnType("cnt", LongType) // v0
    t3.commit(Seq((5L, 5L, 0.5f, "upsert")).toDF("k", "cnt", "ratio", "op")) // v1
    assert(MutableParquetTable.manifestWidened(s"$root3/v1") === Seq("cnt"))
  }

  test("widen a RENAMED column: upcast through the physical-name mapping, purge materializes both") {
    val root = freshRoot()
    val t = seed(root)
    t.renameColumn("cnt", "count2")                 // v0: logical count2 -> physical cnt
    t.alterColumnType("count2", LongType)           // v1: wide logical over narrow physical
    // the marker records the PHYSICAL (birth) name — the same convention
    // as the dropped-column blocklist and the dim-range entries it strips
    assert(MutableParquetTable.manifestWidened(s"$root/v1") === Seq("cnt"))
    val now = t.read()
    assert(now.schema("count2").dataType === LongType)
    assert(now.where(col("k") === 5L).head().getLong(1) === 5L,
      "narrow physical bytes under the birth name upcast on read")
    // write past the int range through the mapping (CoW writes the
    // physical name with the wide type)
    t.commit(Seq((9L, 3000000000L, 9.5f, "upsert"))
      .toDF("k", "count2", "ratio", "op"))          // v2
    assert(t.read().where(col("k") === 9L).head().getLong(1) === 3000000000L)
    // the purging compact materializes BOTH: new logical name + wide type
    val vc = t.compact(1L << 20)
    assert(MutableParquetTable.manifestWidened(s"$root/v$vc").isEmpty)
    assert(MutableParquetTable.manifestRenames(s"$root/v$vc").isEmpty)
    val files = MutableParquetTable.manifestFileNames(s"$root/v$vc").get
      .map(n => MutableParquetTable.resolvePath(s"$root/v$vc", n))
    files.foreach { f =>
      val sch = spark.read.parquet(f).schema
      assert(sch.fieldNames.contains("count2") && !sch.fieldNames.contains("cnt"))
      assert(sch("count2").dataType === LongType)
    }
    assert(t.read().agg(sum(col("count2"))).head().getLong(0) ===
      (0L until 100L).sum - 9 + 3000000000L)
  }

  test("widen a RENAMED column sheds LOGICAL-name dim zone maps (no stale narrow bounds)") {
    val root = freshRoot()
    val t = seed(root)
    t.commit(Seq((5L, 5, 0.5f, "upsert")).toDF("k", "cnt", "ratio", "op")) // v0
    t.renameColumn("cnt", "count2")                 // v1: logical count2 -> physical cnt
    // dim entries are recorded under the LOGICAL name (the name pushed
    // filters carry); the sweep resolves the physical footer name itself
    MutableParquetTable.attachDimRanges(spark, s"$root/v1", Seq("count2"))
    assert(MutableParquetTable.manifestDimRanges(s"$root/v1")
      .keySet === Set("count2"))
    val v2 = t.alterColumnType("count2", LongType)  // marker records "cnt"
    assert(MutableParquetTable.manifestWidened(s"$root/v$v2") === Seq("cnt"))
    // the widen must shed the LIVE logical-name entries, not just any
    // inert physical-name ones: narrow-encoded bounds compared against
    // wide-typed filter values would wrongly prune files (missing rows)
    assert(MutableParquetTable.manifestDimRanges(s"$root/v$v2").isEmpty,
      "dim zone maps keyed by the logical name must not survive the widen")
    // filtered reads stay correct under the wide type
    val got = t.read().where(col("count2") === 80L).collect()
    assert(got.length === 1 && got.head.getLong(0) === 80L)
    assert(t.read().where(col("count2") === 5L).head().getLong(1) === 5L)
  }

  test("decimal widening: precision growth, scale growth rescales, both reader paths") {
    val root = freshRoot()
    // DECIMAL(9,2) is int32-physical on disk — the narrowest bucket
    val df = spark.range(0, 100).select(col("id").as("k"),
      (col("id") + lit(0.25)).cast(DecimalType(9, 2)).as("amt"))
    val t = GraftTable.create(df, root, "k", numFiles = 4)
    val v1 = t.alterColumnType("amt", DecimalType(18, 2))  // int64 request
    val v2 = t.alterColumnType("amt", DecimalType(22, 4))  // binary request, scale +2
    assert(MutableParquetTable.manifestWidened(s"$root/v$v2") === Seq("amt"))
    Seq(v1, v2).foreach { v =>
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/v$v"))
      val n = try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally s.close()
      assert(n === 0, s"ALTER TYPE version v$v must own zero data files")
    }
    val now = t.read()
    assert(now.schema("amt").dataType === DecimalType(22, 4))
    // int32-physical decimals upcast and rescale (0.25 -> 0.2500) on read
    val got5 = now.where(col("k") === 5L).head().getDecimal(1)
    assert(got5.compareTo(new java.math.BigDecimal("5.2500")) === 0,
      s"vectorized upcast+rescale, got $got5")
    // the row-converter path must agree (nested/fallback reads)
    withSQLConf("spark.sql.parquet.enableVectorizedReader" -> "false") {
      val g = t.read().where(col("k") === 5L).head().getDecimal(1)
      assert(g.compareTo(new java.math.BigDecimal("5.2500")) === 0,
        s"row-converter upcast+rescale, got $g")
    }
    // a value beyond DECIMAL(9,2)'s range is now writable
    val big = new java.math.BigDecimal("123456789012345678.1234")
    t.commit(spark.sql(
      s"SELECT 9L AS k, CAST('$big' AS DECIMAL(22,4)) AS amt, 'upsert' AS op"))
    val total = t.read().agg(sum(col("amt"))).head().getDecimal(0)
    val expect = new java.math.BigDecimal(
      (0 until 100).filter(_ != 9).map(i => BigDecimal(i) + 0.25).sum
        .toString()).add(big)
    assert(total.compareTo(expect) === 0, s"mixed-physical sum, got $total")
    // time travel shows each version's own type (create committed `base`)
    assert(MutableParquetTable.readCommitted(spark, s"$root/base")
      .schema("amt").dataType === DecimalType(9, 2))
  }

  test("int->decimal and date->timestamp_ntz widen; range/scale guards refuse") {
    val root = freshRoot()
    val df = spark.range(0, 50).select(col("id").as("k"),
      col("id").cast("int").as("cnt"),
      expr("date_add(DATE'2024-01-01', CAST(id AS INT))").as("d"))
    val t = GraftTable.create(df, root, "k", numFiles = 2)
    // int needs >= 10 integer digits in the target
    intercept[IllegalArgumentException] {
      t.alterColumnType("cnt", DecimalType(9, 0)) }
    intercept[IllegalArgumentException] {
      t.alterColumnType("cnt", DecimalType(11, 2)) }  // 9 int digits
    t.alterColumnType("cnt", DecimalType(12, 2))
    t.alterColumnType("d", TimestampNTZType)
    val now = t.read()
    assert(now.schema("cnt").dataType === DecimalType(12, 2))
    assert(now.schema("d").dataType === TimestampNTZType)
    val r = now.where(col("k") === 3L).head()
    assert(r.getDecimal(1).compareTo(new java.math.BigDecimal("3.00")) === 0)
    assert(r.getAs[java.time.LocalDateTime]("d") ===
      java.time.LocalDateTime.of(2024, 1, 4, 0, 0), "day-start upcast")
    withSQLConf("spark.sql.parquet.enableVectorizedReader" -> "false") {
      val r2 = t.read().where(col("k") === 3L).head()
      assert(r2.getDecimal(1).compareTo(new java.math.BigDecimal("3.00")) === 0)
      assert(r2.getAs[java.time.LocalDateTime]("d") ===
        java.time.LocalDateTime.of(2024, 1, 4, 0, 0))
    }
    // decimal guards: scale shrink and integer-digit shrink refuse
    intercept[IllegalArgumentException] {
      t.alterColumnType("cnt", DecimalType(12, 1)) }  // scale shrink
    intercept[IllegalArgumentException] {
      t.alterColumnType("cnt", DecimalType(12, 4)) }  // int digits 10 -> 8
    // long->decimal needs >= 20 integer digits
    val root2 = freshRoot()
    val t2 = GraftTable.create(spark.range(0, 10)
      .select(col("id").as("k"), col("id").as("v")), root2, "k", numFiles = 1)
    intercept[IllegalArgumentException] {
      t2.alterColumnType("v", DecimalType(19, 0)) }
    t2.alterColumnType("v", DecimalType(22, 2))
    assert(t2.read().where(col("k") === 7L).head().getDecimal(1)
      .compareTo(new java.math.BigDecimal("7.00")) === 0)
  }

  test("NESTED field widening: s.c int->long metadata-only, upcast reads, out-of-range write") {
    val root = freshRoot()
    val df = spark.range(0, 60).select(col("id").as("k"),
      struct(col("id").cast("int").as("a"),
        col("id").cast("int").as("c")).as("s"))
    val t = GraftTable.create(df, root, "k", numFiles = 3)
    val v = t.alterColumnType("s.c", LongType)
    assert(MutableParquetTable.manifestWidened(s"$root/v$v") === Seq("s.c"))
    locally {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/v$v"))
      val n = try st.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally st.close()
      assert(n === 0, "nested ALTER TYPE must own zero data files")
    }
    val now = t.read()
    assert(now.schema("s").dataType.asInstanceOf[StructType]("c").dataType
      === LongType)
    assert(now.where(col("k") === 5L).select(col("s.c")).head().getLong(0) === 5L)
    withSQLConf("spark.sql.parquet.enableVectorizedReader" -> "false") {
      assert(t.read().where(col("k") === 5L).select(col("s.c")).head()
        .getLong(0) === 5L)
    }
    // a value past Int.MaxValue is writable through the whole-struct merge
    t.commit(spark.sql(
      "SELECT 9L AS k, named_struct('a', 9, 'c', 4000000000L) AS s, 'upsert' AS op"))
    assert(t.read().where(col("k") === 9L).select(col("s.c")).head()
      .getLong(0) === 4000000000L)
    // guards hold at depth: key-rooted and narrowing refusals
    intercept[IllegalArgumentException] { t.alterColumnType("s.nope", LongType) }
    intercept[IllegalArgumentException] { t.alterColumnType("s.a", ShortType) }
    // purging compact materializes the wide type and clears the marker
    val vc = t.compact(1L << 20)
    assert(MutableParquetTable.manifestWidened(s"$root/v$vc").isEmpty)
    assert(t.read().agg(sum(col("s.c"))).head().getLong(0) ===
      (0L until 60L).sum - 9 + 4000000000L)
  }

  test("SQL surface: ALTER COLUMN TYPE, aggregation over mixed physicals, time travel") {
    val w = java.nio.file.Files.createTempDirectory("graft-widen-cat").toString
    spark.conf.set("spark.sql.catalog.wt",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wt.root", w)
    spark.sql("""CREATE TABLE wt.ns.t (k BIGINT, cnt INT)
      USING graft TBLPROPERTIES ('key' = 'k')""")
    spark.sql("INSERT INTO wt.ns.t SELECT id, CAST(id AS INT) FROM range(0, 50)")
    spark.sql("ALTER TABLE wt.ns.t ALTER COLUMN cnt TYPE BIGINT")
    val got = spark.sql("SELECT * FROM wt.ns.t")
    assert(got.schema("cnt").dataType === LongType)
    assert(got.count() === 50)
    // write past the int range through SQL, then aggregate across the
    // mixed narrow/wide physical files
    spark.sql("UPDATE wt.ns.t SET cnt = 4000000000 WHERE k = 1")
    assert(spark.sql("SELECT sum(cnt) AS s FROM wt.ns.t").head()
      .getLong(0) === (0L until 50L).sum - 1L + 4000000000L)
    assert(spark.sql("SELECT * FROM wt.ns.t VERSION AS OF 0")
      .schema("cnt").dataType === IntegerType)
    // non-widening retype still refuses
    intercept[Exception] {
      spark.sql("ALTER TABLE wt.ns.t ALTER COLUMN cnt TYPE INT") }
  }
}
