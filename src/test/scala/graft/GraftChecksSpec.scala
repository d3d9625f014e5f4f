package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftChecks, MutableParquetTable}

/** CHECK constraints: named boolean SQL expressions in the manifest,
  * enforced on every write path (merge, replace, zone UPDATE, SQL
  * INSERT/DML), validated once over existing rows at ADD time, carried
  * through the version chain like the bucket spec, and versioned (a
  * restore to a pre-constraint version restores the old contract). */
class GraftChecksSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-chk").toString

  private def ups(rows: (Long, Long)*) =
    rows.map { case (k, v) => (k, v, "upsert") }.toDF("k", "v", "op")

  test("create with checks: valid seed commits, violating seed refuses") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 100L).map(i => (i, i + 1)).toDF("k", "v"), root, "k",
      numFiles = 4, checks = Map("v_pos" -> "v > 0"))
    assert(t.checks === Map("v_pos" -> "v > 0"))

    val bad = intercept[GraftChecks.CheckViolation] {
      GraftTable.create(Seq((1L, 0L)).toDF("k", "v"), freshRoot(), "k",
        numFiles = 1, checks = Map("v_pos" -> "v > 0"))
    }
    assert(bad.name === "v_pos")
  }

  test("merge enforces on upserts only; violating batch leaves the table untouched") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 100L).map(i => (i, i + 1)).toDF("k", "v"), root, "k",
      numFiles = 4, checks = Map("v_pos" -> "v > 0"))

    val e = intercept[GraftChecks.CheckViolation] {
      t.commit(ups(5L -> -1L))
    }
    assert(e.name === "v_pos" && e.getMessage.contains("v > 0"))
    assert(t.versions.isEmpty, "failed merge must not commit a version")
    assert(t.read().count() === 100)

    // deletes can't violate — a delete row whose non-key values would
    // fail the check still lands (only the key matters for a delete)
    assert(t.commit(Seq((7L, -999L, "delete")).toDF("k", "v", "op")) === 0L)
    assert(t.read().where(col("k") === 7L).isEmpty)

    // valid upserts land, and the committed manifest carries the checks
    assert(t.commit(ups(5L -> 50L)) === 1L)
    assert(GraftChecks.manifestChecks(s"$root/v1") ===
      Map("v_pos" -> "v > 0"))
  }

  test("NULL passes (SQL CHECK semantics) — NOT NULL is an explicit check") {
    val root = freshRoot()
    val t = GraftTable.create(
      Seq((1L, java.lang.Long.valueOf(5L))).toDF("k", "v"), root, "k",
      numFiles = 1, checks = Map("v_pos" -> "v > 0"))
    // v NULL: `v > 0` is NULL → passes
    assert(t.commit(Seq((2L, null.asInstanceOf[java.lang.Long], "upsert"))
      .toDF("k", "v", "op")) === 0L)
    assert(t.read().where(col("v").isNull).count() === 1)

    val t2 = GraftTable.create(
      Seq((1L, java.lang.Long.valueOf(5L))).toDF("k", "v"), freshRoot(), "k",
      numFiles = 1, checks = Map("v_req" -> "v IS NOT NULL"))
    val e = intercept[GraftChecks.CheckViolation] {
      t2.commit(Seq((2L, null.asInstanceOf[java.lang.Long], "upsert"))
        .toDF("k", "v", "op"))
    }
    assert(e.name === "v_req")
  }

  test("replace and zone UPDATE enforce; truncate keeps the contract") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 100L).map(i => (i, i + 1)).toDF("k", "v"), root, "k",
      numFiles = 4, checks = Map("v_pos" -> "v > 0"))

    intercept[GraftChecks.CheckViolation] {
      t.replace(Seq((1L, -5L)).toDF("k", "v"))
    }
    assert(t.versions.isEmpty)

    // zone UPDATE: a violating assignment refuses before any rewrite
    intercept[GraftChecks.CheckViolation] {
      t.updateWhere(col("k") === 3L, "v" -> lit(-1L))
    }
    assert(t.versions.isEmpty)
    assert(t.updateWhere(col("k") === 3L, "v" -> lit(333L)) === 0L)
    assert(t.read().where(col("k") === 3L).head().getLong(1) === 333L)

    // truncate (empty replace) keeps the checks — they are the table's
    // write contract, not a property of its content
    t.replace(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      t.read().schema))
    assert(t.checks === Map("v_pos" -> "v > 0"))
    intercept[GraftChecks.CheckViolation] { t.commit(ups(1L -> -1L)) }
  }

  test("addCheck validates existing rows once; dropCheck lifts the contract") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 100L).map(i => (i, i - 50)).toDF("k", "v"), root, "k",
      numFiles = 4)
    // half the rows violate — ADD must refuse and commit nothing
    val e = intercept[GraftChecks.CheckViolation] {
      t.addCheck("v_pos", "v > 0")
    }
    assert(e.getMessage.contains("existing rows"))
    assert(t.versions.isEmpty && t.checks.isEmpty)

    // a satisfiable check commits METADATA-ONLY (zero data files staged)
    val v = t.addCheck("v_big", "v > -100")
    assert(v === 0L)
    assert(t.checks === Map("v_big" -> "v > -100"))
    val dataFiles = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/v0"))
      try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally s.close()
    }
    assert(dataFiles === 0, "ADD CONSTRAINT must be a reference-only commit")

    intercept[GraftChecks.CheckViolation] { t.commit(ups(1L -> -200L)) }
    assert(t.dropCheck("v_big") === 1L)
    assert(t.checks.isEmpty)
    assert(t.commit(ups(1L -> -200L)) === 2L)
  }

  test("malformed, non-boolean, and nondeterministic checks are rejected at declaration") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    val root = freshRoot()
    intercept[Exception] { // unresolvable column
      GraftTable.create(df, root, "k", 1, checks = Map("c" -> "nope > 0"))
    }
    intercept[Exception] { // non-boolean
      GraftTable.create(df, freshRoot(), "k", 1, checks = Map("c" -> "v + 1"))
    }
    intercept[Exception] { // nondeterministic
      GraftTable.create(df, freshRoot(), "k", 1, checks = Map("c" -> "rand() > 0.5"))
    }
  }

  test("checks are versioned state: restore to a pre-constraint version restores the old contract") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 50L).map(i => (i, i + 1)).toDF("k", "v"), root, "k",
      numFiles = 2)
    t.commit(ups(1L -> 10L)) // v0, unconstrained
    t.addCheck("v_pos", "v > 0") // v1
    intercept[GraftChecks.CheckViolation] { t.commit(ups(2L -> -1L)) }
    t.restoreTo(0L) // v2: the unconstrained contract is back
    assert(t.checks.isEmpty)
    assert(t.commit(ups(2L -> -1L)) === 3L)
  }

  test("bucketed tables enforce through the bucket-routed merge") {
    val root = freshRoot()
    val t = GraftTable.create(
      spark.range(0, 200).select(col("id").as("k"), (col("id") + 1).as("v")),
      root, "k", numFiles = 4, buckets = Some(4),
      checks = Map("v_pos" -> "v > 0"))
    intercept[GraftChecks.CheckViolation] { t.commit(ups(3L -> -7L)) }
    assert(t.versions.isEmpty)
    assert(t.commit(ups(3L -> 7L)) === 0L)
    assert(MutableParquetTable.manifestBuckets(s"$root/v0") === Some(4))
    assert(GraftChecks.manifestChecks(s"$root/v0").nonEmpty)
  }

  test("SQL surface: CREATE with check property, INSERT enforced, ALTER SET/UNSET") {
    val w = java.nio.file.Files.createTempDirectory("graft-chk-cat").toString
    spark.conf.set("spark.sql.catalog.chk",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.chk.root", w)
    spark.sql("""CREATE TABLE chk.ns.c (k BIGINT, v BIGINT) USING graft
      TBLPROPERTIES ('key' = 'k', 'check.v_pos' = 'v > 0')""")
    spark.sql("INSERT INTO chk.ns.c VALUES (1, 5)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO chk.ns.c VALUES (2, -5)")
    }
    def root(x: Throwable): Throwable =
      if (x.getCause == null) x else root(x.getCause)
    assert(root(e).isInstanceOf[GraftChecks.CheckViolation])
    assert(spark.sql("SELECT * FROM chk.ns.c").count() === 1)

    spark.sql("ALTER TABLE chk.ns.c UNSET TBLPROPERTIES ('check.v_pos')")
    spark.sql("INSERT INTO chk.ns.c VALUES (2, -5)")
    assert(spark.sql("SELECT * FROM chk.ns.c").count() === 2)

    // re-adding now fails validation: an existing row violates
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE chk.ns.c SET TBLPROPERTIES ('check.v_pos' = 'v > 0')")
    }
    assert(root(e2).isInstanceOf[GraftChecks.CheckViolation])
    // after removing the offender, ALTER SET lands and enforces
    spark.sql("DELETE FROM chk.ns.c WHERE v < 0")
    spark.sql("ALTER TABLE chk.ns.c SET TBLPROPERTIES ('check.v_pos' = 'v > 0')")
    val e3 = intercept[Exception] {
      spark.sql("UPDATE chk.ns.c SET v = -1 WHERE k = 1")
    }
    assert(root(e3).isInstanceOf[GraftChecks.CheckViolation])
  }

  test("whole-table DELETE (provably-all zone path) keeps the contract") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 50L).map(i => (i, i + 1)).toDF("k", "v"), root, "k",
      numFiles = 2, checks = Map("v_pos" -> "v > 0"))
    // predicate provably matches every file → the structurally-truncate
    // commitEmpty path, which must carry the checks like any commit
    t.deleteWhere(lit(true))
    assert(t.read().isEmpty)
    assert(t.checks === Map("v_pos" -> "v > 0"),
      "a whole-table DELETE must not silently drop the write contract")
    intercept[GraftChecks.CheckViolation] { t.commit(ups(1L -> -1L)) }
  }

  test("ALTER with several check properties is atomic: no half-apply, one version") {
    val w = java.nio.file.Files.createTempDirectory("graft-chk-multi").toString
    spark.conf.set("spark.sql.catalog.chkm",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.chkm.root", w)
    spark.sql("""CREATE TABLE chkm.ns.m (k BIGINT, v BIGINT) USING graft
      TBLPROPERTIES ('key' = 'k')""")
    spark.sql("INSERT INTO chkm.ns.m VALUES (1, 5)")
    // the second property is invalid — the WHOLE statement must abort
    // before anything commits (previously check.a half-applied)
    intercept[Exception] {
      spark.sql("""ALTER TABLE chkm.ns.m SET TBLPROPERTIES
        ('check.a' = 'v > 0', 'check.b' = 'bogus_col > 0')""")
    }
    assert(GraftChecks.manifestChecks(
      graft.streaming.CdcMergeSink.latestSnapshot(s"$w/ns/m")).isEmpty,
      "a failed multi-check ALTER must leave no constraint behind")
    spark.sql("INSERT INTO chkm.ns.m VALUES (2, -5)") // still unconstrained

    // a valid multi-add lands BOTH checks in ONE commit (one version,
    // one validation scan)
    spark.sql("DELETE FROM chkm.ns.m WHERE v < 0")
    val before = graft.streaming.CdcMergeSink.versions(s"$w/ns/m").size
    spark.sql("""ALTER TABLE chkm.ns.m SET TBLPROPERTIES
      ('check.a' = 'v > 0', 'check.c' = 'k >= 0')""")
    val after = graft.streaming.CdcMergeSink.versions(s"$w/ns/m").size
    assert(after === before + 1, "several check.* properties = ONE commit")
    assert(GraftChecks.manifestChecks(
      graft.streaming.CdcMergeSink.latestSnapshot(s"$w/ns/m")).keySet ===
      Set("a", "c"))
  }

  test("commitChecks rebase onto a moved base re-validates; concurrent constraint change refuses") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 20L).map(i => (i, i + 1)).toDF("k", "v"), root, "k",
      numFiles = 2)
    t.commit(ups(5L -> -7L)) // v0 — contains a row violating v_pos

    // simulate "validated at base, a data commit landed before publish":
    // validatedVersion says base(-1), actual head is v0 → the rebase
    // guard must re-run the validation, which now sees the -7 and throws
    var revalidations = 0
    intercept[GraftChecks.CheckViolation] {
      OptimisticCommit.commitChecks(root, Map("v_pos" -> "v > 0"),
        validatedVersion = Some(-1L),
        revalidate = { _ =>
          revalidations += 1
          GraftChecks.enforce(t.read(), Map("v_pos" -> "v > 0"), "rebase")
        })
    }
    assert(revalidations === 1)
    assert(t.checks.isEmpty, "the violated check must not be declared")

    // same rebase with clean content: revalidate runs, commit lands
    t.commit(ups(5L -> 7L)) // v1 — now all rows satisfy v_pos
    var ok = 0
    OptimisticCommit.commitChecks(root, Map("v_pos" -> "v > 0"),
      validatedVersion = Some(0L),
      revalidate = { _ =>
        ok += 1
        GraftChecks.enforce(t.read(), Map("v_pos" -> "v > 0"), "rebase")
      })
    assert(ok === 1 && t.checks === Map("v_pos" -> "v > 0"))

    // a concurrent CONSTRAINT change is detected, not stomped: this
    // writer computed its target set against an empty contract, but the
    // head now declares v_pos
    val e = intercept[IllegalStateException] {
      OptimisticCommit.commitChecks(root, Map("other" -> "k >= 0"),
        expectedChecks = Some(Map.empty))
    }
    assert(e.getMessage.contains("concurrent CHECK-constraint change"))
    assert(t.checks === Map("v_pos" -> "v > 0"))
  }
}
