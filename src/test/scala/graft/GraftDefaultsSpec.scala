package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftChecks, GraftDefaults}

/** DEFAULT and GENERATED column contracts: manifest-carried, filled on
  * omission, generated drift refused, metadata-only DDL, versioned
  * state, and the concurrent-change protocol (decline, never stomp). */
class GraftDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-def").toString

  test("create fills omitted contract columns; manifest carries both maps") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 20L).map(i => (i, i + 1)).toDF("k", "v"), root, "k",
      numFiles = 2,
      defaults = Map("tag" -> "'web'"),
      generated = Map("v2" -> "v * 2"))
    val r = t.read().orderBy("k").collect()
    assert(r.forall(_.getString(2) == "web"))
    assert(r.forall(x => x.getLong(3) == x.getLong(1) * 2))
    assert(t.columnDefaults === Map("tag" -> "'web'"))
    assert(t.generatedColumns === Map("v2" -> "v * 2"))
    // a column-referencing DEFAULT is rejected (defaults are constant)
    intercept[Exception] {
      GraftTable.create(Seq((1L, 2L)).toDF("k", "v"), freshRoot(), "k",
        numFiles = 1, defaults = Map("tag" -> "v + 1"))
    }
  }

  test("merge: omission fills, supplied generated drift refuses, " +
      "defaults only on omission (supplied NULL stays NULL)") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 20L).map(i => (i, i + 1)).toDF("k", "v"), root, "k",
      numFiles = 2,
      defaults = Map("tag" -> "'web'"),
      generated = Map("v2" -> "v * 2"))
    // batch omits BOTH contract columns → default filled, generated
    // computed from the batch's own v
    assert(t.commit(Seq((5L, 100L, "upsert")).toDF("k", "v", "op")) === 0L)
    val got5 = t.read().where(col("k") === 5L).head()
    assert(got5.getString(2) === "web" && got5.getLong(3) === 200L)
    // a supplied generated value that DRIFTS from the expression refuses
    val e = intercept[GraftChecks.CheckViolation] {
      t.commit(Seq((6L, 10L, "x", 99L, "upsert"))
        .toDF("k", "v", "tag", "v2", "op"))
    }
    assert(e.name === "generated:v2")
    assert(t.versions === Seq(0L), "failed merge must not commit")
    // a supplied generated value EQUAL to the expression is accepted,
    // and a supplied NULL default column stays NULL (DEFAULT applies to
    // omission, not to NULL — SQL INSERT semantics)
    assert(t.commit(Seq((6L, 10L, null.asInstanceOf[String], 20L, "upsert"))
      .toDF("k", "v", "tag", "v2", "op")) === 1L)
    val got6 = t.read().where(col("k") === 6L).head()
    assert(got6.isNullAt(2) && got6.getLong(3) === 20L)
    // deletes are exempt from generated validation
    assert(t.commit(Seq((7L, 0L, "zz", -1L, "delete"))
      .toDF("k", "v", "tag", "v2", "op")) === 2L)
    assert(t.read().where(col("k") === 7L).isEmpty)
    // the chain keeps carrying the contracts
    assert(GraftDefaults.manifestDefaults(s"$root/v2") ===
      Map("tag" -> "'web'"))
    assert(GraftDefaults.manifestGenerated(s"$root/v2") ===
      Map("v2" -> "v * 2"))
  }

  test("metadata-only DDL: SET/DROP DEFAULT, SET GENERATED validates " +
      "existing rows once, drop guards") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 20L).map(i => (i, i + 1, i * 3)).toDF("k", "v", "w"),
      root, "k", numFiles = 2)
    // SET GENERATED validates the current table: w == k*3 holds...
    t.setGeneratedColumn("w", "k * 3")
    assert(t.generatedColumns === Map("w" -> "k * 3"))
    // ... but a non-matching declaration refuses
    val bad = intercept[GraftChecks.CheckViolation] {
      t.setGeneratedColumn("v", "k + 999")
    }
    assert(bad.name === "generated:v")
    // SET DEFAULT is metadata-only
    val vD = t.setColumnDefault("v", "0")
    assert(vD >= 0L && t.columnDefaults === Map("v" -> "0"))
    // a defaulted column refuses a second default; same column cannot
    // be both
    intercept[IllegalArgumentException](t.setColumnDefault("v", "1"))
    intercept[IllegalArgumentException](t.setColumnDefault("w", "1"))
    // writes now fill: batch omitting v and w
    t.commit(Seq((50L, "upsert")).toDF("k", "op"))
    val got = t.read().where(col("k") === 50L).head()
    assert(got.getLong(1) === 0L && got.getLong(2) === 150L)
    // DROP COLUMN refuses while contracts exist
    intercept[IllegalArgumentException](t.dropColumn("w"))
    val eRef = intercept[IllegalArgumentException](t.dropColumn("k"))
    assert(eRef.getMessage.contains("merge-key"))
    // drop the declarations; then the column drops fine
    t.dropGeneratedColumn("w")
    t.dropColumnDefault("v")
    assert(t.columnDefaults.isEmpty && t.generatedColumns.isEmpty)
    t.dropColumn("w")
    assert(!t.read().columns.contains("w"))
  }

  test("generated expressions referencing a dropped column block the drop") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 10L).map(i => (i, i + 1, (i + 1) * 2)).toDF("k", "v", "w"),
      root, "k", numFiles = 1)
    t.setGeneratedColumn("w", "v * 2")
    val e = intercept[IllegalArgumentException](t.dropColumn("v"))
    assert(e.getMessage.contains("references a dropped column"))
  }

  test("concurrent contract change declines the rebase: the stale batch " +
      "re-merges under (and is caught by) the new contract") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 20L).map(i => (i, i + 1, i * 2)).toDF("k", "v", "w"),
      root, "k", numFiles = 2)
    // this batch's w drifts from the contract ABOUT to be declared; it
    // stages against the contract-free base, then the hook publishes
    // the GENERATED declaration, taking the slot. The rebase must
    // DECLINE (contract drift) and the re-merge under the new head
    // must refuse the batch — committing it via rebase would smuggle
    // an unvalidated write past the new contract.
    var hooked = false
    val e = intercept[GraftChecks.CheckViolation] {
      OptimisticCommit.commit(spark, root, "k",
        Seq((5L, 10L, 0L, "upsert")).toDF("k", "v", "w", "op"),
        testHookAfterStage = () => {
          if (!hooked) { hooked = true; t.setGeneratedColumn("w", "k * 2") }
        })
    }
    assert(e.name === "generated:w")
    assert(t.versions === Seq(0L), "only the DDL version may exist")
    assert(t.generatedColumns === Map("w" -> "k * 2"))

    // commitColumnContracts detects concurrent contract drift
    val e2 = intercept[IllegalStateException] {
      OptimisticCommit.commitColumnContracts(root,
        Map("v" -> "1"), Map.empty, expected = Some((Map.empty, Map.empty)))
    }
    assert(e2.getMessage.contains("concurrent DEFAULT/GENERATED"))
  }

  test("contracts are versioned state: restore to a pre-contract " +
      "version restores the old (empty) contract") {
    val root = freshRoot()
    val t = GraftTable.create(
      (0L until 10L).map(i => (i, i + 1)).toDF("k", "v"), root, "k",
      numFiles = 1)
    t.commit(Seq((3L, 7L, "upsert")).toDF("k", "v", "op")) // v0
    t.setColumnDefault("v", "42")                          // v1
    assert(t.columnDefaults === Map("v" -> "42"))
    t.restoreTo(0L)                                        // v2 = restore
    assert(t.columnDefaults.isEmpty,
      "restored version predates the DEFAULT — the old contract governs")
  }
}
