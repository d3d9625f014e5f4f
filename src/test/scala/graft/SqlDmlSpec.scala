package graft

import org.apache.spark.sql.functions._

/** SQL DML (MERGE INTO / DELETE / UPDATE) on graft tables — the engine's
  * CoW merge reachable as plain SQL through the injected post-hoc rule
  * (graft.plans.GraftDmlRule). */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(n: Long = 100, files: Int = 4): (String, GraftTable) = {
    val root = java.nio.file.Files.createTempDirectory("graft-sqldml").toString
    val t = GraftTable.create(
      spark.range(0, n).select(col("id"),
        concat(lit("c"), (col("id") % 3).cast("string")).as("cat"),
        (col("id") * 10).as("v")),
      root, "id", numFiles = files)
    (root, t)
  }

  private def view(root: String, name: String): Unit =
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW $name USING graft OPTIONS (path '$root')")

  test("MERGE INTO: UPDATE SET * / INSERT * commits one CoW version") {
    val (root, t) = newTable()
    view(root, "mt1")
    Seq((5L, "cX", -50L), (200L, "cY", -1L)).toDF("id", "cat", "v")
      .createOrReplaceTempView("src1")
    spark.sql("""MERGE INTO mt1 t USING src1 s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(t.versions === Seq(0L))
    val got = t.read().orderBy("id").collect()
    assert(got.length === 101)
    assert(got(5).getString(1) === "cX" && got(5).getLong(2) === -50L)
    assert(got(100).getLong(0) === 200L && got(100).getString(1) === "cY")
    // untouched row intact
    assert(got(6).getString(1) === "c0" && got(6).getLong(2) === 60L)
  }

  test("MERGE INTO: conditional clauses, DELETE action, explicit assignments") {
    val (root, t) = newTable()
    view(root, "mt2")
    Seq((1L, 111L), (2L, -1L), (300L, 7L)).toDF("id", "nv")
      .createOrReplaceTempView("src2")
    // matched + nv < 0  -> delete; matched otherwise -> update v only;
    // not matched + nv > 0 -> insert with a computed category
    spark.sql("""MERGE INTO mt2 t USING src2 s ON t.id = s.id
                 WHEN MATCHED AND s.nv < 0 THEN DELETE
                 WHEN MATCHED THEN UPDATE SET v = s.nv * 2
                 WHEN NOT MATCHED AND s.nv > 0 THEN
                   INSERT (id, cat, v) VALUES (s.id, concat('n', s.nv), s.nv)""")
    val got = t.read().orderBy("id").collect()
    assert(got.length === 100) // -1 delete +1 insert
    assert(!got.map(_.getLong(0)).contains(2L), "id 2 deleted")
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(r1.getLong(2) === 222L)
    assert(r1.getString(1) === "c1", "unassigned column keeps target value")
    val r300 = got.find(_.getLong(0) == 300L).get
    assert(r300.getString(1) === "n7" && r300.getLong(2) === 7L)
  }

  test("MERGE INTO: WHEN NOT MATCHED BY SOURCE DELETE") {
    val (root, t) = newTable(n = 10, files = 2)
    view(root, "mt3")
    Seq(0L, 1L, 2L, 3L, 4L).toDF("id").createOrReplaceTempView("src3")
    spark.sql("""MERGE INTO mt3 t USING src3 s ON t.id = s.id
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(t.read().orderBy("id").collect().map(_.getLong(0)).toSeq
      === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("DELETE FROM with an arbitrary predicate") {
    val (root, t) = newTable()
    view(root, "dt1")
    spark.sql("DELETE FROM dt1 WHERE cat = 'c1' AND v > 500")
    val got = t.read().collect()
    // c1 rows are ids 1,4,...; v > 500 means id > 50
    assert(got.length === 100 - 16)
    assert(!got.exists(r => r.getString(1) == "c1" && r.getLong(2) > 500))
    assert(got.exists(r => r.getString(1) == "c1" && r.getLong(2) < 500))
  }

  test("UPDATE SET with expression and WHERE") {
    val (root, t) = newTable()
    view(root, "ut1")
    spark.sql("UPDATE ut1 SET v = v + 1000, cat = upper(cat) WHERE id < 3")
    val got = t.read().orderBy("id").collect()
    assert(got(0).getLong(2) === 1000L && got(0).getString(1) === "C0")
    assert(got(2).getLong(2) === 1020L && got(2).getString(1) === "C2")
    assert(got(3).getLong(2) === 30L && got(3).getString(1) === "c0")
  }

  test("UPDATE of the merge key is rejected with a clear error") {
    val (root, _) = newTable()
    view(root, "ut2")
    val e = intercept[Exception] {
      spark.sql("UPDATE ut2 SET id = id + 1 WHERE id = 5")
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("merge key")), s"unexpected: $e")
  }

  test("DML chain: each statement is one committed version; time travel sees each") {
    val (root, t) = newTable(n = 20, files = 2)
    view(root, "ct1")
    spark.sql("DELETE FROM ct1 WHERE id = 0")
    spark.sql("UPDATE ct1 SET v = 0 WHERE id = 1")
    assert(t.versions === Seq(0L, 1L))
    assert(t.readAsOf(0L).count() === 19)
    assert(t.readAsOf(0L).where(col("id") === 1L).head().getLong(2) === 10L)
    assert(t.read().where(col("id") === 1L).head().getLong(2) === 0L)
  }

  test("non-graft targets are untouched by the rule") {
    // a plain parquet temp view must still get Spark's own (unsupported)
    // DML error, not a graft mis-route
    val dir = java.nio.file.Files.createTempDirectory("graft-plainpq").toString
    spark.range(0, 10).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("plainpq")
    intercept[Exception] { spark.sql("DELETE FROM plainpq WHERE id = 1") }
  }
}
