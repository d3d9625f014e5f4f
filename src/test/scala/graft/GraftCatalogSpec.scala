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
}
