package graft

import org.apache.spark.sql.functions._

/** The same engine through `spark.sql`: every DataFrame plan in SparkEntry
  * has a SQL twin (OracleSql, dialect-shared subset), and Spark's parser +
  * Catalyst produce the same results — the engine is usable from pure SQL
  * over temp views, not only the typed API. */
class SqlSurfaceSpec extends SparkSpec {

  private def register(): Unit =
    Tables.all.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sf())
               else Tables.load(spark, sf(), t)
      df.createOrReplaceTempView(t)
    }

  test("aggregation query via spark.sql matches the DataFrame plan") {
    register()
    val sql = spark.sql("""
      SELECT l_returnflag, l_linestatus,
        round(cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        count(1) AS count_order
      FROM lineitem
      WHERE l_shipdate <= timestamp'2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
    val df = SparkEntry.q01_agg_pricing(spark, sf())
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    assert(sql.collect().toSeq === df.collect().toSeq)
  }

  test("join + grouping-sets via spark.sql matches the DataFrame plan") {
    register()
    val sql = spark.sql("""
      SELECT r_name, n_name, count(1) AS n
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, n""")
    assert(sql.count() > 0)
    // spot-check the grand total row equals the table count
    val total = sql.where(col("r_name").isNull && col("n_name").isNull)
      .select("n").head().getLong(0)
    assert(total === Tables.customer(spark, sf()).count())
  }

  test("registered native functions are callable from SQL text") {
    graft.plans.CosineSimilarity.register(spark)
    graft.plans.MinHashSignature.register(spark)
    graft.plans.SimHash.register(spark)
    register()
    val r = spark.sql("""
      SELECT vec_id,
        graft_cosine(embedding, embedding) AS self_sim,
        graft_simhash(transform(array('a','b'), t -> xxhash64(t))) AS sh,
        size(graft_minhash(transform(array('a','b'), t -> xxhash64(t)), 8)) AS lanes
      FROM embeddings ORDER BY vec_id LIMIT 5""").collect()
    assert(r.length === 5)
    r.foreach { row =>
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
      assert(row.getInt(3) === 8)
    }
  }
}
