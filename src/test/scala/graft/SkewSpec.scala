package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted grouped top-k == direct window top-k (total order)") {
    val li = Tables.lineitem(spark, sf())
    // total order: price desc, then unique (orderkey, linenumber) tiebreak
    val order = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val got = Skew.saltedTopKPerKey(li, Seq(col("l_returnflag")), order, k = 10, buckets = 8)
      .select(col("l_returnflag"), col("rank"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(order: _*)
    val direct = li.withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
      .select(col("l_returnflag"), col("rank"), col("l_orderkey"), col("l_linenumber"))
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
  }

  test("rank-limit windows run with a partial WindowGroupLimit before the shuffle") {
    val li = Tables.lineitem(spark, sf())
    val plan = Skew.saltedTopKPerKey(li, Seq(col("l_returnflag")),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial"), plan)
  }

  test("distributed distribution windows == plain window, bit-identical") {
    val o = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val order = Seq(col("o_totalprice"), col("o_orderkey"))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(order: _*)
    val direct = o
      .withColumn("percent_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
      .withColumn("ntile", ntile(4).over(w))
      .withColumn("first_value", first_value(col("o_orderkey")).over(w))
    val got = Skew.distributedDistribution(o, "o_orderstatus",
      Seq("o_totalprice", "o_orderkey"), ntiles = 4,
      firstValueOf = Some("o_orderkey"))
      .select(direct.columns.map(col): _*)
    // exact equality, doubles included — the closed forms reproduce
    // Spark's own window expressions
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
  }

  test("distributed distribution has NO per-key window over the data (funnel removed)") {
    val o = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val df = Skew.distributedDistribution(o, "o_orderstatus",
      Seq("o_totalprice", "o_orderkey"), firstValueOf = Some("o_orderkey"))
    df.collect() // materialize through AQE
    // every Window node over the DATA must partition by (key, bucket);
    // key-only windows are allowed only on the tiny counts frame, which
    // contains __b/__c columns — distinguish by output
    val windows = graft.Metrics.planNodes(df.queryExecution.executedPlan)
      .collect { case win: org.apache.spark.sql.execution.window.WindowExec => win }
    windows.foreach { win =>
      val exprs = win.partitionSpec.map(_.toString).mkString(",")
      assert(!exprs.contains("o_orderstatus") || exprs.contains("__bucket"),
        s"key-only window over the data: $exprs")
    }
  }
}
