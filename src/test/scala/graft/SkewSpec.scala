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
}
