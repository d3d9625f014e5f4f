package graft

import org.apache.spark.sql.functions._

/** Bucketed, sorted-by-key tables elide the shuffle (and sort) of a
  * sort-merge join — the cluster-scale analog of the reference's
  * key-sorted-shard invariant (README.md:21, 45-48): co-located layout
  * makes the merge join a zip, exactly like the reference's single-pass
  * sorted cursor (ParquetBlockMutator.java:129-186), but per bucket and
  * distributed. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed+sorted tables join without a shuffle exchange") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
      Tables.orders(s, sf()).write
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
      Tables.lineitem(s, sf()).write
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

      val joined = s.table("b_lineitem")
        .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))

      val n = joined.collect().map(_.getLong(1)).sum
      assert(n === Tables.lineitem(s, sf()).count())

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans in:\n$plan")
      // no exchange keyed on the join keys: the bucketed layout already
      // co-locates both sides (the agg's own exchange on o_orderpriority
      // is expected and unrelated)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
             !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join should not shuffle on the join keys:\n$plan")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    }
  }
}
