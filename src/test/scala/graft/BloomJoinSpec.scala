package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter pruning on shuffle joins (Catalyst's
  * InjectRuntimeFilter): when one join side carries a selective filter, the
  * optimizer builds a bloom filter from it and applies it map-side on the
  * OTHER side's scan — at 100 TB this drops most fact rows before the
  * shuffle, which is exactly where a big-join plan bleeds. The engine
  * doesn't reimplement this; the point of the spec is that our plans are
  * SHAPED so the built-in rule fires (equi-join keys exposed, no opaque
  * UDF wrapping the key, filter on the dim side pushed down).
  *
  * Thresholds are tuned down because the fixture is tiny; at production
  * scale the defaults (10 MB creation side / 10 GB application side) gate
  * the same way.
  */
class BloomJoinSpec extends SparkSpec {

  private def withBloomConfs(f: => Unit): Unit = {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      f
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter on the fact scan side") {
    withBloomConfs {
      val fact = Tables.lineitem(spark, sf())
      val dim = Tables.supplier(spark, sf()).where(col("s_acctbal") > 9000)
      val joined = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"runtime bloom filter did not inject:\n$optimized")
      // and the filtered result is still exactly the unfiltered-join answer
      val expected = fact.join(dim.hint("broadcast"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
        .orderBy("s_name").collect()
      assert(joined.orderBy("s_name").collect() === expected)
    }
  }

  test("no selective filter on the dim -> no bloom filter is injected") {
    withBloomConfs {
      val fact = Tables.lineitem(spark, sf())
      val dim = Tables.supplier(spark, sf())
      val joined = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("might_contain"),
        "bloom filter should need a selective creation-side predicate")
    }
  }
}
