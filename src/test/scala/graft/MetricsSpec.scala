package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  private def awaitMetrics(m: Metrics, atLeast: Int, timeoutMs: Long = 15000): Seq[QueryMetrics] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var snap = m.snapshot()
    while (snap.size < atLeast && System.currentTimeMillis() < deadline) {
      Thread.sleep(50); snap = m.snapshot()
    }
    snap
  }

  test("listener harvests duration, scan and shuffle metrics per action (S23)") {
    val m = Metrics.attach(spark)
    try {
      Tables.lineitem(spark, sf())
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
        .collect()
      val snap = awaitMetrics(m, 1)
      assert(snap.nonEmpty, "no metrics delivered")
      val qm = snap.last
      assert(qm.durationNs > 0)
      assert(qm.filesRead >= 1, qm.toString)
      assert(qm.bytesRead > 0, qm.toString)
      assert(qm.shuffleBytes > 0, qm.toString) // the groupBy exchanged data
    } finally m.detach()
  }

  test("clear resets the buffer; detach stops collection") {
    val m = Metrics.attach(spark)
    Tables.region(spark, sf()).count()
    awaitMetrics(m, 1)
    m.clear()
    assert(m.snapshot().isEmpty)
    m.detach()
    Tables.region(spark, sf()).count()
    Thread.sleep(300)
    assert(m.snapshot().isEmpty)
  }
}
