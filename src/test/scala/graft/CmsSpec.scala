package graft

import org.apache.spark.sql.functions._

import graft.functions.Udx

/** Count-Min sketch: merge across partitions, the no-undercount
  * structural guarantee under forced collisions, and exactness when the
  * width dominates the key cardinality. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def estimates(keys: Seq[String], depth: Int, width: Int,
                        parts: Int) = {
    val df = keys.toDF("k").repartition(parts)
    val sketch = df
      .select(explode(Udx.cmsPositions(col("k"), depth, width)).as("__pos"))
      .agg(Udx.cmsCells(depth * width)(col("__pos")).as("cells"))
    df.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .select(col("k"), col("exact"),
        Udx.cmsEstimate(col("cells"), col("k"), depth, width).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("wide sketch across 8 partitions: every estimate is exact") {
    val keys = (1 to 40).flatMap(i => Seq.fill(i % 5 + 1)(s"key_$i"))
    val out = estimates(keys, depth = 4, width = 1024, parts = 8)
    assert(out.length == 40)
    out.foreach { case (k, exact, est) =>
      assert(est == exact, s"$k: est $est != exact $exact")
    }
  }

  test("forced collisions (width 2): never undercounts, must overcount") {
    val keys = (1 to 10).flatMap(i => Seq.fill(i)(s"key_$i"))
    val out = estimates(keys, depth = 1, width = 2, parts = 4)
    out.foreach { case (k, exact, est) =>
      assert(est >= exact, s"$k: CMS undercounted ($est < $exact)")
    }
    assert(out.exists { case (_, exact, est) => est > exact },
      "10 keys in 2 cells must collide somewhere")
  }

  test("guards: non-positive cell count refuses") {
    intercept[IllegalArgumentException](new Udx.CountCellsAggregator(0))
  }
}
