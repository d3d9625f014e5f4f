package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, Udx}

/** KMV distinct sketch: exactness below capacity, deterministic
  * mergeability, the union closure property, estimate accuracy, and
  * hash portability. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(ids: Seq[Long], k: Int, parts: Int = 4): Seq[Long] =
    ids.toDF("id").repartition(parts)
      .select(Udx.kmvHash(col("id").cast("string")).as("h"))
      .agg(Udx.kmvSketch(k)(col("h")))
      .head().getSeq[Long](0)

  test("below capacity the sketch IS the distinct hash set; estimate exact") {
    val ids = Seq(1L, 2L, 3L, 2L, 1L, 7L)
    val s = sketchOf(ids, k = 16)
    assert(s.length === 3 + 1) // 4 distinct ids
    assert(s === s.sorted && s.distinct === s)
    val est = Seq(s).toDF("s")
      .select(Udx.kmvEstimate(col("s"), 16)).head().getLong(0)
    assert(est === 4L)
  }

  test("partitioning never changes the sketch (mergeable, deterministic)") {
    val ids = (1L to 500L).map(i => i * 13 % 211)
    assert(sketchOf(ids, 32, parts = 1) === sketchOf(ids, 32, parts = 8))
  }

  test("union closure: kmvUnion of two sketches == sketch of the union") {
    val a = (1L to 400L)
    val b = (200L to 600L)
    val k = 32
    val (sa, sb, sab) = (sketchOf(a, k), sketchOf(b, k),
      sketchOf((a ++ b).distinct, k))
    val u = Seq((sa, sb)).toDF("a", "b")
      .select(Udx.kmvUnion(col("a"), col("b"), k)).head().getSeq[Long](0)
    assert(u === sab,
      "the j-th smallest of A∪B is always inside S_k(A) ∪ S_k(B)")
  }

  test("estimate accuracy at capacity: within the sketch's error envelope") {
    val n = 5000L
    val k = 64
    val s = sketchOf(1L to n, k)
    assert(s.length === k)
    val est = Seq(s).toDF("s")
      .select(Udx.kmvEstimate(col("s"), k)).head().getLong(0)
    // rsd ~ 1/sqrt(k-2) ≈ 12.7%; 4σ bound keeps the lane deterministic
    assert(math.abs(est - n) < n / 2,
      s"estimate $est too far from $n")
    // floor-double division == integer division on these magnitudes
    val kth = s(k - 1)
    assert(est === (k - 1).toLong * Udx.KmvMod / kth)
  }

  private def qsketchDf(rows: Seq[(Long, Double)], k: Int,
                        parts: Int = 4): org.apache.spark.sql.DataFrame =
    rows.toDF("id", "v").repartition(parts)
      .select(Udx.kmvHash(col("id").cast("string")).as("h"), col("v"))
      .agg(Udx.quantileSample(k)(col("h"), col("v")).as("s"))

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select(col("s")).head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))

  test("quantileSample: below capacity IS the pair set; partitioning " +
      "invariant; bottom-k union closure; exact-sample estimate") {
    val small = Seq(1L -> 5.0, 2L -> 1.0, 3L -> 9.0, 2L -> 1.0)
    val sDf = qsketchDf(small, k = 16)
    val s = pairs(sDf)
    assert(s.length === 3, "distinct pairs only")
    assert(s.map(_._1) === s.map(_._1).sorted)
    // when the sample holds the whole group the estimate is the exact
    // lower quantile: p50 of {1,5,9} = 5, p90 = 9, p1 = 1
    def est(q: Long) = sDf
      .select(Udx.quantileSampleEstimate(col("s"), q)).head().getDouble(0)
    assert(est(500000L) === 5.0 && est(900000L) === 9.0 &&
      est(10000L) === 1.0)
    // partitioning/merge-topology invariance (pure set algebra)
    val big = (1L to 800L).map(i => i -> (i * 17 % 251).toDouble)
    assert(pairs(qsketchDf(big, 32, parts = 1)) ===
      pairs(qsketchDf(big, 32, parts = 8)))
    // bottom-k(A ∪ B) from the two bottom-k sets alone (the
    // IncrementalAgg clean-path closure)
    val a = big.take(500); val b = big.drop(300)
    val u = qsketchDf(a, 32).select(col("s").as("sa"))
      .crossJoin(qsketchDf(b, 32).select(col("s").as("sb")))
      .select(Udx.quantileSampleMerge(col("sa"), col("sb"), 32).as("s"))
    assert(pairs(u) === pairs(qsketchDf((a ++ b).distinct, 32)))
    intercept[IllegalArgumentException](Udx.quantileSample(1))
    intercept[IllegalArgumentException](
      Udx.quantileSampleEstimate(col("s"), 0L))
  }

  test("polyHash is the engine-portable fold (hand value)") {
    // "12": h = ((0*131+49)%M)*131+50 % M = 49*131+50 = 6469
    val h = Seq("12").toDF("t")
      .select(TextFunctions.polyHash(col("t"))).head().getLong(0)
    assert(h === 6469L)
    intercept[IllegalArgumentException](Udx.kmvSketch(1))
  }
}
