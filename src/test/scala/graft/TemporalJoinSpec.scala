package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin}

/** AsOfJoin and RangeJoin vs naive reference formulations on the fixtures:
  * same rows, different (scalable) plan shape. */
class TemporalJoinSpec extends SparkSpec {

  private def views = Tables.events(spark, sf())
    .where(col("event_type") === "view")
    .select(col("event_id"), col("user_id"), col("ts"))

  private def purchases = Tables.events(spark, sf())
    .where(col("event_type") === "purchase")
    .select(col("user_id"), col("ts"), col("value"))

  test("asof backward == naive max-per-group formulation") {
    val got = AsOfJoin.backward(views, purchases, "user_id", "user_id", "ts", "ts")
      .select(col("event_id"), col("asof_ts"), col("asof_value"))

    // naive: blow up the full history, keep the max right ts per left row
    val p = purchases.select(col("user_id").as("pu"),
      col("ts").as("pts"), col("value").as("pval"))
    val naive = views.join(p, col("user_id") === col("pu") && col("pts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_id")).orderBy(col("pts").desc_nulls_last)))
      .where(col("rn") === 1)
      .select(col("event_id"), col("pts").as("asof_ts"), col("pval").as("asof_value"))

    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    assert(got.count() === views.count()) // left-outer: every view kept
  }

  test("asof strict excludes equal timestamps") {
    // self-join events to themselves: inclusive matches the row itself,
    // strict must match an earlier row (or null)
    val e = Tables.events(spark, sf()).select(col("event_id"), col("user_id"), col("ts"))
    val inclusive = AsOfJoin.backward(e, e.drop("event_id"), "user_id", "user_id", "ts", "ts")
    assert(inclusive.where(col("asof_ts") === col("ts")).count() === e.count())
    val strict = AsOfJoin.backward(e, e.drop("event_id"), "user_id", "user_id", "ts", "ts",
      strict = true)
    assert(strict.where(col("asof_ts") === col("ts")).count() === 0)
  }

  test("asof forward == naive min-per-group formulation") {
    val got = AsOfJoin.forward(views, purchases, "user_id", "user_id", "ts", "ts")
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
    val p = purchases.select(col("user_id").as("pu"),
      col("ts").as("pts"), col("value").as("pval"))
    val naive = views.join(p, col("user_id") === col("pu") && col("pts") >= col("ts"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_id")).orderBy(col("pts").asc_nulls_last)))
      .where(col("rn") === 1)
      .select(col("event_id"), col("pts").as("asof_ts"), col("pval").as("asof_value"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("asof tolerance nulls out stale matches") {
    val all = AsOfJoin.backward(views, purchases, "user_id", "user_id", "ts", "ts")
    val tol = AsOfJoin.backward(views, purchases, "user_id", "user_id", "ts", "ts",
      tolerance = Some("30 minutes"))
    // tolerance only ever removes matches, never adds or changes them
    val widened = all.where(
      col("asof_ts").isNotNull &&
      col("asof_ts") >= col("ts") - expr("interval 30 minutes"))
      .select(col("event_id"), col("asof_ts"))
    val kept = tol.where(col("asof_ts").isNotNull)
      .select(col("event_id"), col("asof_ts"))
    assert(kept.exceptAll(widened).isEmpty && widened.exceptAll(kept).isEmpty)
    assert(tol.count() === all.count()) // left rows always survive
    assert(tol.where(col("asof_ts").isNull).count() >=
      all.where(col("asof_ts").isNull).count())
  }

  test("bucketed range join == nested-loop BETWEEN join, across widths") {
    val pts = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_acctbal"))
    val ivs = Tables.part(spark, sf()).select(col("p_partkey"),
      (col("p_retailprice") - col("p_size") * 3).as("lo"),
      (col("p_retailprice") + col("p_size") * 3).as("hi"))
    val naive = pts.join(ivs, col("c_acctbal").between(col("lo"), col("hi")))
      .select(col("c_custkey"), col("p_partkey"))
    for (w <- Seq(16.0, 64.0, 1024.0)) {
      val got = RangeJoin.bucketed(pts, ivs, "c_acctbal", "lo", "hi", w)
        .select(col("c_custkey"), col("p_partkey"))
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"width $w")
    }
  }

  test("property: random points/intervals/widths match the nested loop") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val pts = (0 until 200).map(i => (i.toLong, rnd.nextDouble() * 1000 - 200))
        .toDF("pid", "x")
      val ivs = (0 until 80).map { i =>
        val lo = rnd.nextDouble() * 1000 - 300
        (i.toLong, lo, lo + rnd.nextDouble() * rnd.nextInt(200))
      }.toDF("iid", "lo", "hi")
      val naive = pts.join(ivs, col("x").between(col("lo"), col("hi")))
        .select(col("pid"), col("iid"))
      val width = Seq(1.0, 37.0, 500.0)(trial % 3)
      val got = RangeJoin.bucketed(pts, ivs, "x", "lo", "hi", width)
        .select(col("pid"), col("iid"))
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"trial $trial width $width")
    }
  }

  test("property: random as-of inputs match the naive formulation, all variants") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val lefts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000))).toDF("lid", "k", "t")
    // unique (k, t) on the right — as-of's documented precondition
    val rights = (0 until 200).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(1000), i.toLong))
      .distinctBy(r => (r._1, r._2)).toDF("k", "t", "payload")
    for (strict <- Seq(false, true)) {
      val got = AsOfJoin.backward(lefts, rights, "k", "k", "t", "t", strict = strict)
        .select(col("lid"), col("asof_payload"))
      val cond = if (strict) col("rt") < col("t") else col("rt") <= col("t")
      val r2 = rights.select(col("k").as("rk"), col("t").as("rt"), col("payload"))
      val naive2 = lefts.join(r2, col("k") === col("rk") && cond, "left")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lid")).orderBy(col("rt").desc_nulls_last)))
        .where(col("rn") === 1)
        .select(col("lid"), col("payload").as("asof_payload"))
      assert(got.exceptAll(naive2).isEmpty && naive2.exceptAll(got).isEmpty,
        s"strict=$strict")
    }
  }

  test("property: bucketed as-of == direct sweep on a skewed corpus, all variants") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    // hot key 0 owns ~70% of both sides — the case the direct sweep
    // funnels into one task and the bucketed form spreads over time
    def key(): Long = if (rnd.nextInt(10) < 7) 0L else 1L + rnd.nextInt(4)
    val lefts = (0 until 400).map(i => (i.toLong, key(), rnd.nextInt(5000)))
      .toDF("lid", "k", "t")
    val rights = (0 until 300).map(i => (key(), rnd.nextInt(5000), i.toLong))
      .distinctBy(r => (r._1, r._2)).toDF("k", "t", "payload")
    for (strict <- Seq(false, true); bucket <- Seq(100L, 977L, 100000L)) {
      val got = AsOfJoin.backwardBucketed(lefts, rights, "k", "k", "t", "t",
        bucketSeconds = bucket, strict = strict)
        .select(col("lid"), col("asof_payload"))
      val ref = AsOfJoin.backward(lefts, rights, "k", "k", "t", "t", strict = strict)
        .select(col("lid"), col("asof_payload"))
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"strict=$strict bucket=$bucket")
    }
  }

  test("property: bucketed FORWARD as-of == direct sweep on a skewed corpus, all variants") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(17)
    def key(): Long = if (rnd.nextInt(10) < 7) 0L else 1L + rnd.nextInt(4)
    val lefts = (0 until 400).map(i => (i.toLong, key(), rnd.nextInt(5000)))
      .toDF("lid", "k", "t")
    val rights = (0 until 300).map(i => (key(), rnd.nextInt(5000), i.toLong))
      .distinctBy(r => (r._1, r._2)).toDF("k", "t", "payload")
    for (strict <- Seq(false, true); bucket <- Seq(100L, 977L, 100000L)) {
      val got = AsOfJoin.forwardBucketed(lefts, rights, "k", "k", "t", "t",
        bucketSeconds = bucket, strict = strict)
        .select(col("lid"), col("asof_payload"))
      val ref = AsOfJoin.forward(lefts, rights, "k", "k", "t", "t", strict = strict)
        .select(col("lid"), col("asof_payload"))
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"strict=$strict bucket=$bucket")
    }
  }

  test("bucketed forward as-of with tolerance matches the direct form on the fixture") {
    val got = AsOfJoin.forwardBucketed(views, purchases, "user_id", "user_id",
      "ts", "ts", bucketSeconds = 1800L, tolerance = Some("30 minutes"))
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
    val ref = AsOfJoin.forward(views, purchases, "user_id", "user_id", "ts", "ts",
      tolerance = Some("30 minutes"))
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("bucketed as-of with tolerance matches the direct form on the fixture") {
    val got = AsOfJoin.backwardBucketed(views, purchases, "user_id", "user_id",
      "ts", "ts", bucketSeconds = 1800L, tolerance = Some("30 minutes"))
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
    val ref = AsOfJoin.backward(views, purchases, "user_id", "user_id", "ts", "ts",
      tolerance = Some("30 minutes"))
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("bucketed as-of sweep shuffles on (key, time-bucket), not key alone") {
    val plan = AsOfJoin.backwardBucketed(views, purchases, "user_id", "user_id",
      "ts", "ts").queryExecution.executedPlan.toString
    // the pass-B window's exchange must carry both __k and __b
    assert("hashpartitioning\\(__k[^)]*__b".r.findFirstIn(plan).isDefined, plan)
  }

  test("interpolateGrid: linear blends between neighbors, no extrapolation, single-point keys") {
    val s = spark; import s.implicits._
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // key 1: observations at hours 0 (v=10) and 4 (v=30) — hours 1..3
    // interpolate linearly; key 2: a single observation — one grid row
    val ev = Seq(
      (1L, ts(0), 10.0), (1L, ts(4), 30.0),
      (2L, ts(7), 5.0)
    ).toDF("user_id", "ts", "value")
    val got = AsOfJoin.interpolateGrid(ev, "user_id", "ts", sum(col("value")))
      .orderBy(col("user_id"), col("grid_ts"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, "2024-01-01 00:00:00.0", 1L, 10.0),
      (1L, "2024-01-01 01:00:00.0", 0L, 15.0),
      (1L, "2024-01-01 02:00:00.0", 0L, 20.0),
      (1L, "2024-01-01 03:00:00.0", 0L, 25.0),
      (1L, "2024-01-01 04:00:00.0", 1L, 30.0),
      (2L, "2024-01-01 07:00:00.0", 1L, 5.0)))
    // two events in one bucket aggregate before interpolation
    val ev2 = Seq((1L, ts(0), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 2.0),
      (1L, ts(2), 9.0)).toDF("user_id", "ts", "value")
    val g2 = AsOfJoin.interpolateGrid(ev2, "user_id", "ts", sum(col("value")))
      .orderBy(col("grid_ts")).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(g2.toSeq === Seq((2L, 3.0), (0L, 6.0), (1L, 9.0)))
  }

  test("interpolateGrid is microsecond-granular: millisecond inputs bucket and blend sub-second") {
    val s = spark; import s.implicits._
    val t = (ms: String) => java.sql.Timestamp.valueOf(s"2024-01-01 00:00:$ms")
    // 250 ms grid: observations at 0.000 (v=0) and 1.000 (v=8) — the
    // three sub-second grid points 0.250/0.500/0.750 blend 2/4/6; a
    // seconds-truncating implementation would collapse both observations'
    // millisecond structure and emit nothing between whole seconds
    val ev = Seq(
      (1L, t("00.000"), 0.0), (1L, t("01.000"), 8.0),
      // two events 300 ms apart inside ONE second land in DIFFERENT
      // 250 ms buckets (second-granular bucketing would merge them)
      (2L, t("05.100"), 1.0), (2L, t("05.400"), 3.0)
    ).toDF("user_id", "ts", "value")
    val got = AsOfJoin.interpolateGridMicros(ev, "user_id", "ts",
      sum(col("value")), stepMicros = 250000L)
      .orderBy(col("user_id"), col("grid_ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, "2024-01-01 00:00:00.0", 1L, 0.0),
      (1L, "2024-01-01 00:00:00.25", 0L, 2.0),
      (1L, "2024-01-01 00:00:00.5", 0L, 4.0),
      (1L, "2024-01-01 00:00:00.75", 0L, 6.0),
      (1L, "2024-01-01 00:00:01.0", 1L, 8.0),
      (2L, "2024-01-01 00:00:05.0", 1L, 1.0),
      (2L, "2024-01-01 00:00:05.25", 1L, 3.0)))
    // the whole-second overload routes sub-second events to the right
    // hour bucket (no unix_timestamp truncation anywhere in the path)
    val ev2 = Seq((1L, t("59.999"), 7.0)).toDF("user_id", "ts", "value")
    val one = AsOfJoin.interpolateGrid(ev2, "user_id", "ts", sum(col("value")))
      .collect()
    assert(one.length === 1 &&
      one.head.getTimestamp(1).toString === "2024-01-01 00:00:00.0")
  }

  test("range join plan is a hash/sort-merge equi-join, not a nested loop") {
    val pts = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_acctbal"))
    val ivs = Tables.part(spark, sf()).select(col("p_partkey"),
      (col("p_retailprice") - lit(10.0)).as("lo"),
      (col("p_retailprice") + lit(10.0)).as("hi"))
    val plan = RangeJoin.bucketed(pts, ivs, "c_acctbal", "lo", "hi", 64.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
