package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Funnel and cohort-retention analytics over the event-stream shape. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stickiness: hand-computed DAU/MAU with a 2-day window") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 12:00:00")), // same user+day dedups
      (2L, ts("2024-01-02 09:00:00")),
      (3L, ts("2024-01-03 09:00:00")))
      .toDF("user_id", "ts")
    val out = EventAnalytics.stickiness(ev, "user_id", "ts", windowDays = 2)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // d1: DAU {1,2}, MAU(d0..d1) {1,2}; d2: DAU {2}, MAU {1,2};
    // d3: DAU {3}, MAU(d2..d3) {2,3}
    assert(out.toSeq == Seq((2L, 2L, 1000000L),
      (1L, 2L, 500000L), (1L, 2L, 500000L)))
  }

  test("rollingAnomalies: sigma-zero spike, 3-sigma boundary, cold start") {
    def mk(vals: Seq[Double], user: Long = 1L) = vals.zipWithIndex.map {
      case (v, i) => (user, i.toLong, ts(f"2024-01-01 10:00:${i}%02d"), v)
    }
    // constant prior (sigma = 0): any deviation flags, equality doesn't;
    // first rows are cold (n < minPrior) and never flag
    val flat = mk(Seq.fill(10)(10.0) ++ Seq(100.0, 10.0))
      .toDF("user_id", "event_id", "ts", "val")
    val f = EventAnalytics.rollingAnomalies(flat, "user_id", "ts",
        "event_id", "val", lookback = 20, kSigma = 3, minPrior = 8)
      .orderBy("event_id").collect()
    assert(f.take(8).forall(_.getAs[Int]("is_anomaly") == 0), "cold start")
    assert(f(10).getAs[Int]("is_anomaly") == 1, "spike over sigma=0 flags")
    assert(f(9).getAs[Int]("is_anomaly") == 0, "equal value never flags")
    // hand-computed 3-sigma boundary over an alternating 9/11 window:
    // (n·x−S)² vs 9(nQ−S²) → 12.0 stays, 15.0 flags
    val alt = Seq.fill(4)(Seq(9.0, 11.0)).flatten
    val a = EventAnalytics.rollingAnomalies(
        (mk(alt :+ 12.0, user = 2L) ++ mk(alt :+ 15.0, user = 3L))
          .toDF("user_id", "event_id", "ts", "val"),
        "user_id", "ts", "event_id", "val",
        lookback = 8, kSigma = 3, minPrior = 8)
      .where(col("event_id") === 8).orderBy("user_id").collect()
    assert(a.map(_.getAs[Int]("is_anomaly")).toSeq == Seq(0, 1))
  }

  test("funnel: ordering, window expiry, chain breaks, absent users") {
    val ev = Seq(
      // user 1: clean view -> click -> purchase inside 24h
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // user 2: click BEFORE the first view never counts; the later
      // click does; purchase lands past the 24h anchor window
      (2L, "click", ts("2024-01-01 08:00:00")),
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "click", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-02 09:30:00")),
      // user 3: view only
      (3L, "view", ts("2024-01-05 00:00:00")),
      // user 4: never enters the funnel (no view at all)
      (4L, "purchase", ts("2024-01-01 10:00:00")),
      // user 5: two views — the FIRST anchors; click sits between them
      (5L, "view", ts("2024-01-03 10:00:00")),
      (5L, "click", ts("2024-01-03 10:30:00")),
      (5L, "view", ts("2024-01-03 11:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    val byUser = out.map(r => r.getLong(0) ->
      ((r.get(1), r.get(2), r.get(3), r.getInt(4)))).toMap
    assert(byUser(1L)._4 === 3)
    assert(byUser(2L) === ((ts("2024-01-01 09:00:00"),
      ts("2024-01-01 10:00:00"), null, 2)))
    assert(byUser(3L) === ((ts("2024-01-05 00:00:00"), null, null, 1)))
    assert(byUser(4L) === ((null, null, null, 0)))
    assert(byUser(5L) === ((ts("2024-01-03 10:00:00"),
      ts("2024-01-03 10:30:00"), null, 2)))
    // invariant: a later step is never set under a broken earlier one
    out.foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(3), s"row $r")
    }
  }

  test("transitionMatrix: hand-computed pairs, per-source normalization") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "view", ts("2024-01-01 10:02:00")),
      (1L, "click", ts("2024-01-01 10:03:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "error", ts("2024-01-01 10:05:00")),
      (3L, "click", ts("2024-01-01 11:00:00")))  // single event: no pair
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.transitionMatrix(ev, "user_id", "event_type", "ts")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long)].collect().toSeq
    // view->click x2, click->view x1, view->error x1
    assert(out === Seq(
      ("click", "view", 1L, 1000000L),
      ("view", "click", 2L, 666666L),     // floor(2/3 * 1e6)
      ("view", "error", 1L, 333333L)))
  }

  test("durationPercentiles: nearest-rank picks, exact long arithmetic") {
    val s = spark; import s.implicits._
    val d = Seq(10L, 20L, 30L, 40L).toDF("dur")
    val out = EventAnalytics.durationPercentiles(d, "dur", Seq(25, 50, 100))
      .orderBy("pct").as[(Int, Long, Long)].collect().toSeq
    // ceil(.25*4)=1, ceil(.5*4)=2, ceil(4)=4
    assert(out === Seq((25, 10L, 4L), (50, 20L, 4L), (100, 40L, 4L)))
    intercept[IllegalArgumentException] {
      EventAnalytics.durationPercentiles(d, "dur", Seq(0))
    }
  }

  test("retention: day-0 equals cohort size; offsets hand-computed") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 05:00:00")), (2L, ts("2024-01-02 05:00:00")),
      (3L, ts("2024-01-02 09:00:00")))
      .toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(ev, "user_id", "ts")
      .select(date_format(col("cohort_date"), "yyyy-MM-dd"),
        col("day_offset"), col("active_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(out === Set(
      ("2024-01-01", 0, 2L),   // users 1 and 2
      ("2024-01-01", 1, 1L),   // user 2 returns next day
      ("2024-01-01", 2, 1L),   // user 1 returns on day 2
      ("2024-01-02", 0, 1L)))  // user 3's cohort
  }

  test("attribution: first/last touch, lookback, no-touch rows, tie-breaks") {
    val ev = Seq(
      // user 1: view then click before the purchase — first=view, last=click
      (1L, "view", ts("2024-01-01 09:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 11:00:00")),
      // user 2: only touch is OUTSIDE the 12h lookback — counts as none
      (2L, "view", ts("2024-01-01 08:00:00")),
      (2L, "purchase", ts("2024-01-02 09:00:00")),
      // user 3: conversion with no touches at all
      (3L, "purchase", ts("2024-01-01 10:00:00")),
      // user 4: two touches at the SAME instant — alphabetical
      // tie-break: first = click (asc), last = view (desc)
      (4L, "click", ts("2024-01-01 09:00:00")),
      (4L, "view", ts("2024-01-01 09:00:00")),
      (4L, "purchase", ts("2024-01-01 09:30:00")),
      // user 5: a touch AT the conversion instant is included; a touch
      // after it is not
      (5L, "click", ts("2024-01-01 12:00:00")),
      (5L, "view", ts("2024-01-01 12:30:00")),
      (5L, "purchase", ts("2024-01-01 12:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.attribution(ev, "user_id", "event_type", "ts",
        conversionType = "purchase",
        touchTypes = Seq("click", "signup", "view"), lookback = "12 hours")
      .collect().map(r => r.getLong(0) ->
        ((r.get(2), r.get(4), r.getLong(6)))).toMap
    assert(out(1L) === (("view", "click", 2L)))
    assert(out(2L) === ((null, null, 0L)))
    assert(out(3L) === ((null, null, 0L)))
    assert(out(4L) === (("click", "view", 2L)))
    assert(out(5L) === (("click", "click", 1L)))
    // conversionType in touchTypes is a contract violation
    intercept[IllegalArgumentException] {
      EventAnalytics.attribution(ev, "user_id", "event_type", "ts",
        "purchase", Seq("purchase", "view"))
    }
  }
}
