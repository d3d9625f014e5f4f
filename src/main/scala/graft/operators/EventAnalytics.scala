package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics over the (user, type, timestamp)
  * shape: ordered funnels and cohort retention — the classic
  * warehouse-side companions to the windowed/sessionized operators.
  *
  * Both are declarative multi-join plans keyed on the user: every stage
  * is a user-keyed partial aggregation or join, so the shuffles are
  * user-cardinality-bounded and the event table streams through scans
  * with the step predicates pushed down — no per-user event-list
  * collection, no window over the whole event log.
  */
object EventAnalytics {

  /** Strict-order conversion funnel: for each user, step 1 anchors at
    * their FIRST `steps(0)` event; each later step is the first matching
    * event strictly after the previous step's time and within `window`
    * of the anchor (the "complete the funnel within N hours of entering"
    * convention). Every user in the table returns with their per-step
    * timestamps (null once the chain breaks — a later step can never be
    * non-null under a broken earlier one) and `steps_completed`.
    *
    * Scale shape: one filtered scan + user-keyed min per step (the step
    * predicate reaches the parquet scan), chained through user-keyed
    * joins — shuffles are user-bounded, never event-log-sorted. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             window: String = "24 hours"): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val users = events.select(col(userCol)).distinct()
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_1_ts"))
      .withColumn("__deadline", col("step_1_ts") + expr(s"INTERVAL $window"))
    val chain = steps.zipWithIndex.tail.foldLeft(first) {
      case (prev, (st, i)) =>
        val prevTs = s"step_${i}_ts"
        val curTs = s"step_${i + 1}_ts"
        val cur = events.where(col(typeCol) === st)
          .join(prev.select(col(userCol), col(prevTs), col("__deadline")),
            Seq(userCol))
          .where(col(tsCol) > col(prevTs) && col(tsCol) <= col("__deadline"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(curTs))
        prev.join(cur, Seq(userCol), "left")
    }
    val stepCols = steps.indices.map(i => col(s"step_${i + 1}_ts"))
    val completed = stepCols.map(_.isNotNull.cast("int")).reduce(_ + _)
    users.join(chain.drop("__deadline"), Seq(userCol), "left")
      .select(col(userCol) +: stepCols :+ completed.as("steps_completed"): _*)
  }

  /** Event-type TRANSITION matrix: consecutive-event pairs within each
    * user's timeline (ordered by (ts, type) so equal timestamps stay
    * deterministic), counted per (from, to) with the per-source
    * transition probability as floor-micros — the Markov view of user
    * journeys (what follows a view? where do errors lead?).
    *
    * Scale shape: the only per-event sort is the user-partitioned lead
    * window — bounded by one user's history, never the event log; the
    * (from, to) aggregate is |types|²-sized, and the probability
    * normalization windows over THAT, metadata. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(typeCol))
    val pairs = events
      .select(col(userCol), col(typeCol), col(tsCol))
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .where(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val perFrom = Window.partitionBy(col("from_type"))
    pairs.withColumn("p_micros",
      floor(col("n").cast("double") / sum(col("n")).over(perFrom)
        * lit(1000000.0)).cast("long"))
  }

  /** EXACT nearest-rank percentiles over a duration column — time-to-
    * convert reporting for funnel completions. Nearest-rank:
    * `rank_p = ceil(p·n/100)` computed in exact long arithmetic
    * (`(n·p + 99) / 100`), so the picked rows are bit-replayable. The
    * ranking window runs over the input relation — sized for funnel
    * COMPLETIONS (the funnel's output, orders of magnitude below the
    * event log); for corpus-scale inputs the per-group gate machinery
    * (CorpusPrep.gateByRank) is the sort-free path. */
  def durationPercentiles(rows: DataFrame, durCol: String,
                          percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    import org.apache.spark.sql.expressions.Window
    val n = rows.agg(count(lit(1)).as("__n"))
    val ranked = rows.select(col(durCol).cast("long").as("__d"))
      .withColumn("__r", row_number().over(Window.orderBy(col("__d").asc)))
      .crossJoin(broadcast(n))
    percentiles.distinct.sorted.map { p =>
      // ceil(p·n/100) as (n·p + 99) div 100 — Column./ is DOUBLE
      // division, so floor the exact-representable quotient
      ranked
        .where(col("__r") ===
          floor((col("__n") * lit(p.toLong) + lit(99L)) / lit(100.0))
            .cast("long"))
        .select(lit(p).as("pct"), col("__d").as("duration_micros"),
          col("__n").as("n"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by their first-active DAY, counted
    * on each later day they return — the (cohort_date, day_offset,
    * active_users) triangle. Day-0 row per cohort equals the cohort
    * size. One (user, day) distinct + one user-keyed min + one
    * (cohort, offset) count; rows after the first distinct are already
    * unique per (user, day), so the final count needs no distinct. */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val activity = events
      .select(col(userCol), to_date(col(tsCol)).as("__d")).distinct()
    val cohort = activity.groupBy(col(userCol))
      .agg(min(col("__d")).as("cohort_date"))
    activity.join(cohort, Seq(userCol))
      .groupBy(col("cohort_date"),
        datediff(col("__d"), col("cohort_date")).as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** First/last-touch ATTRIBUTION: for every `conversionType` event,
    * the earliest and latest preceding touch event (type in
    * `touchTypes`, same user, within `lookback` of the conversion,
    * strictly before-or-at it) plus the touch count — the standard
    * marketing-attribution report, and the general "what led to X"
    * join for event corpora. Conversions with no in-window touch keep
    * their row with null touches and `n_touches = 0` (auditable — the
    * gate-with-receipts discipline).
    *
    * Tie-breaks are deterministic: at equal timestamps the
    * alphabetically-first type wins for first touch and the
    * alphabetically-last for last touch (min/max over a (ts, type)
    * struct), so results are engine-replayable.
    *
    * Scale shape: a RANGE-FRAME window over user-ordered events —
    * min/max/count of touch structs in the sliding
    * `(conv − lookback, conv]` frame — never the conv×touch join a
    * naive formulation materializes (a bot user with k conversions and
    * m in-window touches costs k·m rows there; here one pass over that
    * user's timeline). The scan is type-filtered to touches +
    * conversions (pushdown) and the only shuffle is the user-keyed
    * window partition, bounded by one user's history — the funnel
    * family's accepted shape. The exclusive lower bound is exact: the
    * frame starts at `−(lookback − 1 µs)`, and the fixture timestamps
    * are microsecond-aligned. */
  /** Rolling z-score ANOMALY DETECTION over a per-key ordered value
    * stream — in EXACT integer arithmetic with no square root and no
    * float accumulation: with S/Q/n the trailing window's sum /
    * sum-of-squares / count (current row EXCLUDED — the forecast
    * residual convention), x is anomalous iff
    *
    *   (n·x − S)² > k² · (n·Q − S²)        [ ⟺ (x − μ)² > k²σ², ×n² ]
    *
    * Values enter as `scale`-fixed-point longs (floor(v·scale) — both
    * engines produce the same double product, floor of shared bits is
    * deterministic), so the whole detector is order-independent and
    * replayable by an external oracle. `minPrior` suppresses the
    * cold-start rows (n too small for a meaningful σ). Every input row
    * returns with its flag (auditable-gate contract); a NULL value has
    * no basis for a verdict and carries a NULL flag. S/Q/n aggregate
    * VALUES (nulls contribute nothing), but the frame is ROWS-based: a
    * null row still occupies one of the `lookback` slots and thereby
    * evicts an older real value — on a null-bearing stream the
    * effective value window shrinks below `lookback` (and the
    * streaming twin, whose MetricEvent.value is a primitive, sees no
    * nulls at all). Callers needing full-width windows over sparse
    * values should filter nulls out upstream and join the flag rows
    * back.
    *
    * Scale shape: ONE per-key ordered window (rows-frame sum/count) —
    * the funnel family's accepted user-bounded partition; nothing else
    * shuffles. Overflow headroom: needs n·(scale·|v|max)² < 2^63/k²
    * — at scale=1000, n=20, k=3 that allows |v| up to ~10^6. */
  def rollingAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valueCol: String,
                       lookback: Int = 20, kSigma: Int = 3,
                       minPrior: Int = 8, scale: Int = 1000): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2 (got $lookback)")
    require(kSigma >= 1 && minPrior >= 2, "kSigma >= 1 and minPrior >= 2")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    events
      .withColumn("__v", floor(col(valueCol) * lit(scale)).cast("long"))
      .withColumn("__n", count(col("__v")).over(w))
      .withColumn("__s", coalesce(sum(col("__v")).over(w), lit(0L)))
      .withColumn("__q",
        coalesce(sum(col("__v") * col("__v")).over(w), lit(0L)))
      .withColumn("__d", col("__n") * col("__v") - col("__s"))
      .withColumn("is_anomaly",
        (col("__n") >= minPrior &&
          col("__d") * col("__d") >
            lit(kSigma.toLong * kSigma) *
              (col("__n") * col("__q") - col("__s") * col("__s")))
          .cast("int"))
      .withColumnRenamed("__v", "v_scaled")
      .withColumnRenamed("__n", "n_prior")
      .drop("__s", "__q", "__d")
  }

  /** DAU / rolling-MAU STICKINESS per day — the engagement ratio every
    * product dashboard carries, exact: DAU(d) = distinct users active
    * on d; MAU(d) = distinct users active in (d − window, d]. The MAU
    * side avoids a distinct-over-range window (not expressible as a
    * partial agg) by the CONTRIBUTION flip: a user active on day a is
    * MAU-visible on days [a, a + window), so one bounded explode of
    * the DISTINCT (user, day) pairs (× window rows each, map-side)
    * followed by a distinct + count gives every day's MAU in two
    * partial-agg shuffles — no day ever owns a corpus-sized window
    * partition. Ratio in floor-micros. Trailing days past the data's
    * edge are reported (their MAU window simply extends back). */
  def stickiness(events: DataFrame, userCol: String, tsCol: String,
                 windowDays: Int = 28): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1 (got $windowDays)")
    val ud = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val dau = ud.groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val mau = ud
      .select(col("__u"),
        explode(sequence(col("__d"),
          date_add(col("__d"), windowDays - 1))).as("day"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("mau"))
    // report only days with activity (the dashboard convention); every
    // DAU day has an MAU row by construction (the day contributes to
    // its own window), so the inner join drops nothing
    dau.join(mau, Seq("day"))
      .withColumn("stickiness_micros",
        expr("CAST((dau * 1000000L) DIV mau AS BIGINT)"))
  }

  def attribution(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, conversionType: String,
                  touchTypes: Seq[String],
                  lookback: String = "7 days"): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(conversionType),
      "conversionType cannot also be a touch type")
    val spark = events.sparkSession
    // interval string → exact micros (one constant-folding driver query)
    val lookMicros = spark.sql(
      s"SELECT unix_micros(TIMESTAMP '1970-01-01 00:00:00Z' " +
        s"+ INTERVAL $lookback)").head().getLong(0)
    require(lookMicros > 0, s"lookback must be positive (got $lookback)")
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val touchStruct = when(isTouch,
      struct(col(tsCol).as("__tts"), col(typeCol).as("__tt")))
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-(lookMicros - 1), 0)
    events
      .where(isTouch || col(typeCol) === conversionType)
      .withColumn("__f", min(touchStruct).over(w))
      .withColumn("__l", max(touchStruct).over(w))
      .withColumn("__n", count(touchStruct).over(w))
      .where(col(typeCol) === conversionType)
      .select(col(userCol), col(tsCol).as("conv_ts"),
        col("__f.__tt").as("first_touch"),
        col("__f.__tts").as("first_touch_ts"),
        col("__l.__tt").as("last_touch"),
        col("__l.__tts").as("last_touch_ts"),
        col("__n").as("n_touches"))
      .dropDuplicates(Seq(userCol, "conv_ts"))
  }
}
