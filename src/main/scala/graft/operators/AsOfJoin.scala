package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: each left row matched to the single most recent
  * right row of the same key whose timestamp is at-or-before (backward,
  * inclusive) or strictly-before (`strict`) the left row's timestamp.
  *
  * Spark has no native as-of join; the naive formulation
  * (`l JOIN r ON l.k = r.k AND r.ts <= l.ts` + max-per-group) explodes to
  * the full history per left row before pruning. This composition is the
  * union-sweep plan instead — the same shape Flink's temporal join and
  * pandas `merge_asof` use, but expressed declaratively:
  *
  *   1. tag both sides, union on (key, ts, side, payload-struct),
  *   2. one hash shuffle on key, in-partition sort by (ts, side),
  *   3. running `last(right_payload, ignoreNulls)` window — each left row
  *      sees exactly the latest right row at that point in the sweep,
  *   4. keep left rows, unpack the matched struct.
  *
  * Cost: ONE shuffle of |L|+|R| rows keyed by join key, no intermediate
  * blow-up — survives arbitrarily deep right histories. Skew note (100 TB):
  * the shuffle is keyed on the join key alone, so a single hot key lands in
  * one partition; for low-cardinality/hot keys, pre-bucket by
  * `(key, ts-coarse-bucket)` and carry the last-right-per-bucket boundary
  * rows into the next bucket (two-pass), or salt the window as in
  * grouped-top-k. The fixture keys are uniform, so the direct form is used.
  *
  * The right payload travels as one struct column, so `ignoreNulls` skips
  * unmatched (left) union rows even when individual right columns are null.
  * Rows of `right` sharing an exact (key, ts) are not ordered between
  * themselves — dedupe the right side first if that pair is not unique.
  *
  * Reference anchor: the reference's only temporal notion is the sorted
  * key cursor (ParquetRewriter.java:253-301); as-of lookup is the
  * straightforward temporal extension a training-data pipeline needs
  * (joining samples to the latest feature snapshot).
  */
object AsOfJoin {

  /** @param matchPrefix prefix for matched right columns in the output
    * @param strict      true → match strictly-before (r.ts < l.ts);
    *                    false → at-or-before (r.ts <= l.ts)
    * @param tolerance   max staleness: matches older than this interval
    *                    (e.g. "2 hours") are nulled out (pandas merge_asof
    *                    tolerance) — applied as a post-filter on the
    *                    matched struct, no extra shuffle */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               matchPrefix: String = "asof_",
               strict: Boolean = false,
               tolerance: Option[String] = None): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(_ == rightKey).toSeq
    val lStructT = left.select(struct(left.columns.map(col).toSeq: _*)).schema.head.dataType
    val rStructT = right.select(struct(rightPayloadCols.map(col): _*)).schema.head.dataType

    // at equal ts: right rows sort before left (side 0 < 1) → inclusive;
    // strict puts them after (side 2) so the sweep hasn't seen them yet
    val rSide = if (strict) 2 else 0
    val l = left.select(col(leftKey).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"),
      struct(left.columns.map(col).toSeq: _*).as("__l"),
      lit(null).cast(rStructT).as("__r"))
    val r = right.select(col(rightKey).as("__k"), col(rightTs).as("__t"),
      lit(rSide).as("__side"),
      lit(null).cast(lStructT).as("__l"),
      struct(rightPayloadCols.map(col): _*).as("__r"))

    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sweptRaw = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val swept = tolerance match {
      case Some(t) => sweptRaw.withColumn("__m",
        when(col("__m").isNotNull &&
          col("__m").getField(rightTs) >= col("__t") - expr(s"interval $t"),
          col("__m")))
      case None => sweptRaw
    }

    val outCols =
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
      rightPayloadCols.map(c => col("__m").getField(c).as(s"$matchPrefix$c"))
    swept.select(outCols: _*)
  }

  /** Hot-key-safe backward as-of join: the two-pass bucketed variant of
    * [[backward]] for low-cardinality / skewed keys, where the direct
    * sweep's single shuffle on the join key would put one hot key's whole
    * history in one task.
    *
    * Pass A (carry computation, aggregate-sized): per (key, time bucket),
    * the latest right row in that bucket (`max_by` — a partial-aggregating
    * one-shuffle reduction), then a running `last` over the per-key bucket
    * SEQUENCE (one row per bucket, not per event) gives each bucket its
    * carry-in: the latest right row from all earlier buckets.
    *
    * Pass B (sweep, bucketed): the [[backward]] union-sweep, but
    * partitioned by (key, bucket) with the carry-in injected as a
    * synthetic right row (its true timestamp is strictly below every
    * in-bucket timestamp, so it sorts first) — left rows preceding any
    * in-bucket right row match the carry. A hot key now spreads over its
    * time buckets; rows per task are bounded by bucket width, not key
    * frequency.
    *
    * Results are identical to [[backward]] (TemporalJoinSpec property
    * test); `bucketSeconds` only trades carry-table size against per-task
    * row count. */
  def backwardBucketed(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       bucketSeconds: Long = 3600L,
                       matchPrefix: String = "asof_",
                       strict: Boolean = false,
                       tolerance: Option[String] = None): DataFrame = {
    require(bucketSeconds > 0)
    val rightPayloadCols = right.columns.filterNot(_ == rightKey).toSeq
    val lStructT = left.select(struct(left.columns.map(col).toSeq: _*)).schema.head.dataType
    val rStructT = right.select(struct(rightPayloadCols.map(col): _*)).schema.head.dataType

    val rSide = if (strict) 2 else 0
    def bucketOf(ts: Column) = floor(ts.cast("double") / bucketSeconds).cast("long")
    val l = left.select(col(leftKey).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"),
      struct(left.columns.map(col).toSeq: _*).as("__l"),
      lit(null).cast(rStructT).as("__r"))
      .withColumn("__b", bucketOf(col("__t")))
    val r = right.select(col(rightKey).as("__k"), col(rightTs).as("__t"),
      lit(rSide).as("__side"),
      lit(null).cast(lStructT).as("__l"),
      struct(rightPayloadCols.map(col): _*).as("__r"))
      .withColumn("__b", bucketOf(col("__t")))

    // pass A: latest right per (key, bucket); ties at equal ts are
    // unordered between right rows, as in the direct sweep
    val perBucket = r.groupBy(col("__k"), col("__b"))
      .agg(max_by(col("__r"), col("__t")).as("__last_r"))
    // bucket spine: every (key, bucket) either side touches, so carries
    // reach left-only buckets too; the running last is over ONE ROW PER
    // BUCKET — bounded by the key's time span / bucketSeconds, never by
    // its event count
    val spine = l.select(col("__k"), col("__b"))
      .unionByName(perBucket.select(col("__k"), col("__b"))).distinct()
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = spine.join(perBucket, Seq("__k", "__b"), "left")
      .withColumn("__carry", last(col("__last_r"), ignoreNulls = true).over(wCarry))
      .where(col("__carry").isNotNull)
      .select(col("__k"), col("__b"), col("__carry"))

    // pass B: the sweep, now keyed by (key, bucket); the carry's real ts
    // is strictly below the bucket's start so it always sorts first
    // (side -1 is belt-and-braces)
    val carryRows = carries.select(col("__k"),
      col("__carry").getField(rightTs).as("__t"),
      lit(-1).as("__side"),
      lit(null).cast(lStructT).as("__l"),
      col("__carry").as("__r"),
      col("__b"))
    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sweptRaw = l.unionByName(r).unionByName(carryRows)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val swept = tolerance match {
      case Some(t) => sweptRaw.withColumn("__m",
        when(col("__m").isNotNull &&
          col("__m").getField(rightTs) >= col("__t") - expr(s"interval $t"),
          col("__m")))
      case None => sweptRaw
    }

    val outCols =
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
      rightPayloadCols.map(c => col("__m").getField(c).as(s"$matchPrefix$c"))
    swept.select(outCols: _*)
  }

  /** Forward as-of join: the *earliest* right row at-or-after (or strictly
    * after) each left row — the same sweep run in reverse time order. */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTs: String, rightTs: String,
              matchPrefix: String = "asof_",
              strict: Boolean = false,
              tolerance: Option[String] = None): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(_ == rightKey).toSeq
    val lStructT = left.select(struct(left.columns.map(col).toSeq: _*)).schema.head.dataType
    val rStructT = right.select(struct(rightPayloadCols.map(col): _*)).schema.head.dataType

    val rSide = if (strict) 2 else 0
    val l = left.select(col(leftKey).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"),
      struct(left.columns.map(col).toSeq: _*).as("__l"),
      lit(null).cast(rStructT).as("__r"))
    val r = right.select(col(rightKey).as("__k"), col(rightTs).as("__t"),
      lit(rSide).as("__side"),
      lit(null).cast(lStructT).as("__l"),
      struct(rightPayloadCols.map(col): _*).as("__r"))

    // descending sweep: at equal ts, right first (side asc) for inclusive,
    // right last for strict — mirror of backward
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sweptRaw = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val swept = tolerance match {
      case Some(t) => sweptRaw.withColumn("__m",
        when(col("__m").isNotNull &&
          col("__m").getField(rightTs) <= col("__t") + expr(s"interval $t"),
          col("__m")))
      case None => sweptRaw
    }

    val outCols =
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
      rightPayloadCols.map(c => col("__m").getField(c).as(s"$matchPrefix$c"))
    swept.select(outCols: _*)
  }

  /** Hot-key-safe forward as-of join — [[backwardBucketed]] mirrored in
    * time: carries flow from LATER buckets backward (the earliest right
    * row of each later bucket), and the per-bucket sweep runs in
    * descending time order. Identical results to [[forward]]
    * (TemporalJoinSpec property test); per-task rows bounded by bucket
    * width, not key frequency. */
  def forwardBucketed(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTs: String, rightTs: String,
                      bucketSeconds: Long = 3600L,
                      matchPrefix: String = "asof_",
                      strict: Boolean = false,
                      tolerance: Option[String] = None): DataFrame = {
    require(bucketSeconds > 0)
    val rightPayloadCols = right.columns.filterNot(_ == rightKey).toSeq
    val lStructT = left.select(struct(left.columns.map(col).toSeq: _*)).schema.head.dataType
    val rStructT = right.select(struct(rightPayloadCols.map(col): _*)).schema.head.dataType

    val rSide = if (strict) 2 else 0
    def bucketOf(ts: Column) = floor(ts.cast("double") / bucketSeconds).cast("long")
    val l = left.select(col(leftKey).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"),
      struct(left.columns.map(col).toSeq: _*).as("__l"),
      lit(null).cast(rStructT).as("__r"))
      .withColumn("__b", bucketOf(col("__t")))
    val r = right.select(col(rightKey).as("__k"), col(rightTs).as("__t"),
      lit(rSide).as("__side"),
      lit(null).cast(lStructT).as("__l"),
      struct(rightPayloadCols.map(col): _*).as("__r"))
      .withColumn("__b", bucketOf(col("__t")))

    // pass A: EARLIEST right per (key, bucket); carry-in for a bucket is
    // the earliest right row among all LATER buckets
    val perBucket = r.groupBy(col("__k"), col("__b"))
      .agg(min_by(col("__r"), col("__t")).as("__first_r"))
    val spine = l.select(col("__k"), col("__b"))
      .unionByName(perBucket.select(col("__k"), col("__b"))).distinct()
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = spine.join(perBucket, Seq("__k", "__b"), "left")
      .withColumn("__carry", last(col("__first_r"), ignoreNulls = true).over(wCarry))
      .where(col("__carry").isNotNull)
      .select(col("__k"), col("__b"), col("__carry"))

    // pass B: descending sweep keyed by (key, bucket); the carry's real
    // ts is strictly above the bucket's end so it sorts first in the
    // descending order (side -1 is belt-and-braces)
    val carryRows = carries.select(col("__k"),
      col("__carry").getField(rightTs).as("__t"),
      lit(-1).as("__side"),
      lit(null).cast(lStructT).as("__l"),
      col("__carry").as("__r"),
      col("__b"))
    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sweptRaw = l.unionByName(r).unionByName(carryRows)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val swept = tolerance match {
      case Some(t) => sweptRaw.withColumn("__m",
        when(col("__m").isNotNull &&
          col("__m").getField(rightTs) <= col("__t") + expr(s"interval $t"),
          col("__m")))
      case None => sweptRaw
    }

    val outCols =
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
      rightPayloadCols.map(c => col("__m").getField(c).as(s"$matchPrefix$c"))
    swept.select(outCols: _*)
  }

  /** Dense per-key time grid with LINEAR interpolation — the companion
    * of the LOCF gap fill (q63): observations are bucketed to the grid
    * step, missing grid points between two observations take the linear
    * blend v0 + (v1−v0)·(g−t0)/(t1−t0), observed points keep their own
    * (aggregated) value, and the grid spans each key's observed range so
    * no extrapolation happens. Returns
    * (keyCol, grid_ts, n_events, v_interp).
    *
    * Granularity contract: bucketing and blend weights are computed on
    * EPOCH MICROSECONDS (Spark's full timestamp precision) — sub-second
    * event times route to the right bucket and move the blend; nothing
    * truncates to whole seconds. Sub-second grids go through
    * [[interpolateGridMicros]]; this overload is the whole-second
    * convenience (for second-aligned buckets the micro blend weights are
    * exact multiples of 10⁶, so the double division is bit-identical to
    * the seconds form — whole-second oracles are unaffected).
    *
    * Plan shape (the q63 discipline, no per-key blow-up): one
    * aggregation to the grid step, one window per key for the NEXT
    * observation, one `sequence` explode bounded by the neighbor gap —
    * every stage shuffles on the key only, rows ∝ output grid. The
    * aggregated value should be made deterministic by the caller
    * (e.g. a decimal-summed double) when an oracle recomputes it. */
  def interpolateGrid(events: DataFrame, keyCol: String, tsCol: String,
                      valCol: Column, stepSeconds: Long = 3600L): DataFrame =
    interpolateGridMicros(events, keyCol, tsCol, valCol,
      stepSeconds * 1000000L)

  /** [[interpolateGrid]] with the step in MICROSECONDS — the sub-second
    * form (e.g. 250 ms sensor grids). Same plan shape and contract. */
  def interpolateGridMicros(events: DataFrame, keyCol: String,
                            tsCol: String, valCol: Column,
                            stepMicros: Long): DataFrame = {
    require(stepMicros > 0, "grid step must be positive")
    val step = s"INTERVAL $stepMicros MICROSECOND"
    // long-exact floor-to-step (epoch micros are positive; pmod keeps the
    // arithmetic integral — no double round-trip at 2^50-scale operands)
    val us = unix_micros(col(tsCol))
    val bucket = timestamp_micros(us - pmod(us, lit(stepMicros)))
    val hourly = events
      .groupBy(col(keyCol), bucket.as("__t0"))
      .agg(valCol.as("__v0"), count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t0"))
    hourly
      .select(col(keyCol), col("__t0"), col("__v0"), col("__n"),
        lead(col("__t0"), 1).over(w).as("__t1"),
        lead(col("__v0"), 1).over(w).as("__v1"))
      .select(col(keyCol), col("__t0"), col("__v0"), col("__n"),
        col("__t1"), col("__v1"),
        explode(sequence(col("__t0"),
          coalesce(col("__t1") - expr(step), col("__t0")),
          expr(step))).as("__g"))
      .select(col(keyCol), col("__g").as("grid_ts"),
        when(col("__g") === col("__t0"), col("__n")).otherwise(lit(0L))
          .as("n_events"),
        when(col("__g") === col("__t0"), col("__v0"))
          // ratio FIRST as one division (a pure function of the real
          // quotient, so micros and seconds weights are bit-identical),
          // THEN scale the delta — a left-assoc (v1−v0)·num/den shape
          // would round the micros-scaled intermediate differently
          .otherwise(col("__v0") +
            (col("__v1") - col("__v0")) *
              ((unix_micros(col("__g")) - unix_micros(col("__t0")))
                .cast("double") /
               (unix_micros(col("__t1")) - unix_micros(col("__t0")))
                .cast("double")))
          .as("v_interp"))
  }
}
