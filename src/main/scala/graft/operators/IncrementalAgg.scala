package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped sum/count aggregates from a row-level
  * change feed ([[graft.streaming.CdcMergeSink.changeFeed]]) — the
  * materialized-view refresh primitive: a 100 TB table's dashboard
  * aggregate updates at the cost of the DELTA, never a rescan.
  *
  * Sums and counts are self-maintainable: every before image contributes
  * -1x, every after image +1x, so updates split into a retraction plus an
  * insertion and the algebra closes over unions of deltas. (min/max are
  * NOT self-maintainable under deletes — a deleted minimum forces a
  * rescan of its group — so this operator deliberately stops at the
  * sum/count family; avg = sum/cnt at read time.)
  *
  * NULL conventions, identical in [[fullAgg]] and [[applyDelta]] so the
  * maintained state always equals a recompute: NULL sum-column values
  * count as 0 (a sum is never NULL), and a NULL GROUP key is one group —
  * the delta join is null-safe.
  *
  * Scale shape: one partial-combining shuffle of the feed keyed by group,
  * then a join against the (group-cardinality-sized) previous aggregate —
  * both sides orders of magnitude smaller than the table.
  */
object IncrementalAgg {

  /** Full recompute — defines the aggregate's schema:
    * groupCols ++ (cnt, sum_<c> for each sumCol). */
  def fullAgg(table: DataFrame, groupCols: Seq[String],
              sumCols: Seq[String]): DataFrame =
    table.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(coalesce(col(c), lit(0))).as(s"sum_$c")): _*)

  /** Full recompute including min/max extrema — defines the schema of
    * [[applyDeltaWithExtrema]]: groupCols ++ (cnt, sum_<c>..., min_<e>,
    * max_<e>...). Extrema follow SQL semantics (nulls ignored; all-null
    * group -> null). */
  def fullAggWithExtrema(table: DataFrame, groupCols: Seq[String],
                         sumCols: Seq[String],
                         extremaCols: Seq[String]): DataFrame =
    table.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(coalesce(col(c), lit(0))).as(s"sum_$c")) ++
          extremaCols.flatMap(c => Seq(
            min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** Maintain min/max alongside sums/counts. The asymmetry min/max has
    * under deletes is handled surgically: INSERTS only ever tighten an
    * extremum (`least`/`greatest` with the previous value — free), while
    * a retraction whose value TOUCHES the group's current extremum makes
    * that group "dirty" and only dirty groups are recomputed — from
    * `newTable` filtered to them (a group-key join the scan can prune
    * on), never a full rescan. A steady workload whose deletes rarely hit
    * extrema pays nothing beyond [[applyDelta]].
    *
    * `newTable` must be the table state AFTER the feed was applied. */
  def applyDeltaWithExtrema(prevAgg0: DataFrame, feed0: DataFrame,
                            newTable: DataFrame, groupCols: Seq[String],
                            sumCols: Seq[String],
                            extremaCols: Seq[String]): DataFrame = {
    require(extremaCols.nonEmpty, "use applyDelta when no extrema are maintained")
    // feed: 3 references (sums delta + both extrema images); prevAgg: 2
    // (sums join + stored extrema) — materialize each once (delta- /
    // group-sized; idempotent if the caller already checkpointed)
    val feed = Materialize.ckIfLazy(feed0)
    val prevAgg = Materialize.ckIfLazy(prevAgg0)
    val sums = applyDelta(
      prevAgg.select((groupCols.map(col) :+ col("cnt")) ++
        sumCols.map(c => col(s"sum_$c")): _*),
      feed, groupCols, sumCols)
    // one pass over the feed: per group, the inserted extrema candidates
    // and the retracted value range
    def img(side: String, tag: String) =
      feed.where(col(side).isNotNull).select(
        groupCols.map(g => col(s"$side.$g").as(g)) ++
          Seq(lit(tag).as("__tag")) ++
          extremaCols.map(c => col(s"$side.$c").as(s"__v_$c")): _*)
    val deltaExt = img("after", "ins").unionByName(img("before", "ret"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__touched"),
        extremaCols.flatMap(c => Seq(
          min(when(col("__tag") === "ins", col(s"__v_$c"))).as(s"__ins_min_$c"),
          max(when(col("__tag") === "ins", col(s"__v_$c"))).as(s"__ins_max_$c"),
          min(when(col("__tag") === "ret", col(s"__v_$c"))).as(s"__ret_min_$c"),
          max(when(col("__tag") === "ret", col(s"__v_$c"))).as(s"__ret_max_$c"))): _*)
      .select(groupCols.map(g => col(g).as(s"__g_$g")) ++
        extremaCols.flatMap(c => Seq(col(s"__ins_min_$c"), col(s"__ins_max_$c"),
          col(s"__ret_min_$c"), col(s"__ret_max_$c"))): _*)
    val prevExt = prevAgg.select(groupCols.map(col) ++
      extremaCols.flatMap(c => Seq(col(s"min_$c"), col(s"max_$c"))): _*)
    val extCond = groupCols.map(g => prevExt(g) <=> deltaExt(s"__g_$g"))
      .reduce(_ && _)
    val joined = prevExt.join(deltaExt, extCond, "full_outer")
    // a retraction at (or past) the stored extremum invalidates it; a
    // comparison against a null side is false (nothing to invalidate)
    val dirtyCond = extremaCols.map { c =>
      (col(s"__ret_min_$c") <= col(s"min_$c")) ||
        (col(s"__ret_max_$c") >= col(s"max_$c"))
    }.reduce(_ || _)
    val merged = joined.select(
      groupCols.map(g => coalesce(prevExt(g), deltaExt(s"__g_$g")).as(g)) ++
        Seq(coalesce(dirtyCond, lit(false)).as("__dirty")) ++
        extremaCols.flatMap(c => Seq(
          least(col(s"min_$c"), col(s"__ins_min_$c")).as(s"__clean_min_$c"),
          greatest(col(s"max_$c"), col(s"__ins_max_$c")).as(s"__clean_max_$c"))): _*)
    val dirtyKeys = merged.where(col("__dirty"))
      .select(groupCols.map(g => col(g).as(s"__g_$g")): _*).distinct()
    val rescanCond = groupCols.map(g => newTable(g) <=> dirtyKeys(s"__g_$g"))
      .reduce(_ && _)
    val reAggs = extremaCols.flatMap(c => Seq(
      min(col(c)).as(s"__re_min_$c"), max(col(c)).as(s"__re_max_$c")))
    val recomputed = newTable.join(dirtyKeys, rescanCond, "inner")
      .groupBy(groupCols.map(col): _*)
      .agg(reAggs.head, reAggs.tail: _*)
      .select(groupCols.map(g => col(g).as(s"__r_$g")) ++
        extremaCols.flatMap(c =>
          Seq(col(s"__re_min_$c"), col(s"__re_max_$c"))): _*)
    val reCond = groupCols.map(g => merged(g) <=> recomputed(s"__r_$g"))
      .reduce(_ && _)
    val ext = merged.join(recomputed, reCond, "left_outer")
      .select(groupCols.map(g => merged(g).as(s"__e_$g")) ++
        extremaCols.flatMap(c => Seq(
          when(col("__dirty"), col(s"__re_min_$c"))
            .otherwise(col(s"__clean_min_$c")).as(s"min_$c"),
          when(col("__dirty"), col(s"__re_max_$c"))
            .otherwise(col(s"__clean_max_$c")).as(s"max_$c"))): _*)
    val finalCond = groupCols.map(g => sums(g) <=> ext(s"__e_$g"))
      .reduce(_ && _)
    sums.join(ext, finalCond, "left_outer")
      .select((groupCols.map(g => sums(g)) :+ col("cnt")) ++
        sumCols.map(c => col(s"sum_$c")) ++
        extremaCols.flatMap(c => Seq(col(s"min_$c"), col(s"max_$c"))): _*)
  }

  /** Full recompute with a mergeable HLL sketch column — defines the
    * schema of [[applyDeltaWithHll]]: groupCols ++ (cnt,
    * hll_<distinctCol>). The sketch column is the PERSISTED incremental
    * distinct-count state: store it in the aggregate table and new data
    * merges in without rescanning history (DataSketches HLL union is
    * exact over sketches — sketch(A∪B) ≡ union(sketch(A), sketch(B)),
    * the linearity the q201 lane pins). */
  def fullAggWithHll(table: DataFrame, groupCols: Seq[String],
                     distinctCol: String, lgK: Int = 12): DataFrame =
    table.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        hll_sketch_agg(col(distinctCol), lit(lgK)).as(s"hll_$distinctCol"))

  /** Maintain a per-group HLL distinct-count sketch from a change feed
    * — the sketch analog of [[applyDeltaWithExtrema]]'s min/max
    * discipline, with the same insert/retract asymmetry handled the
    * same way: INSERTS merge exactly (one sketch-union per touched
    * group — cost ∝ delta, never a rescan), while a RETRACTION of a
    * value makes its group "dirty" (HLL cannot subtract) and only
    * dirty groups recompute — from `newTable` filtered to them (a
    * group-key join the scan can prune on). An UPDATE that keeps both
    * the group and the distinct value is NOT dirty (nothing was
    * retracted from the sketch's domain). A steady append-mostly
    * workload pays one KB-sized sketch merge per group per batch.
    *
    * `newTable` must be the table state AFTER the feed was applied.
    * Delta-maintained estimates equal the full recompute's EXACTLY
    * for clean groups (union linearity) and trivially for recomputed
    * ones — the spec pins estimate equality, not approximate
    * closeness. */
  def applyDeltaWithHll(prevAgg0: DataFrame, feed0: DataFrame,
                        newTable: DataFrame, groupCols: Seq[String],
                        distinctCol: String, lgK: Int = 12): DataFrame = {
    val sk = s"hll_$distinctCol"
    // feed: 3 references (counts delta, insert sketches, dirty keys);
    // prevAgg: 2 (counts join + stored sketches) — one materialization
    // each (guide §7.2; idempotent when already checkpointed)
    val feed = Materialize.ckIfLazy(feed0)
    val prevAgg = Materialize.ckIfLazy(prevAgg0)
    val cnts = applyDelta(
      prevAgg.select(groupCols.map(col) :+ col("cnt"): _*),
      feed, groupCols, Seq.empty)
    // insert-side sketch per group (one pass over the feed)
    val ins = feed.where(col("after").isNotNull)
      .select(groupCols.map(g => col(s"after.$g").as(g)) :+
        col(s"after.$distinctCol").as("__v"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col("__v"), lit(lgK)).as("__ins"))
      .select(groupCols.map(g => col(g).as(s"__i_$g")) :+ col("__ins"): _*)
    // dirty = a retraction whose (group, value) does not survive
    // in place — group moves, value changes, and deletes all retract
    val survives = col("after").isNotNull &&
      groupCols.map(g => col(s"after.$g") <=> col(s"before.$g"))
        .reduce(_ && _) &&
      (col(s"after.$distinctCol") <=> col(s"before.$distinctCol"))
    val dirtyKeys = feed.where(col("before").isNotNull && !survives)
      .select(groupCols.map(g => col(s"before.$g").as(s"__d_$g")): _*)
      .distinct()
      // explicit marker: a NULL group key is a group like any other,
      // so presence cannot be read off the key columns themselves
      .withColumn("__isdirty", lit(true))
    // clean path: previous sketch ∪ inserted sketch (either side may
    // be absent — hll_union null-propagates, so coalesce by presence)
    val prevSk = prevAgg.select(groupCols.map(col) :+ col(sk): _*)
    val insCond = groupCols.map(g => prevSk(g) <=> ins(s"__i_$g"))
      .reduce(_ && _)
    val merged = prevSk.join(ins, insCond, "full_outer")
      .select(
        groupCols.map(g => coalesce(prevSk(g), ins(s"__i_$g")).as(g)) :+
          when(col(sk).isNull, col("__ins"))
            .when(col("__ins").isNull, col(sk))
            .otherwise(hll_union(col(sk), col("__ins"))).as("__clean"): _*)
    val dirtyCond = groupCols.map(g => merged(g) <=> dirtyKeys(s"__d_$g"))
      .reduce(_ && _)
    val cleanWithFlag = merged.join(dirtyKeys, dirtyCond, "full_outer")
      .select(
        groupCols.map(g =>
          coalesce(merged(g), dirtyKeys(s"__d_$g")).as(g)) :+
          col("__clean") :+
          coalesce(col("__isdirty"), lit(false)).as("__dirty"): _*)
    // recompute ONLY the dirty groups from the post-feed table
    val recCond = groupCols.map(g => newTable(g) <=> dirtyKeys(s"__d_$g"))
      .reduce(_ && _)
    val recomputed = newTable.join(dirtyKeys, recCond, "inner")
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(distinctCol), lit(lgK)).as("__re"))
      .select(groupCols.map(g => col(g).as(s"__r_$g")) :+ col("__re"): _*)
    val reCond = groupCols.map(g => cleanWithFlag(g) <=> recomputed(s"__r_$g"))
      .reduce(_ && _)
    val sketches = cleanWithFlag.join(recomputed, reCond, "left_outer")
      .select(groupCols.map(g => cleanWithFlag(g).as(s"__s_$g")) :+
        when(col("__dirty"), col("__re")).otherwise(col("__clean")).as(sk): _*)
    val finalCond = groupCols.map(g => cnts(g) <=> sketches(s"__s_$g"))
      .reduce(_ && _)
    cnts.join(sketches, finalCond, "left_outer")
      .select(groupCols.map(g => cnts(g)) :+ col("cnt") :+ col(sk): _*)
  }

  /** Full recompute with a mergeable QUANTILE-SAMPLE sketch column —
    * defines the schema of [[applyDeltaWithQuantile]]: groupCols ++
    * (cnt, qsk_<valueCol>). The sketch ([[graft.functions.Udx
    * .quantileSample]]) is the k lex-smallest (portable-hash-of-id,
    * value) pairs per group — a persisted incremental percentile
    * state: merge-order independent (pure set algebra), so the stored
    * column is a deterministic function of the data and an external
    * oracle replays estimates EXACTLY (the q217 discipline; a GK/KLL
    * compactor's content depends on merge topology and could be
    * neither replayed nor compared delta-vs-full). NULL values count
    * as 0 (this operator's sum-family NULL convention). */
  def fullAggWithQuantile(table: DataFrame, groupCols: Seq[String],
                          valueCol: String, idCol: String,
                          k: Int = 256): DataFrame =
    table.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        graft.functions.Udx.quantileSample(k)(
          graft.functions.Udx.kmvHash(col(idCol).cast("string")),
          coalesce(col(valueCol), lit(0)).cast("double"))
          .as(s"qsk_$valueCol"))

  /** Maintain a per-group quantile-sample sketch from a change feed —
    * the percentile analog of [[applyDeltaWithHll]], same
    * insert/retract asymmetry: INSERTS merge exactly (bottom-k(A∪B)
    * is computable from the two bottom-k sets — one k-sized
    * set-union per touched group, cost ∝ delta), while a RETRACTION
    * makes its group "dirty" (a deleted row might be a sample member)
    * and only dirty groups recompute from `newTable`, group-key
    * pruned. An UPDATE preserving (group, id, value) retracts
    * nothing. Delta-maintained sketches EQUAL the full recompute's
    * exactly — for clean groups by the bottom-k union lemma, for
    * dirty ones trivially — so the spec pins sketch equality, not
    * approximate closeness.
    *
    * `idCol` must be BOTH the table's row-identity column and the
    * feed's top-level key column (the CdcMergeSink feed shape: key +
    * change_type + before/after structs of the non-key fields) — key
    * values never change within a feed row, so a surviving update
    * keeps its (hash, value) pair iff group and value survive.
    *
    * `newTable` must be the table state AFTER the feed was applied. */
  def applyDeltaWithQuantile(prevAgg0: DataFrame, feed0: DataFrame,
                             newTable: DataFrame, groupCols: Seq[String],
                             valueCol: String, idCol: String,
                             k: Int = 256): DataFrame = {
    import graft.functions.Udx
    val sk = s"qsk_$valueCol"
    // feed: 3 references; prevAgg: 2 — one materialization each
    // (guide §7.2; idempotent when already checkpointed)
    val feed = Materialize.ckIfLazy(feed0)
    val prevAgg = Materialize.ckIfLazy(prevAgg0)
    val cnts = applyDelta(
      prevAgg.select(groupCols.map(col) :+ col("cnt"): _*),
      feed, groupCols, Seq.empty)
    // insert-side sketch per group (one pass over the feed)
    val ins = feed.where(col("after").isNotNull)
      .select(groupCols.map(g => col(s"after.$g").as(g)) ++ Seq(
        Udx.kmvHash(col(idCol).cast("string")).as("__h"),
        coalesce(col(s"after.$valueCol"), lit(0)).cast("double")
          .as("__v")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(Udx.quantileSample(k)(col("__h"), col("__v")).as("__ins"))
      .select(groupCols.map(g => col(g).as(s"__i_$g")) :+ col("__ins"): _*)
    // dirty = a retraction whose (group, value) does not survive in
    // place — group moves, value changes, and deletes all retract a
    // (hash, value) pair the stored sample may contain (the key, and
    // so the hash, is constant within a feed row)
    val survives = col("after").isNotNull &&
      groupCols.map(g => col(s"after.$g") <=> col(s"before.$g"))
        .reduce(_ && _) &&
      (col(s"after.$valueCol") <=> col(s"before.$valueCol"))
    val dirtyKeys = feed.where(col("before").isNotNull && !survives)
      .select(groupCols.map(g => col(s"before.$g").as(s"__d_$g")): _*)
      .distinct()
      .withColumn("__isdirty", lit(true))
    // clean path: k smallest of previous sample ∪ inserted sample
    val prevSk = prevAgg.select(groupCols.map(col) :+ col(sk): _*)
    val insCond = groupCols.map(g => prevSk(g) <=> ins(s"__i_$g"))
      .reduce(_ && _)
    val merged = prevSk.join(ins, insCond, "full_outer")
      .select(
        groupCols.map(g => coalesce(prevSk(g), ins(s"__i_$g")).as(g)) :+
          when(col(sk).isNull, col("__ins"))
            .when(col("__ins").isNull, col(sk))
            .otherwise(Udx.quantileSampleMerge(col(sk), col("__ins"), k))
            .as("__clean"): _*)
    val dirtyCond = groupCols.map(g => merged(g) <=> dirtyKeys(s"__d_$g"))
      .reduce(_ && _)
    val cleanWithFlag = merged.join(dirtyKeys, dirtyCond, "full_outer")
      .select(
        groupCols.map(g =>
          coalesce(merged(g), dirtyKeys(s"__d_$g")).as(g)) :+
          col("__clean") :+
          coalesce(col("__isdirty"), lit(false)).as("__dirty"): _*)
    // recompute ONLY the dirty groups from the post-feed table
    val recCond = groupCols.map(g => newTable(g) <=> dirtyKeys(s"__d_$g"))
      .reduce(_ && _)
    val recomputed = newTable.join(dirtyKeys, recCond, "inner")
      .groupBy(groupCols.map(col): _*)
      .agg(Udx.quantileSample(k)(
        Udx.kmvHash(col(idCol).cast("string")),
        coalesce(col(valueCol), lit(0)).cast("double")).as("__re"))
      .select(groupCols.map(g => col(g).as(s"__r_$g")) :+ col("__re"): _*)
    val reCond = groupCols.map(g => cleanWithFlag(g) <=> recomputed(s"__r_$g"))
      .reduce(_ && _)
    val sketches = cleanWithFlag.join(recomputed, reCond, "left_outer")
      .select(groupCols.map(g => cleanWithFlag(g).as(s"__s_$g")) :+
        when(col("__dirty"), col("__re")).otherwise(col("__clean")).as(sk): _*)
    val finalCond = groupCols.map(g => cnts(g) <=> sketches(s"__s_$g"))
      .reduce(_ && _)
    cnts.join(sketches, finalCond, "left_outer")
      .select(groupCols.map(g => cnts(g)) :+ col("cnt") :+ col(sk): _*)
  }

  /** Apply a change feed (key, change_type, before, after — the
    * [[graft.streaming.CdcMergeSink.rowDiff]] shape) to a previous
    * aggregate. Group and sum columns are fields of the before/after
    * structs. Groups whose maintained count reaches zero drop out;
    * previously unseen groups appear. */
  def applyDelta(prevAgg: DataFrame, feed: DataFrame,
                 groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    // the feed (a two-snapshot diff at the storage layer) feeds both
    // image sides — materialize it ONCE (delta-sized; idempotent when
    // the caller already did) instead of re-running the diff per
    // reference (guide §7.2 duplicated subtrees)
    val feedCk = Materialize.ckIfLazy(feed)
    def side(img: String, sign: Int) =
      feedCk.where(col(img).isNotNull).select(
        groupCols.map(g => col(s"$img.$g").as(g)) ++
          Seq(lit(sign.toLong).as("__sign")) ++
          sumCols.map(c =>
            (coalesce(col(s"$img.$c"), lit(0)) * sign).as(s"__d_$c")): _*)
    val delta = side("before", -1).unionByName(side("after", 1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__dcnt"),
        sumCols.map(c => sum(col(s"__d_$c")).as(s"__dsum_$c")): _*)
      // prefixed names so the null-safe join condition below is unambiguous
      .select(groupCols.map(g => col(g).as(s"__g_$g")) ++
        Seq(col("__dcnt")) ++ sumCols.map(c => col(s"__dsum_$c")): _*)
    // null-safe equality: a NULL group key is a group like any other —
    // a plain using-columns join would emit it twice (NULL != NULL)
    val cond = groupCols.map(g => prevAgg(g) <=> delta(s"__g_$g"))
      .reduce(_ && _)
    prevAgg.join(delta, cond, "full_outer")
      .select(
        groupCols.map(g => coalesce(prevAgg(g), delta(s"__g_$g")).as(g)) ++
          Seq((coalesce(col("cnt"), lit(0L)) + coalesce(col("__dcnt"), lit(0L)))
            .as("cnt")) ++
          sumCols.map(c =>
            (coalesce(col(s"sum_$c"), lit(0)) +
              coalesce(col(s"__dsum_$c"), lit(0))).as(s"sum_$c")): _*)
      .where(col("cnt") > 0)
  }
}
