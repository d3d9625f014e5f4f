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

  /** Apply a change feed (key, change_type, before, after — the
    * [[graft.streaming.CdcMergeSink.rowDiff]] shape) to a previous
    * aggregate. Group and sum columns are fields of the before/after
    * structs. Groups whose maintained count reaches zero drop out;
    * previously unseen groups appear. */
  def applyDelta(prevAgg: DataFrame, feed: DataFrame,
                 groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    def side(img: String, sign: Int) =
      feed.where(col(img).isNotNull).select(
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
