package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for key-partitioned operators.
  *
  * Shuffle-by-key operators (windows, grouped top-k, as-of sweeps) send an
  * entire key's rows to one task; a hot key (one domain = half the corpus)
  * turns a 1000-executor job into a 1-task straggler. Joins get runtime
  * skew-splitting from AQE (`spark.sql.adaptive.skewJoin`), but *window*
  * shuffles do not — the fix is salting: spread each key over `buckets`
  * sub-partitions, do the bounded work per sub-partition, then reduce the
  * per-bucket partials per key. Correct whenever the per-key operation is
  * reassociatable from partials — top-k is (top-k of per-bucket top-ks).
  */
object Skew {

  /** Grouped top-k that survives hot keys: stage 1 takes the per-(key,
    * salt-bucket) top-k (Spark's WindowGroupLimit keeps only k rows per
    * group ahead of each shuffle), stage 2 reduces the ≤ k·buckets
    * candidates per key. Rows per final task are bounded by k·buckets no
    * matter how hot the key. Output: input rows + `rank` (1..k per key).
    *
    * Deterministic for a total `order`; ties broken by the order columns
    * only, so pass a tiebreaker column if the prefix can tie. */
  def saltedTopKPerKey(df: DataFrame, key: Seq[Column], order: Seq[Column],
                       k: Int, buckets: Int = 32): DataFrame = {
    require(k > 0 && buckets > 0)
    // deterministic salt: hash of the full row (order columns are SortOrder
    // expressions, which cannot be evaluated), not rand() — reruns and
    // retried tasks must bucket a row identically
    val salt = pmod(xxhash64(df.columns.toSeq.map(col): _*), lit(buckets))
    val w1 = Window.partitionBy((key :+ salt): _*).orderBy(order: _*)
    val w2 = Window.partitionBy(key: _*).orderBy(order: _*)
    df.withColumn("__rn1", row_number().over(w1))
      .where(col("__rn1") <= k)
      .withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .drop("__rn1")
  }

  /** Distribution window functions (percent_rank / cume_dist / ntile /
    * partition-first value) WITHOUT a per-key global sort: a plain
    * `Window.partitionBy(lowCardinalityKey)` gives one task per key
    * regardless of cluster size — at 100× one task sorts the whole key.
    * This is the two-pass form:
    *
    *  1. bucket rows by an order-monotone split of the leading order
    *     column (`width_bucket` on numerics, sampled boundaries
    *     otherwise) — parallelism = keys × buckets, not keys;
    *  2. count rows per (key, bucket) — a tiny aggregate — and broadcast
    *     exclusive prefix offsets + per-key totals back;
    *  3. rank WITHIN each (key, bucket) and add the offset: global
    *     row number = offset + local row number.
    *
    * percent_rank, cume_dist, and ntile are then closed-form in
    * (global rn, n) using Spark's own formulas, so results are
    * BIT-IDENTICAL to the plain window — property-asserted in SkewSpec.
    *
    * REQUIRES the order tuple to be unique per key (a total order, e.g.
    * any order list ending in a key/rowid column; ascending only). With
    * ties, rank-family semantics would need cross-bucket tie merging —
    * out of scope, matching [[graft.operators.CorpusPrep.exclusivePrefixSum]]'s
    * contract.
    *
    * Output: input + `percent_rank`, `cume_dist`, `ntile` (of
    * `ntiles`), and — when `firstValueOf` is set — `first_value` (that
    * column's value on the partition's order-first row). */
  def distributedDistribution(df: DataFrame, key: String, order: Seq[String],
                              ntiles: Int = 4, nBuckets: Int = 64,
                              firstValueOf: Option[String] = None): DataFrame = {
    require(order.nonEmpty && ntiles > 0 && nBuckets > 0)
    val lead = order.head
    val numeric = df.schema(lead).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val bucket =
      if (numeric) {
        val Array(lo, hi) = df.agg(min(col(lead)).cast("double"),
          max(col(lead)).cast("double")).head()
          .toSeq.map(_.asInstanceOf[Double]).toArray
        if (lo == hi) lit(1)
        else least(width_bucket(col(lead).cast("double"), lit(lo), lit(hi),
          lit(nBuckets)), lit(nBuckets)).cast("int")
      } else {
        // sampled order-monotone boundaries, compared in the column's own
        // ordering (same technique as exclusivePrefixSum's string lane)
        val sample = df.select(col(lead)).orderBy(col(lead))
          .sample(withReplacement = false, 0.01, seed = 42)
          .limit(nBuckets * 16).collect().map(_.get(0))
        val cuts = if (sample.isEmpty) Array.empty[Any]
          else (1 until nBuckets)
            .map(i => sample(math.min(sample.length - 1,
              i * sample.length / nBuckets))).distinct.toArray
        if (cuts.isEmpty) lit(1)
        else cuts.zipWithIndex.foldLeft(lit(1)) { case (acc, (c, i)) =>
          when(col(lead) >= lit(c), lit(i + 2)).otherwise(acc)
        }
      }
    // one materialization: consumed by the tiny counts aggregate AND the
    // final bucketed window (keeps sampled lineage consistent)
    val bucketed = df.withColumn("__bucket", bucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = bucketed.groupBy(col(key).as("__k"), col("__bucket").as("__b"))
      .agg(count(lit(1)).as("__c"))
    // per-(key, bucket) exclusive offsets + per-key totals: rows = keys ×
    // buckets — driver-tiny at any data scale
    val w = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(w), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("__k"))))
      .select(col("__k"), col("__b"), col("__off"), col("__n"))
    val localW = Window.partitionBy(col(key), col("__bucket"))
      .orderBy(order.map(col): _*)
    val ranked = bucketed
      .withColumn("__lrn", row_number().over(localW))
      .join(broadcast(offsets),
        col(key) === col("__k") && col("__bucket") === col("__b"))
      .withColumn("__grn", col("__off") + col("__lrn"))
    // Spark's own closed forms (PercentRank/CumeDist/NTile expressions):
    // unique order ⇒ rank == row number, so these are bit-identical
    val n = col("__n")
    val grn = col("__grn")
    val bs = floor(n / ntiles).cast("long") // base tile size
    val rem = n % ntiles                    // first `rem` tiles get +1
    val tile = when(grn <= rem * (bs + 1),
        floor((grn - 1) / (bs + 1)).cast("long") + 1)
      .otherwise(rem + floor((grn - rem * (bs + 1) - 1) / bs).cast("long") + 1)
    val withDist = ranked
      .withColumn("percent_rank",
        when(n === 1, 0.0).otherwise((grn - 1).cast("double") / (n - 1)))
      .withColumn("cume_dist", grn.cast("double") / n)
      .withColumn("ntile", tile.cast("int"))
    val withFirst = firstValueOf match {
      case None => withDist
      case Some(v) =>
        // the order-first row's value per key: an aggregate (min_by over
        // the order tuple), broadcast back — no global window
        val firsts = bucketed.groupBy(col(key).as("__fk"))
          .agg(min_by(col(v), struct(order.map(col): _*)).as("first_value"))
        withDist.join(broadcast(firsts), col(key) === col("__fk"))
          .drop("__fk")
    }
    withFirst.drop("__bucket", "__k", "__b", "__off", "__n", "__lrn", "__grn")
  }
}
