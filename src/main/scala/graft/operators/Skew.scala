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
}
