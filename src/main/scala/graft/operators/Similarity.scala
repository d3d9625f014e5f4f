package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score every corpus row, per-query top-k via window. Exact, one corpus
  * scan, no shuffle of the corpus itself; this is the right plan up to any
  * corpus size as long as the query set is broadcastable.
  *
  * Scale path: LSH-bucketed search — corpus pre-bucketed by a
  * random-hyperplane signature; a query probes only its own (multi-probe:
  * nearby) buckets, so per-query work drops from O(corpus) to
  * O(corpus / 2^bits). Recall is tunable via bits/probes; candidates are
  * re-scored exactly.
  */
object Similarity {

  /** Cosine column: HOF formulation by default; the fused native Catalyst
    * expression ([[graft.plans.CosineSimilarity]]) when `native` — callers
    * must have registered it on the session first. */
  private def cosineCol(a: org.apache.spark.sql.Column,
                        b: org.apache.spark.sql.Column, native: Boolean) =
    if (native) call_function(graft.plans.CosineSimilarity.name, a, b)
    else cosine(a, b)

  /** Exact brute-force top-k: for each query row, the k nearest corpus
    * rows by cosine. `queries` must be small (it is broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, k: Int, native: Boolean = false): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        cosineCol(col("vec"), col("query_vec"), native).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id"), col("cosine"), col("rank"))
  }

  /** One-probe LSH top-k: both sides keyed by hyperplane signature; a query
    * only scores corpus rows sharing its bucket. Approximate (recall < 1);
    * verify-and-rank is exact cosine. Use fewer bits for higher recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, dim: Int, nBits: Int = 8,
              native: Boolean = false): DataFrame = {
    def sig(v: org.apache.spark.sql.Column) =
      if (native) call_function(graft.plans.HyperplaneSignature.name,
        v, lit(nBits), lit(dim))
      else hyperplaneSignature(v, nBits, dim)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sig(col(vecCol)).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      sig(col(vecCol)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        cosineCol(col("vec"), col("query_vec"), native).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id"), col("cosine"), col("rank"))
  }

  /** IVF-style search: corpus assigned to the nearest of `nCentroids`
    * deterministic centroids (sampled corpus rows); a query probes the
    * `nProbe` nearest centroid cells. The coarse quantizer is built once
    * (tiny, broadcast); per-query work is O(corpus * nProbe / nCentroids).
    */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    // deterministic centroid sample: the nCentroids rows with lowest
    // xxhash64(id) — stable across runs, no RNG
    val cent = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        xxhash64(col(idCol)).as("h"))
      .orderBy(col("h")).limit(nCentroids)
      .select(col("cid"), col("cvec"))
    val centB = broadcast(cent)

    // assign corpus rows to their single nearest centroid
    val assigned = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .crossJoin(centB)
      .withColumn("d", l2Distance(col("vec"), col("cvec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("d"), col("cid"))))
      .where(col("rnk") === 1)
      .select(col("cid"), col("id"), col("vec"))

    // queries probe their nProbe nearest cells
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .crossJoin(centB)
      .withColumn("d", l2Distance(col("query_vec"), col("cvec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d"), col("cid"))))
      .where(col("rnk") <= nProbe)
      .select(col("cid"), col("query_id"), col("query_vec"))

    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        cosine(col("vec"), col("query_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id"), col("cosine"), col("rank"))
  }
}
