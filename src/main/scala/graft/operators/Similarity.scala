package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Udx, VectorFunctions}
import graft.functions.VectorFunctions._

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score every corpus row, per-query top-k via a map-side bounded heap.
  * Exact, one corpus scan, no shuffle of the corpus itself; this is the
  * right plan up to any corpus size as long as the query set is
  * broadcastable.
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
  private def cosineCol(a: Column, b: Column, native: Boolean) =
    if (native) call_function(graft.plans.CosineSimilarity.name, a, b)
    else cosine(a, b)

  /** Final ranking stage shared by every search variant: per-query top-k
    * of the scored candidates via the bounded-heap Aggregator
    * ([[Udx.TopKAggregator]]) instead of a `row_number` window.
    *
    * Why not a window: `Window.partitionBy(query_id)` shuffles EVERY scored
    * candidate into at most |queries| tasks — with 5 queries over a 100×
    * corpus that is 5 straggler tasks each holding a corpus-sized
    * partition. The aggregator's partial (map-side) phase discards
    * non-contenders before the exchange, so the shuffle carries ≤ k rows
    * per (map task, query) and the final task per query reduces
    * ≤ k·numPartitions pre-sorted candidates — bounded regardless of
    * corpus size. Ordering (score desc, id asc) matches the window
    * formulation exactly, so results are identical. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val top = Udx.topK(k)
    scored
      // null scores (null/malformed embeddings) can never rank; the
      // aggregator's Scored.score field is non-nullable, so they must be
      // dropped here, matching the window formulation's nulls-last-beyond-k
      // behavior. NaN scores rank LAST here (java Double order) — the old
      // window's desc order put NaN first, which was never the wanted
      // answer for a similarity search.
      .where(col("cosine").isNotNull)
      .groupBy(col("query_id"))
      .agg(top(col("cosine"), col("id")).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), col("col.id").as("id"),
        col("col.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
  }

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
    topKPerQuery(scored, k)
  }

  /** LSH top-k: both sides keyed by hyperplane signature; a query only
    * scores corpus rows sharing its bucket. Approximate (recall < 1);
    * verify-and-rank is exact cosine. Two recall knobs, composable:
    *
    *  - `multiProbe`: each query additionally probes the buckets at
    *    Hamming distance 1 (its `multiProbe` lowest signature bits
    *    flipped) — the standard multi-probe trade: recall of fewer bits
    *    at the bucket-balance of more bits. Probing explodes only the
    *    tiny broadcast query side.
    *  - `tables`: OR-amplification across independently-seeded
    *    signature sets; per-neighbor miss probability decays as
    *    (1-p^nBits)^tables while corpus candidate volume grows linearly.
    *
    * With tables > 1 (or probing) a corpus row can reach a query more
    * than once, so scored candidates are de-duplicated before ranking
    * (the duplicate rows carry bit-identical cosines — same inputs). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, dim: Int, nBits: Int = 8,
              native: Boolean = false, multiProbe: Int = 0,
              tables: Int = 1): DataFrame = {
    def sig(v: Column, t: Int) =
      if (native) call_function(graft.plans.HyperplaneSignature.name,
        v, lit(nBits), lit(dim), lit(42L + t))
      else hyperplaneSignature(v, nBits, dim, 42L + t)
    def banded(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        posexplode(array((0 until tables).map(t => sig(col(vecCol), t)): _*)))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val c = banded(corpus, "id", "vec")
    val q0 = banded(queries, "query_id", "query_vec")
    val q = if (multiProbe <= 0) q0 else {
      val flips = lit(0L) +: (0 until math.min(multiProbe, nBits)).map(i => lit(1L << i))
      q0.withColumn("__flip", explode(array(flips: _*)))
        .withColumn("bucket", col("bucket").bitwiseXOR(col("__flip")))
        .drop("__flip")
    }
    val scored = c.join(broadcast(q), Seq("table", "bucket"))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        cosineCol(col("vec"), col("query_vec"), native).as("cosine"))
    // single-table probing needs no dedup (xor is injective: a corpus row
    // reaches a query through at most one probe); across tables it does
    val deduped = if (tables > 1) scored.distinct() else scored
    topKPerQuery(deduped, k)
  }

  /** Map-side nearest-centroid assignment: a single codegen'd fold over the
    * centroid literal array per row — the per-row argmin the IVF quantizer
    * needs, with ZERO shuffle (the old formulation cross-joined the corpus
    * with the centroids and ranked corpus×nCentroids rows through a
    * per-id window — a shuffle of the whole corpus just to compute a
    * broadcast-array argmin).
    *
    * Centroids are iterated in ascending cid order with a strict `<`, so
    * equal-distance ties resolve to the smallest cid — identical to the
    * old `orderBy(distance, cid)` rank-1 rule. Distances are compared
    * squared (sqrt is monotone, ordering unchanged). */
  private def nearestCentroidCol(vec: Column, cents: Seq[(Long, Seq[Float])]): Column = {
    val arr = typedLit(cents)
    val init = struct(lit(Double.MaxValue).as("d"), lit(Long.MaxValue).as("cid"))
    aggregate(arr, init, (acc, c) => {
      val d2 = aggregate(
        zip_with(c.getField("_2"), vec, (x, y) => {
          val diff = x.cast("double") - y.cast("double")
          diff * diff
        }),
        lit(0.0), (a, v) => a + v)
      when(d2 < acc.getField("d"),
        struct(d2.as("d"), c.getField("_1").as("cid"))).otherwise(acc)
    }).getField("cid")
  }

  /** TWO nearest centroids per row (soft assignment), same map-side fold
    * discipline as [[nearestCentroidCol]]: one codegen'd pass over the
    * broadcast codebook, zero shuffle. The squared distance is bound to a
    * lambda variable via the single-element-transform trick — an
    * interpreted HOF lambda has no common-subexpression reuse, so a bare
    * reference would recompute the k·dim fold once per comparison.
    * Ties resolve to the smaller cid on both slots (strict `<`). */
  private[operators] def nearest2CentroidsCol(
      vec: Column, cents: Seq[(Long, Seq[Float])]): Column = {
    val arr = typedLit(cents)
    val init = struct(
      lit(Double.MaxValue).as("d1"), lit(Long.MaxValue).as("c1"),
      lit(Double.MaxValue).as("d2"), lit(Long.MaxValue).as("c2"))
    val best = aggregate(arr, init, (acc, c) => {
      val d2v = aggregate(
        zip_with(c.getField("_2"), vec, (x, y) => {
          val diff = x.cast("double") - y.cast("double")
          diff * diff
        }),
        lit(0.0), (a, v) => a + v)
      element_at(transform(array(d2v), d =>
        when(d < acc.getField("d1"),
          struct(d.as("d1"), c.getField("_1").as("c1"),
            acc.getField("d1").as("d2"), acc.getField("c1").as("c2")))
        .when(d < acc.getField("d2"),
          struct(acc.getField("d1").as("d1"), acc.getField("c1").as("c1"),
            d.as("d2"), c.getField("_1").as("c2")))
        .otherwise(acc)), 1)
    })
    array(best.getField("c1"), best.getField("c2"))
  }

  /** Deterministic k-means (Lloyd) refinement of an IVF codebook. Each
    * iteration is ONE corpus scan: map-side nearest-centroid assignment
    * (no shuffle) + per-(cell, dimension) mean — a partially-aggregated
    * shuffle whose reduce side is k·dim rows, collected to the driver
    * (16×64 doubles — codebook-sized). Seeded from the hash-lowest corpus
    * rows, so the whole build is RNG-free and rerun-stable. Empty cells
    * keep their previous centroid. */
  def kmeansCodebook(corpus: DataFrame, vecCol: String, idCol: String,
                     k: Int, iters: Int): Seq[(Long, Seq[Float])] = {
    var cents: Seq[(Long, Seq[Float])] = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        xxhash64(col(idCol)).as("h"))
      .orderBy(col("h")).limit(k)
      .select(col("cid"), col("cvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1).toSeq
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    var it = 0
    while (it < iters) {
      val means = corpus.select(col(vecCol).as("vec"))
        .withColumn("cid", nearestCentroidCol(col("vec"), cents))
        .select(col("cid"), posexplode(col("vec")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq
        }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      it += 1
    }
    cents
  }

  /** IVF-style search: corpus assigned to the nearest of `nCentroids`
    * centroids; a query probes the `nProbe` nearest centroid cells. The
    * coarse quantizer is built once (tiny — nCentroids rows collected to
    * the driver, metadata-sized) and shipped to every task as a literal
    * array; per-query work is O(corpus * nProbe / nCentroids).
    * `kmeansIters` Lloyd iterations (one corpus scan each) balance the
    * cells — hash-sampled seeds alone skew cell sizes and recall.
    */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              kmeansIters: Int = 0): DataFrame = {
    val cents = kmeansCodebook(corpus, vecCol, idCol, nCentroids, kmeansIters)

    // map-side assignment: scan → project, no exchange
    val assigned = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cid", nearestCentroidCol(col("vec"), cents))

    // queries probe their nProbe nearest cells (query set is tiny; the
    // explode over the ranked centroid list is broadcast-sized work)
    val centDf = spark.createDataFrame(cents.map(c => (c._1, c._2))).toDF("cid", "cvec")
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .crossJoin(broadcast(centDf))
      .withColumn("d", l2Distance(col("query_vec"), col("cvec")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("d"), col("cid"))))
      .where(col("rnk") <= nProbe)
      .select(col("cid"), col("query_id"), col("query_vec"))

    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        cosine(col("vec"), col("query_vec")).as("cosine"))
    topKPerQuery(scored, k)
  }
}
