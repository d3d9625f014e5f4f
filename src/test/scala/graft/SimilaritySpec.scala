package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN operators against the exact brute-force baseline. */
class SimilaritySpec extends SparkSpec {

  private lazy val embs = Tables.embeddings(spark, sf())
  private lazy val queries = embs.where(col("vec_id") < 10)

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }

  test("brute force: self-similarity is excluded, ranks ordered by cosine desc") {
    val got = Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", 10)
    val rows = got.collect()
    assert(rows.length === 100) // 10 queries × 10
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(!rs.exists(_.getLong(1) == q))
      val cosines = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("brute force finds an exact duplicate vector at rank 1") {
    val s = spark; import s.implicits._
    val v = (0 until 8).map(i => (i * 0.3).toFloat).toArray
    val other = (0 until 8).map(i => math.cos(i * 2.1).toFloat).toArray
    val df = Seq((1L, v), (2L, v), (3L, other)).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, df.where(col("vec_id") === 1), "embedding", "vec_id", 1)
      .collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 2L)
    assert(math.abs(got(0).getDouble(2) - 1.0) < 1e-12)
  }

  test("LSH top-k recall vs brute force is useful and results are a subset by bucket") {
    val exact = topkMap(Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", 10))
    val approx = topkMap(Similarity.lshTopK(embs, queries, "embedding", "vec_id", 10, dim = 64, nBits = 3))
    val recalls = exact.keys.toSeq.map { q =>
      val a = approx.getOrElse(q, Nil).toSet
      (exact(q).toSet & a).size.toDouble / 10
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.15, s"mean recall@10 = $mean") // 16 buckets over 500 vecs
  }

  test("IVF top-k recall with 4/16 probes beats single-bucket LSH coverage") {
    val exact = topkMap(Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", 10))
    val approx = topkMap(Similarity.ivfTopK(spark, embs, queries, "embedding", "vec_id", 10,
      nCentroids = 16, nProbe = 4))
    val recalls = exact.keys.toSeq.map { q =>
      val a = approx.getOrElse(q, Nil).toSet
      (exact(q).toSet & a).size.toDouble / 10
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.25, s"mean recall@10 = $mean") // probes 1/4 of the corpus
  }
}
