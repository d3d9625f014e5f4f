package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeTable, TextFunctions}
import graft.operators.CorpusPrep

/** The exact BPE tokenizer: trainer provenance, encoder semantics,
  * expression parity, and the tokenizer switch in the budgeted
  * operators. */
class BpeSpec extends SparkSpec {

  test("committed merges file is exactly train(seedText) — provenance pin") {
    val trained = Bpe.train(Seq(Bpe.seedText), Bpe.defaultMerges)
    val committed = {
      val in = getClass.getResourceAsStream(Bpe.ResourcePath)
      assert(in != null, "missing committed merges resource")
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().toIndexedSeq finally src.close()
    }
    val expected = trained.zipWithIndex.map { case ((l, r), i) =>
      s"${i + 1}\t$l\t$r"
    }
    assert(committed === expected,
      "resource drifted from the trainer — rerun graft.functions.BpeTrainMain")
    assert(trained.nonEmpty)
  }

  test("encoder: min-rank-first leftmost merges, hand table") {
    // same table as the DuckDB oracle prototype: ranks decide, not
    // string order
    val t = new BpeTable(IndexedSeq(
      ("e", "r"), ("l", "l"), ("h", "e"), ("he", "ll"), ("hell", "o")))
    assert(t.encode("hello").toSeq === Seq("hello"))
    // (e,r) fires first (rank 1), blocking (h,e); then (l,l)
    assert(t.encode("teller").toSeq === Seq("t", "e", "ll", "er"))
    assert(t.encode("x").toSeq === Seq("x"))          // unknown: one piece
    assert(t.encode("").toSeq === Seq.empty)
    assert(t.tokenCount("hello teller   x") === 1L + 4L + 1L)
    assert(t.tokenize("hello x").toSeq === Seq("hello", "x"))
  }

  test("encoder: unknown chars and digits fall back to single codepoints") {
    val t = Bpe.default
    // digits were in the seed as whole numbers; an unseen mix still
    // tokenizes, and every piece concatenation re-spells the word
    for (w <- Seq("z9#q", "Xylophone7", "::::", "déjà")) {
      val pieces = t.encode(w)
      assert(pieces.mkString === w, s"pieces of $w must re-spell it")
      assert(pieces.nonEmpty)
    }
  }

  test("encoder: trained table compresses seed vocabulary") {
    val t = Bpe.default
    // seed words that recur compress below their char count
    assert(t.wordCost("table") < 5L)
    assert(t.wordCost("the") === 1L)
    // cache hit path returns the same value
    assert(t.wordCost("table") === t.wordCost("table"))
  }

  test("expressions: column kernels match the Scala loop on real docs") {
    graft.plans.BpeExpressions.register(spark)
    val docs = Tables.documents(spark, sf())
    val got = docs
      .select(col("doc_id"), col("text"),
        call_function("graft_bpe_count", col("text")).as("n"),
        call_function("graft_bpe_tokens", col("text")).as("pieces"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val text = r.getString(1)
      assert(r.getLong(2) === Bpe.default.tokenCount(text))
      assert(r.getSeq[String](3).length === r.getLong(2),
        "piece count must equal the token count")
      // reconstruction: pieces concatenated == whitespace-stripped text
      assert(r.getSeq[String](3).mkString === text.split("\\s+")
        .filter(_.nonEmpty).mkString)
    }
  }

  test("expressions: null propagates; word cost matches encode length") {
    graft.plans.BpeExpressions.register(spark)
    val s = spark; import s.implicits._
    val df = Seq(Some("running"), Some(""), None).toDF("w")
    val got = df.select(
      call_function("graft_bpe_word_cost", col("w")).as("c"),
      call_function("graft_bpe_count", col("w")).as("n")).collect()
    assert(got(0).getLong(0) === Bpe.default.encode("running").length.toLong)
    assert(got(1).getLong(0) === 0L)
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
  }

  test("chunkTokens tokenizer=bpe: budget respected, coverage exact") {
    graft.plans.BpeExpressions.register(spark)
    val docs = Tables.documents(spark, sf())
    val out = CorpusPrep.chunkTokens(docs, "text", "doc_id",
      maxTokens = 16, tokenizer = "bpe")
    val rows = out.select("doc_id", "chunk_idx", "n_chunk_tokens",
      "chunk_text").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(2)
      val words = r.getString(3).split(" ").filter(_.nonEmpty)
      // recomputing the chunk's cost with the Scala kernel agrees
      assert(n === words.map(Bpe.default.wordCost).sum)
      // budget holds unless the chunk is a single over-budget word
      assert(n <= 16 || words.length == 1)
    }
    // reconstruction: chunks cover the space-joined tokens exactly
    val recon = rows.groupBy(_.getLong(0)).map { case (id, rs) =>
      id -> rs.sortBy(_.getInt(1)).map(_.getString(3)).mkString(" ")
    }
    docs.select("doc_id", "text").collect().foreach { r =>
      val want = r.getString(1).split("\\s+").filter(_.nonEmpty).mkString(" ")
      if (want.nonEmpty) assert(recon(r.getLong(0)) === want)
    }
  }

  test("packTokens tokenizer=bpe: offsets are the exact running BPE sum") {
    graft.plans.BpeExpressions.register(spark)
    val docs = Tables.documents(spark, sf()).limit(50)
    val out = CorpusPrep.packTokens(docs, "doc_id", "text", budget = 128,
        tokenizer = "bpe")
      .select("doc_id", "est_tokens", "start_offset")
      .collect().sortBy(_.getLong(0))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    var off = 0L
    texts.zip(out).foreach { case ((id, text), r) =>
      assert(r.getLong(0) === id)
      val n = Bpe.default.tokenCount(text)
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === off)
      off += n
    }
  }

  test("trainOnCorpus: distributed word counts reproduce the local trainer exactly") {
    val s = spark; import s.implicits._
    val texts = Seq(
      "the cat sat on the mat and the cat ran",
      "the dog sat on the log and the dog ran after the cat",
      "a cat and a dog and a rat sat flat",
      "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(5) // counts must merge across partitions
    val dist = Bpe.trainOnCorpus(docs, "text", nMerges = 12)
    val local = Bpe.train(texts, nMerges = 12)
    assert(dist === local,
      "corpus-trained merges must equal the sequential reference trainer")
    assert(dist.nonEmpty && dist.size <= 12)
    // the trained table round-trips through the encoder
    val table = new BpeTable(dist)
    assert(table.tokenCount("the cat sat") > 0)
    // vocabulary cap refuses rather than silently truncating
    val e = intercept[IllegalArgumentException] {
      Bpe.trainOnCorpus(docs, "text", nMerges = 4, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"))
  }
}
