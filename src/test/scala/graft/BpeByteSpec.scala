package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeByte, BpeByteTrainMain, TextFunctions}

/** Byte-level BPE: byte\u2194unicode bijection, regex pretokenizer,
  * lossless round-trip, trainer provenance, expression parity, and the
  * tokenizer switch. */
class BpeByteSpec extends SparkSpec {
  import spark.implicits._

  test("byte map is a bijection onto printable non-space symbols") {
    val chars = BpeByte.byteToChar
    assert(chars.distinct.length === 256)
    chars.foreach { c =>
      assert(!Character.isWhitespace(c) && !Character.isISOControl(c),
        f"symbol U+${c.toInt}%04X must be printable non-space")
    }
    // canonical GPT-2 anchors: space -> G-breve family (U+0120),
    // newline -> U+010A, 'a' -> itself
    assert(BpeByte.byteToChar(' '.toInt) === '\u0120')
    assert(BpeByte.byteToChar('\n'.toInt) === '\u010a')
    assert(BpeByte.byteToChar('a'.toInt) === 'a')
    for (b <- 0 until 256)
      assert(BpeByte.fromByteSpace(BpeByte.toByteSpace(
        new String(Array(b.toByte), "ISO-8859-1"))) ===
        new String(Array(b.toByte), "ISO-8859-1"))
  }

  test("pretokenizer: contractions, punctuation, digits, whitespace runs") {
    assert(BpeByte.pretokens("don't scan?") ===
      Vector("don", "'t", " scan", "?"))
    assert(BpeByte.pretokens("It's $19.99!") ===
      Vector("It", "'s", " $", "19", ".", "99", "!"))
    // a multi-space run is one whitespace pretoken (the RE2-safe
    // simplification: no lookahead, the run keeps all its spaces)
    assert(BpeByte.pretokens("a  b") === Vector("a", "  ", "b"))
    assert(BpeByte.pretokens("line1\nline2") ===
      Vector("line", "1", "\n", "line", "2"))
    assert(BpeByte.pretokens("") === Vector.empty)
    // pretokens concatenate back to the input (the regex covers every
    // character class)
    for (t <- Seq("caf\u00e9 \u2014 100\u20ac", "tabs\tand\nnewlines",
        "we're won't 3.14", "\ud83d\ude00 emoji!"))
      assert(BpeByte.pretokens(t).mkString === t)
  }

  test("committed byte merges file is exactly the trainer's output \u2014 provenance pin") {
    val trained = BpeByte.train(
      Seq(Bpe.seedText, BpeByteTrainMain.byteSeedExtra), nMerges = 32768)
    val committed = {
      val in = getClass.getResourceAsStream(BpeByte.ResourcePath)
      assert(in != null, "missing committed byte merges resource")
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().toIndexedSeq finally src.close()
    }
    val expected = trained.zipWithIndex.map { case ((l, r), i) =>
      s"${i + 1}\t$l\t$r"
    }
    assert(committed === expected,
      "resource drifted \u2014 rerun graft.functions.BpeByteTrainMain")
    assert(trained.nonEmpty)
  }

  test("round-trip: pieces concatenate to the original, any input") {
    val t = BpeByte.default
    for (s <- Seq("the quick brown fox", "don't scan? z#9",
        "caf\u00e9 r\u00e9sum\u00e9 \u20ac100 25\u00b0C",
        "multi  space\tand\nnewline", "\ud83d\ude00\ud83d\ude00",
        "", "   ", "a")) {
      assert(BpeByte.fromByteSpace(BpeByte.tokenize(t, s).mkString) === s,
        s"round-trip failed for <$s>")
      assert(BpeByte.tokenCount(t, s) === BpeByte.tokenize(t, s).length.toLong)
    }
  }

  test("byte-level counts include whitespace; seed vocabulary compresses") {
    val t = BpeByte.default
    // ' the' (with its leading space) recurs in the seed thousands of
    // times \u2014 it must compress to one token
    assert(t.wordCost(BpeByte.toByteSpace(" the")) === 1L)
    // whitespace runs cost tokens (unlike the estimate/char-bpe rule)
    assert(BpeByte.tokenCount(t, "a  b") >= 3L)
    // unseen bytes fall back structurally (emoji = 4 UTF-8 bytes)
    assert(BpeByte.tokenCount(t, "\ud83d\ude00") >= 1L)
  }

  test("expressions: kernel parity and the tokenizer switch") {
    graft.plans.BpeByteExpressions.register(spark)
    val docs = Seq("the table holds rows", "don't scan? $19.99",
      "caf\u00e9 \u2014 100\u20ac", "", "   ").toDF("text")
    val got = docs.select(
      call_function("graft_bpe_byte_count", col("text")).as("n"),
      call_function("graft_bpe_byte_tokens", col("text")).as("p"),
      TextFunctions.tokenCountOf(col("text"), "bpe-byte").as("n2"),
      col("text")).collect()
    got.foreach { r =>
      val t = r.getString(3)
      assert(r.getLong(0) === BpeByte.tokenCount(BpeByte.default, t))
      assert(r.getLong(0) === r.getLong(2))
      assert(BpeByte.fromByteSpace(r.getSeq[String](1).mkString) === t,
        "expression round-trip")
    }
    // per-word dispatch
    val w = docs.select(TextFunctions.wordCost(lit("don't"), "bpe-byte"))
      .head().getLong(0)
    assert(w === BpeByte.wordCost(BpeByte.default, "don't"))
    intercept[IllegalArgumentException](
      TextFunctions.tokenCountOf(col("text"), "nope"))
  }

  test("distributed trainer == in-memory trainer on the same corpus") {
    val corpus = Seq("the cat sat on the mat, the cat sat.",
      "don't count on it; don't count twice. 12 12 12",
      "caf\u00e9 caf\u00e9 \u20ac9 \u20ac9")
    val a = BpeByte.train(corpus, nMerges = 64)
    val b = BpeByte.trainOnCorpusBytes(corpus.toDF("text"), "text",
      nMerges = 64)
    assert(a === b)
    assert(a.nonEmpty)
    // the maxVocab guard refuses, never truncates
    intercept[IllegalArgumentException](
      BpeByte.trainOnCorpusBytes(corpus.toDF("text"), "text", 8,
        maxVocab = 2))
  }

  test("spark regexp_extract_all pretokens == kernel pretokens") {
    // the q210 oracle replays pretokenization via regexp_extract_all in
    // DuckDB; Spark's (Java-regex) form must agree with the kernel too
    val docs = Seq("It's 3.14, isn't it?", "a  b\tc", "").toDF("text")
    val rows = docs.select(col("text"),
      regexp_extract_all(col("text"), lit(BpeByte.PretokenRegex), lit(0))
        .as("p")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === BpeByte.pretokens(r.getString(0)))
    }
  }
}
