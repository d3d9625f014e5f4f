package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis column function unit semantics. */
class TextSpec extends SparkSpec {

  private def one[T](c: org.apache.spark.sql.Column, input: String): T = {
    val s = spark; import s.implicits._
    Seq(input).toDF("t").select(c.as("r")).head().getAs[T]("r")
  }

  test("tokens handles empty, blank, and multi-space input") {
    assert(one[Seq[String]](tokens(col("t")), "a  b\tc") === Seq("a", "b", "c"))
    assert(one[Int](tokenCount(col("t")), "") === 0)
    assert(one[Int](tokenCount(col("t")), "   ") === 0)
    assert(one[Int](tokenCount(col("t")), "one") === 1)
  }

  test("nfc composes decomposed forms; normalized input returns unchanged") {
    // decomposed e + U+0301 composes to the single codepoint U+00E9
    assert(one[String](nfc(col("t")), "cafe\u0301") === "caf\u00e9")
    assert(one[String](nfc(col("t")), "caf\u00e9") === "caf\u00e9")
    assert(one[String](nfc(col("t")), "plain ascii") === "plain ascii")
    // composition changes LENGTH, not just bytes — the dedup-split hazard
    val s = spark; import s.implicits._
    assert(Seq(("cafe\u0301", "caf\u00e9")).toDF("a", "b")
      .select((length(nfc(col("a"))) === length(nfc(col("b")))).as("eq"))
      .head().getBoolean(0))
  }

  test("cleanText: control/format strip, whitespace collapse, trim, idempotent") {
    assert(one[String](cleanText(col("t")),
      " hello  world \u200b!") === "hello world !")
    // tabs and newlines flatten (documented: this is the one-line form)
    assert(one[String](cleanText(col("t")), "a\tb\nc\r\nd") === "a b c d")
    // NFC runs before the strip, so decomposed accents survive composed
    assert(one[String](cleanText(col("t")), " e\u0301 ") === "\u00e9")
    // BOM / zero-width joiners (Cf) vanish into collapsed spaces
    assert(one[String](cleanText(col("t")), "\ufeffa\u200dz") === "a z")
    assert(one[String](cleanText(col("t")), "   ") === "")
    assert(one[String](cleanText(col("t")), "") === "")
    val once = one[String](cleanText(col("t")), " x  y\u200b")
    assert(one[String](cleanText(col("t")), once) === once, "idempotent")
  }

  test("shingles: k-grams of words, short docs collapse to one shingle") {
    assert(one[Seq[String]](shingles(col("t"), 2), "a b c") === Seq("a b", "b c"))
    assert(one[Seq[String]](shingles(col("t"), 5), "a b c") === Seq("a b c"))
  }

  test("charNgrams slide over lowercased text") {
    assert(one[Seq[String]](charNgrams(col("t"), 3), "AbCd") === Seq("abc", "bcd"))
    assert(one[Seq[String]](charNgrams(col("t"), 3), "ab") === Seq("ab"))
  }

  test("punct and stopword ratios") {
    assert(one[Double](punctRatio(col("t")), "ab.,") === 0.5)
    assert(one[Double](punctRatio(col("t")), "") === 0.0)
    assert(one[Double](stopwordRatio(col("t")), "the cat and a hat") === 0.6)
  }

  test("mean word length") {
    assert(one[Double](meanWordLength(col("t")), "ab abcd") === 3.0)
    assert(one[Double](meanWordLength(col("t")), "") === 0.0)
  }

  test("Gopher signals: symbol, bullet, ellipsis, alpha, stopword-hit rules") {
    assert(one[Double](symbolWordRatio(col("t")), "a #b c... d") === 0.5)
    assert(one[Double](symbolWordRatio(col("t")), "") === 0.0)
    // '....' counts ONE non-overlapping '...' occurrence
    assert(one[Double](symbolWordRatio(col("t")), "x....") === 1.0)
    assert(one[Double](bulletLineRatio(col("t")), "- a\nplain\n* b\n• c") === 0.75)
    assert(one[Double](bulletLineRatio(col("t")), "no bullets here") === 0.0)
    assert(one[Double](ellipsisLineRatio(col("t")), "done...\nplain\nmore…") === 2.0 / 3)
    assert(one[Double](alphaWordRatio(col("t")), "abc 123 4d 99") === 0.5)
    assert(one[Int](stopwordHits(col("t")), "the cat and the dog") === 2)
    assert(one[Int](stopwordHits(col("t")), "qwerty zxcvb") === 0)
    // the gate: plausible prose passes, short/noisy docs fail
    val prose = ("the quick brown fox jumps over that lazy dog and " +
      "then it runs back to the forest with great speed again ") * 3
    assert(one[Boolean](gopherPass(col("t")), prose))
    assert(!one[Boolean](gopherPass(col("t")), "too short to pass"))
    assert(!one[Boolean](gopherPass(col("t")), ("### " * 60) + "the of"))
  }

  test("quality score is in [0,1] and prose beats noise") {
    val prose = "the quick brown fox jumps over the lazy dog and then it runs " +
      "to the forest where it lives in a den by the old oak tree"
    val noise = "x!!! ??? ,,, ... ;;; ::: !!!!"
    val qp = one[Double](qualityScore(col("t")), prose)
    val qn = one[Double](qualityScore(col("t")), noise)
    assert(qp >= 0.0 && qp <= 1.0 && qn >= 0.0 && qn <= 1.0)
    assert(qp > qn)
    assert(qp === 1.0)
  }

  test("langId votes on marker tokens; und on no evidence") {
    assert(one[String](langId(col("t")), "der hund und die katze ist da") === "de")
    assert(one[String](langId(col("t")), "the cat and the dog is here") === "en")
    assert(one[String](langId(col("t")), "el perro y la casa que es") === "es")
    assert(one[String](langId(col("t")), "le chien et les chats est la") === "fr")
    assert(one[String](langId(col("t")), "qwerty zxcvb") === "und")
  }

  test("subword count estimate splits words and punctuation") {
    assert(one[Int](subwordCountEstimate(col("t")), "hello,world") === 3)
    assert(one[Int](subwordCountEstimate(col("t")), "abc def") === 2)
  }

  test("learned quality gate: logit matches the Scala fixed-point reference exactly") {
    val nb = 1024
    val w = derivedQualityWeights(nb)
    // the Scala reference: same polynomial bucket, same weights
    def bucket(tok: String): Int = {
      var h = 0L
      tok.foreach(c => h = (h * 131L + c.toLong) % 1000000007L)
      (h % nb).toInt
    }
    def ref(text: String, bias: Long = 0L): Long = {
      val ts = text.trim.toLowerCase
      val toks = if (ts.isEmpty) Array.empty[String] else ts.split("\\s+")
      val uni = toks.map(t => w(bucket(t))).sum
      val bi = toks.sliding(2).filter(_.length == 2)
        .map(p => w(bucket(p(0) + " " + p(1)))).sum
      bias + uni + (if (toks.length < 2) 0L else bi)
    }
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "single",
      "",
      "   ",
      "The QUICK the quick",      // case-insensitive folding
      "x!!! ??? ,,, ;;;")
    samples.foreach { s =>
      assert(one[Long](qualityLogit(col("t"), w), s) === ref(s),
        s"logit mismatch for '$s'")
    }
    // bias shifts the logit exactly; unigram-only mode drops the bigrams
    assert(one[Long](qualityLogit(col("t"), w, bias = 500L), samples.head) ===
      ref(samples.head, 500L))
    val uniOnly = one[Long](
      qualityLogit(col("t"), w, bigrams = false), samples.head)
    val toks = samples.head.split("\\s+")
    assert(uniOnly === toks.map(t => w(bucket(t))).sum)
    // deterministic weights are committed shape: bounded micro-units
    assert(w.forall(x => x >= -2000L && x <= 2000L))
    assert(derivedQualityWeights(nb).toSeq === w.toSeq)
  }

  test("scriptClass: exact range boundaries; codepoints is O(n) split-once") {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    // boundary chars: range ends of every class + an 'other' — the CJK
    // literals are U+4E00 and U+9FFF, the han range's exact endpoints
    // (verified by the expected classes below; a mangled byte would
    // classify 'other' and fail)
    val t = "Az09 一鿿!"
    val got = Seq(t).toDF("t")
      .select(transform(codepoints(col("t")), c => scriptClass(c)).as("c"))
      .head().getSeq[String](0)
    assert(got === Seq("latin", "latin", "digit", "digit", "space",
      "han", "han", "other"))
    // empty text classifies to an empty array, not a null walk
    assert(Seq("").toDF("t").select(codepoints(col("t")))
      .head().getSeq[Long](0).isEmpty)
  }

  test("htmlToText: scripts/styles/comments drop, entities decode, blocks segment") {
    // script with a '<' inside its body, style, comment all vanish whole
    assert(one[String](htmlToText(col("t")),
      "<html><head><style>p{x}</style><script>if (1 < 2) {}</script>" +
        "</head><body><h1>Hi</h1><!-- no --><p>a b</p></body></html>")
      === "Hi\na b")
    // inline tags become spaces (no word gluing); block tags newline
    assert(one[String](htmlToText(col("t")),
      "<div>one<b>two</b>three<br/>four</div>") === "one two three\nfour")
    // entity decode order: &amp;lt; is the literal TEXT "&lt;", and
    // decoded angle brackets are NOT re-parsed as tags
    assert(one[String](htmlToText(col("t")),
      "<p>&amp;lt; &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;x</p>")
      === "&lt; <b> \"q\" 's' x")
    // attribute-laden and case-mangled tags still match
    assert(one[String](htmlToText(col("t")),
      "<P CLASS=\"big\" data-x='1'>t</P><SCRIPT type=\"a\">z</SCRIPT>")
      === "t")
    // plain text passes through modulo whitespace normalization
    assert(one[String](htmlToText(col("t")), "just   plain\n\ntext")
      === "just plain\ntext")
    assert(one[String](htmlToText(col("t")), "") === "")
    // null propagates
    val s = spark; import s.implicits._
    assert(Seq(Option.empty[String]).toDF("t")
      .select(htmlToText(col("t"))).head().isNullAt(0))
    // block count
    assert(one[Long](htmlBlockCount(htmlToText(col("t"))),
      "<p>a</p><p>b</p>") === 2L)
    assert(one[Long](htmlBlockCount(htmlToText(col("t"))), "") === 0L)
  }

  test("canonicalUrl: every rule, one at a time") {
    val c = canonicalUrl(col("t"))
    // fragment strip + scheme/host lowercase (path case preserved)
    assert(one[String](c, "HTTPS://EN.Wikipedia.ORG/Doc/X#frag")
      === "https://en.wikipedia.org/Doc/X")
    // default ports drop only for their scheme
    assert(one[String](c, "https://a.com:443/p") === "https://a.com/p")
    assert(one[String](c, "http://a.com:80/p") === "http://a.com/p")
    assert(one[String](c, "http://a.com:8080/p") === "http://a.com:8080/p")
    assert(one[String](c, "ftp://a.com:443/p") === "ftp://a.com:443/p")
    // trailing slash strips; bare host gets exactly one
    assert(one[String](c, "https://a.com/p///") === "https://a.com/p")
    assert(one[String](c, "https://a.com") === "https://a.com/")
    assert(one[String](c, "https://a.com/") === "https://a.com/")
    // query params sort; duplicates are preserved; empty query drops '?'
    assert(one[String](c, "https://a.com/p?b=2&a=1&a=0")
      === "https://a.com/p?a=0&a=1&b=2")
    assert(one[String](c, "https://a.com/p?") === "https://a.com/p")
    // non-URLs pass through trimmed, untouched
    assert(one[String](c, "  not a url  ") === "not a url")
    // five spellings of one page all collapse
    val forms = Seq(
      "https://A.com/doc/7?b=2&a=1",
      "HTTPS://a.COM/doc/7?a=1&b=2#z",
      "https://a.com:443/doc/7?b=2&a=1",
      "https://a.com/doc/7/?a=1&b=2")
    forms.foreach { f =>
      assert(one[String](c, f) === "https://a.com/doc/7?a=1&b=2", f)
    }
  }

  test("sentencesOf: boundaries, no-punct, trailing marks, blanks") {
    val c = sentencesOf(col("t"))
    assert(one[Seq[String]](c,
      "One. Two sentences here! A third?  And a fourth without end")
      === Seq("One.", "Two sentences here!", "A third?",
        "And a fourth without end"))
    // no terminal punctuation = one sentence
    assert(one[Seq[String]](c, "No terminal punctuation at all")
      === Seq("No terminal punctuation at all"))
    // a mark at end-of-string closes the last sentence without a split
    assert(one[Seq[String]](c, "Trailing punct.") === Seq("Trailing punct."))
    // trailing whitespace after the final mark yields no empty sentence
    assert(one[Seq[String]](c, "Multi.  Space!   After? Punct. ")
      === Seq("Multi.", "Space!", "After?", "Punct."))
    // mid-word punctuation (no following whitespace) never splits
    assert(one[Seq[String]](c, "version 2.5 ships") === Seq("version 2.5 ships"))
    assert(one[Seq[String]](c, "") === Seq.empty)
    assert(one[Seq[String]](c, "   ") === Seq.empty)
  }
}
