package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no Scala UDFs in the hot path) so the whole pipeline stays inside
  * whole-stage codegen and scales linearly with input bytes — the property
  * that matters at 100 TB. Shapes follow standard corpus-prep practice
  * (C4/Gopher-style quality signals, MinHash shingling).
  */
object TextFunctions {

  /** Whitespace tokenization; empty string → empty array. */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: word-pieces + digits + punctuation as
    * separate tokens (a cheap regex proxy for a real tokenizer's count). */
  def subwordCountEstimate(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      x => trim(x) =!= ""))

  /** Word k-shingles as space-joined strings (MinHash input).
    * Documents shorter than k words yield a single shingle of the whole
    * text so they can still participate in dedup. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n <= k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), n - lit(k) + lit(1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** Character n-grams of the lowercased text. */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(text)
    val len = length(t)
    when(len <= n, array(t))
      .otherwise(transform(sequence(lit(1), len - lit(n) + lit(1)),
        i => t.substr(i, lit(n))))
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\.,;:!\\?'\"\\(\\)\\-]", ""))

  /** Ratio helpers used by [[qualityScore]]. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(punctCount(text).cast("double") / length(text))

  /** English stopword hit ratio over tokens. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "from", "that", "this", "it", "be")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks))
  }

  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: C4/Gopher-style heuristics —
    * reasonable length, some stopwords (signals prose), sane word length,
    * not punctuation-soup. Deterministic and SQL-expressible.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenOk = when(nTok >= 10 && nTok <= 100000, lit(1.0)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text) >= 0.05, lit(1.0)).otherwise(lit(0.0))
    val mwl = meanWordLength(text)
    val wordOk = when(mwl >= 2.0 && mwl <= 12.0, lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) <= 0.2, lit(1.0)).otherwise(lit(0.0))
    round((lenOk + stopOk + wordOk + punctOk) / 4.0, 6)
  }

  /** Language-ID by marker-token voting: score each candidate language by
    * its marker-word hit count; highest count wins, ties broken by language
    * code order; no hits → "und". N-gram-profile LID reduced to its
    * discriminative head — deterministic, SQL-expressible, codegen-friendly.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(text: Column, lang: String): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isin(langMarkers(lang): _*)))
  }

  def langId(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val scored = langs.map(l => struct(langScore(text, l).as("score"), lit(l).as("lang")))
    // argmax by (score, then reverse-alphabetical) => array_max of
    // (score, negated-rank) struct; ties at equal score go to the
    // alphabetically-first language.
    val best = array_max(array(langs.zipWithIndex.map { case (l, i) =>
      struct(langScore(text, l).as("score"), lit(langs.size - i).as("rank"), lit(l).as("lang"))
    }: _*))
    when(best.getField("score") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text.
    * (Exact-dup key; both Spark and DuckDB compute identical md5 hex.) */
  def normalizedFingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))))

  /** Code points of a string as array<bigint> (1-based substr walk; both
    * Spark `ascii`/`substr` and external engines' `unicode`/`substr` count
    * code points, so the sequence is engine-portable). */
  private def codePoints(t: Column): Column =
    // sequence(1, 0) would DESCEND, so the empty string needs its own arm
    when(length(t) === 0, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), length(t)),
        i => ascii(t.substr(i, lit(1))).cast("long")))

  /** One polynomial-hash step: h' = (h*131 + codepoint) mod 1e9+7. The
    * 30-bit modulus keeps every intermediate < 2^38, so the fold is exact
    * under ANSI arithmetic AND bit-identical in any engine with 64-bit
    * integer SQL — that engine-portability is the point: an external
    * oracle can recompute the fingerprint from the raw text. */
  private def polyStep(h: Column, c: Column): Column =
    (h * lit(131L) + c) % lit(1000000007L)

  /** Rolling (order-sensitive) fingerprint: left-to-right polynomial hash
    * over the code points of the whitespace-normalized lowercase text —
    * the rolling-hash half of winnowing-style document fingerprinting as
    * one codegen'd HOF. */
  def rollingFingerprint(text: Column): Column =
    aggregate(codePoints(concat_ws(" ", tokens(lower(text)))), lit(0L), polyStep)

  /** Winnowing fingerprint: minimum polynomial hash over all `k`-char
    * windows of the normalized text (Schleimer et al. SIGMOD'03, the
    * window-min half; full winnowing keeps one min per overlapping band).
    * Texts shorter than `k` fall back to the whole-text hash. O(n·k)
    * codegen'd work per row, no UDF. */
  def winnowFingerprint(text: Column, k: Int = 8): Column = {
    val t = concat_ws(" ", tokens(lower(text)))
    val n = length(t)
    when(n < k, aggregate(codePoints(t), lit(0L), polyStep))
      .otherwise(array_min(transform(sequence(lit(1), n - lit(k) + 1),
        i => aggregate(transform(sequence(i, i + lit(k) - 1),
          j => ascii(t.substr(j, lit(1))).cast("long")), lit(0L), polyStep))))
  }

  /** PII scrub patterns, kept to syntax with identical semantics in Java
    * regex and RE2 (no backrefs, no lookaround) so an external engine can
    * verify the scrub byte-for-byte. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(emailPattern)).cast("int")

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(phonePattern)).cast("int")

  /** Redact emails then phone numbers — a codegen'd two-pass
    * regexp_replace, linear in input bytes. Standard corpus-prep scrub
    * before training-data release. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")
}
