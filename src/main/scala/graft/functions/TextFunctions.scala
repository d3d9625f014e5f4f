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

  /** Unicode NFC canonical composition ([[graft.plans.NfcNormalize]],
    * codegen'd, common-case zero-copy). Mixed composed/decomposed forms
    * of visually identical text otherwise split dedup fingerprints and
    * shingle sets silently. */
  def nfc(text: Column): Column =
    org.apache.spark.sql.classic.GraftShims.column(
      graft.plans.NfcNormalize(
        org.apache.spark.sql.classic.GraftShims.expression(text)))

  /** Corpus text normalization — the standard pre-dedup cleaning stage:
    * NFC-compose, replace control (Cc) and invisible format (Cf —
    * zero-width spaces/joiners, BOM, bidi marks) characters with
    * spaces, collapse whitespace runs (tabs/newlines included — this is
    * the FLATTENING normalizer; line structure consumers run BEFORE
    * it), trim. Deterministic, engine-portable (the oracle reproduces
    * it in DuckDB), and idempotent — clean(clean(x)) == clean(x). */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfc(text), "[\\p{Cc}\\p{Cf}]", " "), "\\s+", " "))

  /** Whitespace tokenization; empty string → empty array. */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Rule-based SENTENCE segmentation as `array<string>` — the unit
    * every sentence-aware pipeline stage (RAG chunking, per-sentence
    * quality scores, sentence-level dedup) runs on. Deterministic and
    * RE2-safe so the oracle replays it verbatim in DuckDB (no
    * lookbehind, which RE2 lacks): mark each sentence-final
    * [.!?]-then-whitespace boundary with U+001E (record separator,
    * DuckDB `chr(30)`) via one capture-group replace, split on the marker, drop whitespace-only pieces, trim.
    * Text without terminal punctuation is one sentence; empty/blank
    * text segments to zero sentences. Abbreviation handling is out of
    * scope by design — the rule must stay replayable, the q71/q138
    * regexp discipline. */
  def sentencesOf(text: Column): Column = {
    val Sep = "\u001E"
    val marked = regexp_replace(trim(text), "([.!?])\\s+", "$1" + Sep)
    transform(filter(split(marked, Sep), s => trim(s) =!= ""),
      s => trim(s))
  }

  /** BPE-ish subword count estimate: word-pieces + digits + punctuation as
    * separate tokens (a cheap regex proxy for a real tokenizer's count). */
  def subwordCountEstimate(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      x => trim(x) =!= ""))

  /** Word k-shingles as space-joined strings (MinHash input).
    * Documents shorter than k words yield a single shingle of the whole
    * text so they can still participate in dedup.
    *
    * The single-element `transform` BINDS the token array to a lambda
    * variable: HOF lambdas are interpreted, so a bare reference to
    * `tokens(text)` inside the per-window loop would RE-TOKENIZE the whole
    * document for every window — O(words²) per doc, measured 20×+ on the
    * sf0.1 near-dup battery. A bound variable is an O(1) read. */
  def shingles(text: Column, k: Int): Column =
    element_at(transform(array(tokens(text)), toks =>
      when(size(toks) <= k, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(1), size(toks) - lit(k) + lit(1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))), 1)

  /** Character n-grams of the lowercased text. Split once into per-char
    * strings and slice — both the naive `substr(i, n)` walk (O(i) per
    * call on UTF8 bytes) and an unbound array reference in the lambda
    * (re-split per window) would be quadratic; see [[shingles]]. */
  def charNgrams(text: Column, n: Int): Column =
    element_at(transform(array(array_remove(split(lower(text), ""), "")),
      chars =>
        when(size(chars) <= n, array(concat_ws("", chars)))
          .otherwise(transform(sequence(lit(1), size(chars) - lit(n) + lit(1)),
            i => concat_ws("", slice(chars, i, lit(n)))))), 1)

  /** Codepoint array of the text (split-once, O(n) — never a substr
    * walk; BMP-correct, the fixtures are ASCII). */
  def codepoints(text: Column): Column =
    transform(array_remove(split(text, ""), ""), c => ascii(c).cast("long"))

  /** Coarse Unicode script class of a codepoint — the script-detection
    * complement to [[langId]] (a lang label whose text is mostly the
    * wrong script is mislabeled/mojibake). Deterministic range tests an
    * oracle replays verbatim. */
  def scriptClass(cp: Column): Column =
    when(cp.between(97L, 122L) || cp.between(65L, 90L), "latin")
      .when(cp.between(48L, 57L), "digit")
      .when(cp.between(19968L, 40959L), "han")
      .when(cp.isin(32L, 9L, 10L, 13L), "space")
      .otherwise("other")

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

  /** Occurrences of '#' plus non-overlapping '...' per word — Gopher's
    * symbol-to-word rule (markup/truncation soup reads as low-quality
    * prose). 0 for empty docs. */
  def symbolWordRatio(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val dots = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    when(n === 0.0, lit(0.0)).otherwise((hashes + dots).cast("double") / n)
  }

  /** Fraction of lines starting with a bullet marker (-, *, •). Lines
    * split on \n, ratio over ALL lines; 0 for empty docs. */
  def bulletLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    when(length(text) === 0, lit(0.0)).otherwise(
      size(filter(lines, l =>
        trim(l).rlike("^[-*\\u2022]"))).cast("double") / size(lines))
  }

  /** Fraction of lines ending with an ellipsis ('...' or '…'). */
  def ellipsisLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    when(length(text) === 0, lit(0.0)).otherwise(
      size(filter(lines, l =>
        trim(l).rlike("(\\.\\.\\.|\\u2026)$"))).cast("double") / size(lines))
  }

  /** Fraction of words containing at least one ASCII letter — Gopher's
    * alphabetic-word rule (numbers/punctuation soup fails it). */
  def alphaWordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / size(toks))
  }

  /** How many DISTINCT members of Gopher's required-stopword set
    * (the, be, to, of, and, that, have, with) appear as words. */
  def stopwordHits(text: Column): Column =
    size(array_intersect(array_distinct(tokens(lower(text))),
      typedLit(Seq("the", "be", "to", "of", "and", "that", "have", "with"))))

  /** The Gopher document-quality gate (Rae et al. 2021, the quality
    * heuristics): word-count bounds, mean word length in [3, 10],
    * symbol-to-word ratio <= 0.1, <= 90% bullet lines, <= 30%
    * ellipsis lines, >= 80% alphabetic words, >= 2 required stopwords.
    * Each signal is exposed above so pipelines can tune thresholds;
    * this is the canonical conjunction. Map-side, codegen'd. */
  def gopherPass(text: Column, minWords: Int = 50,
                 maxWords: Int = 100000): Column = {
    val n = tokenCount(text)
    val mwl = meanWordLength(text)
    (n >= minWords) && (n <= maxWords) &&
      (mwl >= 3.0) && (mwl <= 10.0) &&
      (symbolWordRatio(text) <= 0.1) &&
      (bulletLineRatio(text) <= 0.9) &&
      (ellipsisLineRatio(text) <= 0.3) &&
      (alphaWordRatio(text) >= 0.8) &&
      (stopwordHits(text) >= 2)
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

  /** Code points of a string as array<bigint>, O(n): split into per-char
    * strings, then `ascii` (which returns the leading code point) of each.
    * The obvious substr(i, 1) walk is O(n²) — UTF8String counts characters
    * from the start on every call — and cost 25× on the fingerprint bench.
    * Engine-portable vs `unicode`/`substr` oracles for BMP text; outside
    * the BMP a regex split sees surrogate halves (not a case the corpus
    * fixtures or the oracle's own substr walk exercise identically). */
  private def codePoints(t: Column): Column =
    transform(array_remove(split(t, ""), ""), c => ascii(c).cast("long"))

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

  /** The raw engine-portable polynomial hash of a string, on
    * [0, 1e9+7) — [[polyStep]] folded over the code points with no
    * normalization. The hash the KMV sketch ([[Udx.kmvSketch]]) and any
    * oracle-replayable hashing consumer should share: an external
    * engine recomputes it exactly from the text (xxhash64 cannot be
    * replayed outside the JVM). */
  def polyHash(text: Column): Column =
    aggregate(codePoints(text), lit(0L), polyStep)

  /** Winnowing fingerprint: minimum polynomial hash over all `k`-char
    * windows of the normalized text (Schleimer et al. SIGMOD'03, the
    * window-min half; full winnowing keeps one min per overlapping band).
    * Texts shorter than `k` fall back to the whole-text hash. O(n·k)
    * codegen'd work per row, no UDF. */
  def winnowFingerprint(text: Column, k: Int = 8): Column =
    // the single-element transform BINDS the code-point array to a lambda
    // variable: HOF lambdas are interpreted, so a bare reference to the
    // array expression inside the per-window loop would RE-DERIVE it for
    // every window (O(n²)); the bound variable is an O(1) read
    element_at(transform(
      array(codePoints(concat_ws(" ", tokens(lower(text))))),
      cps =>
        when(size(cps) < k, aggregate(cps, lit(0L), polyStep))
          .otherwise(array_min(transform(
            sequence(lit(1), size(cps) - lit(k) + 1),
            i => aggregate(slice(cps, i, lit(k)), lit(0L), polyStep))))),
      1)

  /** Content-defined chunking (Rabin-style): split the normalized text
    * at every position whose trailing `window`-codepoint rolling hash
    * ([[polyStep]], the q46 fold) has its low `maskBits` bits zero —
    * boundaries are a function of LOCAL content only, so an insertion
    * shifts at most the chunks it touches and every downstream chunk
    * re-aligns (the property fixed-size or line splitting lacks, and
    * the reason dedup storage systems chunk this way). Expected chunk
    * length ≈ 2^maskBits codepoints. Returns the chunk TEXTS in order;
    * their concatenation is exactly the normalized text (for non-BMP
    * input the kernel suppresses any boundary that would split a
    * surrogate pair, so the guarantee holds for every input — but
    * boundary POSITIONS and oracle replayability are pinned only on
    * the BMP/ASCII character domain, where the rolling-hash chain is
    * engine-portable). Empty/null text → empty array; text shorter
    * than `window` → one chunk.
    *
    * Runs as ONE codegen'd O(n) native pass
    * ([[graft.plans.CdcChunksNative]] — the boundary polynomial ROLLED
    * instead of re-folded per position; value-identical, CdcParitySpec
    * pins native ≡ the HOF fallback bit-for-bit). Zero shuffle.
    * Deterministic in any 64-bit-integer engine — an oracle replays
    * boundaries and chunks verbatim. */
  def cdcChunks(text: Column, window: Int = 8, maskBits: Int = 6): Column = {
    require(window >= 2, s"window must be >= 2 (got $window)")
    require(maskBits >= 1 && maskBits <= 20,
      s"maskBits must be in [1, 20] (got $maskBits)")
    val t0 = concat_ws(" ", tokens(lower(text)))
    val out = org.apache.spark.sql.classic.GraftShims.column(
      graft.plans.CdcChunksNative(
        org.apache.spark.sql.classic.GraftShims.expression(t0),
        window, maskBits))
    when(text.isNull, array().cast("array<string>")).otherwise(out)
  }

  /** The original interpreted-HOF form of [[cdcChunks]] — kept as the
    * parity reference for the native kernel (CdcParitySpec asserts
    * bit-identical output; the O(n·window) per-position re-fold is why
    * it was replaced on the hot path). */
  private[graft] def cdcChunksHof(text: Column, window: Int = 8,
                                  maskBits: Int = 6): Column = {
    require(window >= 2, s"window must be >= 2 (got $window)")
    require(maskBits >= 1 && maskBits <= 20,
      s"maskBits must be in [1, 20] (got $maskBits)")
    val modv = 1L << maskBits
    val t0 = concat_ws(" ", tokens(lower(text)))
    val out = element_at(transform(array(t0), tt =>
      element_at(transform(array(codePoints(tt)), cps => {
        val n = size(cps)
        val bounds =
          when(lit(window) > n, array().cast("array<int>"))
            .otherwise(filter(sequence(lit(window), n), i =>
              aggregate(slice(cps, i - lit(window) + 1, lit(window)),
                lit(0L), polyStep) % lit(modv) === lit(0L)))
        val ends = concat(filter(bounds, x => x < n), array(n))
        val starts = concat(array(lit(1)),
          transform(slice(ends, lit(1), size(ends) - 1), x => x + 1))
        when(n === 0, array().cast("array<string>"))
          .otherwise(zip_with(starts, ends, (a, b) => tt.substr(a, b - a + 1)))
      }), 1)), 1)
    when(text.isNull, array().cast("array<string>")).otherwise(out)
  }

  /** Estimated BPE token cost of ONE whitespace-token, by a documented
    * deterministic rule (the public "~4 chars per token" average, plus
    * GPT-2's digit/punctuation splitting behavior):
    *
    *   cost(word) = Σ_alpha-runs ceil(len/4) + #digits + #other-chars
    *
    * — each maximal [A-Za-z]+ run costs ceil(len/4) subword tokens, and
    * every digit or non-alphanumeric character is its own token. Exact
    * integer arithmetic, regex-free per char class in any engine with
    * RE2/Java regex — an external oracle replays it verbatim. A real
    * trained tokenizer slots in by replacing THIS function; everything
    * budgeted on top ([[graft.operators.CorpusPrep.chunkTokens]],
    * `packTokens`) is cost-function-agnostic. */
  def wordTokenCost(word: Column): Column = {
    // ONE single-char-class split does all the classification: splitting
    // on every non-alpha CHAR yields exactly the alpha runs as pieces
    // (empties cost ceil(0/4) = 0) and `pieces - 1` IS the non-alpha
    // char count — digits and punctuation both cost 1, so they need no
    // class distinction. (Spark's split keeps trailing empties, so the
    // count holds at word edges.) One regex pass + an integer fold; the
    // equivalent 3-regex form (split [^A-Za-z]+ plus two regexp_replace
    // counts) and a per-codepoint struct fold both measured slower
    // inside interpreted HOF lambdas.
    val p = split(word, "[^A-Za-z]")
    (size(p) - 1).cast("long") +
      aggregate(p, lit(0L), (acc, r) => acc + shiftright(length(r) + 3, 2))
  }

  /** Estimated BPE token count of a document: Σ [[wordTokenCost]] over
    * its whitespace tokens (whitespace itself costs nothing — merged
    * into the following word by real BPEs). The token-budget twin of
    * [[tokenCount]]. */
  def tokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => acc + wordTokenCost(w))

  /** Tokenizer switch for every token-budgeted operator: the per-WORD
    * cost column under `tokenizer` ∈ {"estimate", "bpe"}. "estimate" is
    * the documented deterministic rule ([[wordTokenCost]]); "bpe" is
    * the EXACT committed-merges encoder
    * ([[graft.plans.BpeWordCost]] — register
    * [[graft.plans.BpeExpressions]] on the session first). Budgets,
    * chunk boundaries, and packing are cost-function-agnostic, so this
    * one switch moves them all between the approximate and the exact
    * tokenizer. */
  def wordCost(word: Column, tokenizer: String): Column = tokenizer match {
    case "estimate" => wordTokenCost(word)
    case "bpe" => call_function(graft.plans.BpeWordCost.name, word)
    case "bpe-byte" => call_function(graft.plans.BpeByteWordCost.name, word)
    case other => throw new IllegalArgumentException(
      s"tokenizer must be estimate|bpe|bpe-byte, got $other")
  }

  /** Per-DOCUMENT token count under the chosen tokenizer (the
    * [[wordCost]] switch summed over `\s+` pretokens; the bpe kernel
    * pretokenizes inside one codegen'd call). */
  def tokenCountOf(text: Column, tokenizer: String): Column = tokenizer match {
    case "estimate" => tokenEstimate(text)
    case "bpe" => call_function(graft.plans.BpeTokenCount.name, text)
    case "bpe-byte" => call_function(graft.plans.BpeByteTokenCount.name, text)
    case other => throw new IllegalArgumentException(
      s"tokenizer must be estimate|bpe|bpe-byte, got $other")
  }

  /** Hashed-feature bucket of one token: polynomial hash of its code
    * points ([[polyStep]] — exact long arithmetic) folded into
    * `numBuckets` by pmod. Chosen over xxhash64 because an external
    * engine can recompute it exactly from the raw text — the hashing
    * trick (Weinberger et al. ICML'09) with an engine-portable hash. */
  private def featureBucket(tok: Column, numBuckets: Int): Column =
    pmod(aggregate(codePoints(tok), lit(0L), polyStep),
      lit(numBuckets.toLong))

  /** Deterministic fixed-point stand-in weights for [[qualityLogit]]:
    * micro-unit integers in [-2000, 2000] derived from the bucket id
    * (Knuth multiplicative mix). In production these are TRAINED
    * fastText-style linear weights loaded from a model file; the derived
    * table gives tests and oracles a committed, recomputable instance
    * with the same shape. */
  def derivedQualityWeights(numBuckets: Int, seed: Long = 104729L): Array[Long] =
    Array.tabulate(numBuckets)(b => ((b * 2654435761L + seed) % 4001L) - 2000L)

  /** Learned quality gate, scoring half: a logistic-regression LINEAR
    * score (the logit) over hashed token unigram + bigram features —
    * the fastText-style learned filter public LLM-data pipelines run
    * after the heuristic gates ([[gopherPass]], C4). `weights` is the
    * trained weight vector in FIXED-POINT micro-units (index =
    * [[featureBucket]]); it ships to executors as ONE array literal
    * (broadcast-sized: 4k buckets = 32 KB), the fold is a codegen'd
    * HOF chain, and every step is exact 64-bit integer arithmetic — so
    * an external engine replays the score bit-for-bit (the judge-able
    * property; a float sigmoid would not be). Monotone in the
    * probability, so thresholding the logit IS thresholding the
    * sigmoid: pass = logit >= tau. Empty text scores `bias`.
    *
    * Overflow contract: |weights| <= ~2000 micro-units keeps a 100k-token
    * document's sum < 2^31 — far from long overflow; callers loading
    * larger trained weights must bound |w| * maxTokens < 2^62. */
  def qualityLogit(text: Column, weights: Array[Long], bias: Long = 0L,
                   bigrams: Boolean = true): Column = {
    val nb = weights.length
    require(nb > 0, "weights must be non-empty")
    val warr = lit(weights)
    // bind the token array once: HOF lambdas are interpreted, and an
    // unbound tokens(text) reference would re-tokenize per feature
    element_at(transform(array(tokens(lower(text))), ts => {
      val uniSum = aggregate(ts, lit(0L), (acc, t) =>
        acc + element_at(warr, (featureBucket(t, nb) + 1L).cast("int")))
      val biSum =
        if (!bigrams) lit(0L)
        else when(size(ts) < 2, lit(0L)).otherwise(
          aggregate(sequence(lit(1), size(ts) - 1), lit(0L), (acc, i) =>
            acc + element_at(warr, (featureBucket(
              concat(element_at(ts, i), lit(" "), element_at(ts, i + 1)),
              nb) + 1L).cast("int"))))
      lit(bias) + uniSum + biSum
    }), 1)
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

  // ---- HTML → text extraction --------------------------------------------

  /** Block-level tags whose open/close becomes a block boundary. */
  val htmlBlockTags: String =
    "p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|pre|" +
      "section|article|header|footer|nav|head|body|html|title"

  /** HTML → text extraction — the step BEFORE every text gate in real
    * pipelines (C4/CCNet operate on EXTRACTED text; the extractor is
    * where half the quality is won). Deterministic rule-based contract,
    * replayable verbatim in any RE2/Java-regex engine (the
    * [[redactPii]] discipline — no DOM parser, no backrefs, no
    * engine-specific classes):
    *
    *   1. drop `<script>…</script>` / `<style>…</style>` whole
    *      (`(?is)` dotall + case-fold, lazy body) and `<!-- … -->`
    *      comments;
    *   2. open/close BLOCK tags ([[htmlBlockTags]]) become newlines —
    *      the block segmentation;
    *   3. every remaining tag is stripped to a space (inline tags must
    *      not glue adjacent words);
    *   4. the core named entities decode via fixed string replaces —
    *      `&nbsp; &lt; &gt; &quot; &#39;` first, `&amp;` LAST (so
    *      `&amp;lt;` decodes to the literal text `&lt;`, the standard
    *      order) — decoded angle brackets are already past tag
    *      stripping, so entity-encoded "tags" stay text (correct);
    *   5. per block: whitespace-collapse + trim, drop empty blocks,
    *      re-join with a single `\n`.
    *
    * Pure map-side codegen'd regexp/replace chain, linear in input
    * bytes. Null propagates. Plain text with no markup passes through
    * (modulo whitespace normalization) — safe to run unconditionally
    * at ingest. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val seg = regexp_replace(noComment,
      s"(?i)</?($htmlBlockTags)\\b[^>]*>", "\n")
    val noTags = regexp_replace(seg, "<[^>]*>", " ")
    val decoded = replace(replace(replace(replace(replace(noTags,
      lit("&nbsp;"), lit(" ")),
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'"))
    val done = replace(decoded, lit("&amp;"), lit("&"))
    array_join(
      filter(
        transform(split(done, "\n"),
          b => trim(regexp_replace(b, "\\s+", " "))),
        b => b =!= ""),
      "\n")
  }

  /** Block count of [[htmlToText]]'s output (0 for empty extraction). */
  def htmlBlockCount(clean: Column): Column =
    when(clean === "", lit(0L))
      .otherwise(size(split(clean, "\n")).cast("long"))

  // ---- URL canonicalization ----------------------------------------------

  /** URL canonicalization — the exact-dedup key public crawl pipelines
    * compute before any content dedup (the same page is fetched under
    * many spellings). Deterministic string rules, each one plain
    * regexp/split/sort replayable in any engine:
    *
    *   1. trim; strip the fragment (`#…`);
    *   2. lowercase the scheme and the host (ONLY those — path and
    *      query are case-significant per RFC 3986);
    *   3. drop the scheme's default port (`:80` http, `:443` https);
    *   4. strip trailing slashes from the path; an empty path
    *      canonicalizes to `/`… then to the bare authority form —
    *      kept simple: empty → "/" is normalized to "/" and a bare
    *      host keeps exactly one slash;
    *   5. sort query parameters (`&`-split, lexicographic) — parameter
    *      ORDER is presentation noise, duplicates are preserved;
    *      an empty query drops its `?`.
    *
    * Inputs without a `scheme://` prefix are returned trimmed,
    * untouched (not URLs — garbage in, unchanged out, so the column is
    * safe to run over mixed fields). Pure map-side codegen'd chain. */
  def canonicalUrl(url: Column): Column = {
    val u = trim(url)
    val noFrag = regexp_replace(u, "#.*", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQ = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_extract(pathQ, "^([^?]*)", 1)
    val pathStripped = regexp_replace(path, "/+$", "")
    val pathNorm = when(pathStripped === "", lit("/"))
      .otherwise(pathStripped)
    val qBody = regexp_replace(regexp_replace(pathQ, "^[^?]*", ""),
      "^\\?", "")
    val qNorm = when(qBody === "", lit(""))
      .otherwise(concat(lit("?"),
        array_join(array_sort(split(qBody, "&")), "&")))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, pathNorm, qNorm))
  }
}
