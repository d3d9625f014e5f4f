package graft.functions

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

/** Byte-pair-encoding tokenizer — the EXACT replacement for the
  * documented estimate rule ([[TextFunctions.wordTokenCost]]): a real
  * trained merges table plus the standard greedy encoder, so every
  * token-denominated operator (chunking, packing, datasheet counts)
  * can run on true tokenizer tokens instead of the ~4-chars-per-token
  * approximation. Sennrich et al., "Neural Machine Translation of Rare
  * Words with Subword Units" (ACL'16) — the original char-level BPE;
  * GPT-2's byte-level variant is the same algorithm over a byte
  * alphabet and drops in by swapping the initial-symbol function and
  * the merges file (same `rank\tlhs\trhs` format).
  *
  * Determinism contract (both halves are engine-replayable):
  *
  *  - '''Pretokenize''': split on `\s+` runs, drop empties — the same
  *    whitespace tokenization every text operator here uses
  *    ([[TextFunctions.tokens]]), so word boundaries agree with the
  *    estimate path and with the DuckDB oracle's `string_split_regex`.
  *  - '''Encode''' one word: start from its Unicode codepoints, then
  *    repeat until no merge applies: among all adjacent symbol pairs
  *    present in the merges table, pick the one with the SMALLEST rank
  *    and merge its LEFTMOST occurrence. For a trained table this
  *    one-at-a-time form IS the classic all-occurrences-per-rank
  *    encode: merging the min-rank pair only creates pairs involving
  *    the merged symbol, and any such pair was learned LATER in
  *    training (larger rank), so the remaining occurrences of the
  *    min-rank pair stay minimal. One step at a time is what a SQL
  *    oracle can replay as a recursive CTE (one leftmost
  *    string-replace per recursion step).
  *
  * The committed default table lives at
  * `src/main/resources/graft/bpe_merges.tsv`, trained by
  * [[BpeTrainMain]] from the embedded seed text — re-runnable
  * provenance, no opaque binary blob. Unknown characters (anything the
  * training alphabet never saw) simply stay single-codepoint tokens —
  * the char-level analogue of byte fallback. */
final class BpeTable(val merges: IndexedSeq[(String, String)]) {

  /** pair → rank (1-based; smaller merges first). */
  private val rank: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int](merges.size * 2)
    merges.iterator.zipWithIndex.foreach { case ((l, r), i) =>
      // U+0000 never appears in a symbol (symbols come from
      // whitespace pretokenization of real text), so it is a safe
      // pair-key separator
      m.put(l + "\u0000" + r, i + 1)
    }
    m
  }

  /** Encode one pretoken to its BPE pieces (the documented
    * min-rank-first / leftmost-occurrence loop). O(len²) worst case
    * over SHORT words — the per-word cache below amortizes repeated
    * vocabulary across a partition. */
  def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val syms = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var at = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrDefault(syms(j) + "\u0000" + syms(j + 1),
          Int.MaxValue)
        if (r < best) { best = r; at = j } // strict < keeps the LEFTMOST
        j += 1
      }
      if (at < 0) done = true
      else {
        syms(at) = syms(at) + syms(at + 1)
        syms.remove(at + 1)
        if (syms.length < 2) done = true
      }
    }
    syms.toArray
  }

  /** Token count of one pretoken, cached: the merges table is immutable
    * so word → count is a pure function; corpora repeat their
    * vocabulary heavily, so a bounded cache turns the encode loop into
    * a hash probe for the hot path. ConcurrentHashMap because one
    * table instance serves every task thread in the executor JVM; the
    * whole-map clear at the cap is a crude but contention-free bound
    * (a miss just re-encodes — correctness never depends on the
    * cache). */
  private val costCache = new ConcurrentHashMap[String, java.lang.Long]()
  private val CacheCap = 1 << 16

  def wordCost(word: String): Long = {
    val hit = costCache.get(word)
    if (hit != null) return hit.longValue()
    val c = encode(word).length.toLong
    if (costCache.size() >= CacheCap) costCache.clear()
    costCache.put(word, java.lang.Long.valueOf(c))
    c
  }

  /** Exact BPE token count of a document: Σ wordCost over `\s+`
    * pretokens (whitespace itself costs nothing — the
    * [[TextFunctions.tokenEstimate]] convention, so estimate and exact
    * counts are directly comparable). */
  def tokenCount(text: String): Long = {
    var sum = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) sum += wordCost(text.substring(start, i))
    }
    sum
  }

  /** All BPE pieces of a document in order (per-pretoken encodes
    * concatenated) — the inspection/debug surface. */
  def tokenize(text: String): Array[String] =
    text.split("\\s+").iterator.filter(_.nonEmpty).flatMap(encode).toArray
}

object Bpe {

  /** Resource path of the committed default merges table. */
  val ResourcePath = "/graft/bpe_merges.tsv"

  /** The committed default table (rank-ordered `rank\tlhs\trhs` lines,
    * trained by [[BpeTrainMain]]). Loaded once per JVM. */
  lazy val default: BpeTable = {
    val in = getClass.getResourceAsStream(ResourcePath)
    require(in != null, s"missing BPE merges resource $ResourcePath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try load(src.getLines().toIndexedSeq) finally src.close()
  }

  /** Parse `rank\tlhs\trhs` lines (rank column is a human-readable
    * check — order in the file is authoritative and must agree). */
  def load(lines: Seq[String]): BpeTable = {
    val merges = lines.iterator.filter(_.nonEmpty).zipWithIndex.map {
      case (line, i) =>
        val Array(r, l, rr) = line.split("\t", 3)
        require(r.toInt == i + 1,
          s"merges file rank column out of order at line ${i + 1}: $line")
        (l, rr)
    }.toIndexedSeq
    new BpeTable(merges)
  }

  /** Train a merges table: classic deterministic BPE training.
    * Pretokenize the corpus (`\s+`), count words, then `nMerges` times:
    * count every adjacent symbol-pair POSITION (overlaps included,
    * weighted by word frequency), adopt the most frequent pair —
    * lexicographic (lhs, rhs) tie-break — and rewrite every word by one
    * leftmost-non-overlapping merge pass. Stops early when no pair
    * occurs twice (a merge seen once compresses nothing). Every rule is
    * deterministic, so retraining on the same seed reproduces the
    * committed file byte-for-byte (BpeSpec pins this). */
  def train(corpus: Seq[String], nMerges: Int): IndexedSeq[(String, String)] = {
    val counts = corpus.iterator
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .toSeq.groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }.toSeq
    trainFromCounts(counts, nMerges)
  }

  /** The training loop over a WORD-FREQUENCY table — how BPE training
    * actually scales: the corpus collapses to its vocabulary in one
    * distributed pass ([[trainOnCorpus]]), and the merge iterations run
    * over (word, count) pairs whose cardinality is the vocabulary, not
    * the corpus. Same rules as [[train]] (all-position pair counts
    * weighted by word frequency, max count with lexicographic (lhs,
    * rhs) tie-break, leftmost-non-overlapping rewrite, stop below
    * count 2); input order never matters (the state is a map and the
    * tie-break is total). */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
                      nMerges: Int): IndexedSeq[(String, String)] = {
    // codepoint split, matching BpeTable.encode's initial symbols
    def syms(w: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + n)
        i += n
      }
      b.result()
    }
    var words: Map[Vector[String], Long] = wordCounts.iterator
      .map { case (w, c) => syms(w) -> c }.toMap
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && out.length < nMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val (pair, cnt) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (cnt < 2) continue = false
        else {
          out += pair
          words = words.map { case (syms, c) =>
            val merged = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == pair._1 &&
                  syms(i + 1) == pair._2) {
                merged += pair._1 + pair._2
                i += 2
              } else {
                merged += syms(i)
                i += 1
              }
            }
            merged.toVector -> c
          }
        }
      }
    }
    out.toIndexedSeq
  }

  /** Train a merges table ON A CORPUS DataFrame — the distributed form:
    * ONE pass over the corpus aggregates the word-frequency table
    * ([[graft.functions.TextFunctions.tokens]] pretokenization, so the
    * trained table's word boundaries agree with every consumer), and
    * the merge iterations then run driver-side over the
    * VOCABULARY-sized counts (the kmeansCodebook bounded-driver-state
    * discipline: the collect is capped at `maxVocab` rows and refuses
    * past it rather than silently truncating — pre-prune rare words
    * upstream, e.g. `HAVING count >= minCount`, to fit web-scale
    * vocabularies). Tokenizing 100 TB is the distributed part; training
    * over the dictionary never was. Deterministic: identical counts →
    * identical merges regardless of row order. */
  def trainOnCorpus(docs: org.apache.spark.sql.DataFrame, textCol: String,
                    nMerges: Int,
                    maxVocab: Int = 1 << 20): IndexedSeq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val rows = counts.limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"corpus vocabulary exceeds maxVocab=$maxVocab — raise the cap or " +
        "pre-prune rare words before training")
    trainFromCounts(rows.map(r => r.getString(0) -> r.getLong(1)).toSeq,
      nMerges)
  }

  /** The seed text the committed table is trained on: ordinary English
    * prose plus the synthetic corpus vocabulary (so real fixture words
    * actually compress through multiple merges) plus digits and
    * punctuation-adjacent forms. Authored here — public, re-runnable
    * provenance for the resource file. */
  val seedText: String = """
    the quick brown fox jumps over the lazy dog while the little dog
    watches the other dogs run through the green field in the morning
    light and the evening light and thinks that running is better than
    walking when the weather is warm and the ground is dry but walking
    is better than running when the rain is falling and the ground is
    wet because the water makes the running path slippery and slow
    a query engine reads a table and writes a table and every table
    holds rows and every row holds values and the engine scans the rows
    and filters the rows and groups the rows and sorts the rows and
    joins one table with another table using a key and a hash of the
    key and the planner picks the order of the joins and the scans
    key agg row scan slow fast table value part hash merge batch spark
    line sort window the a with into from where group order select
    token tokens tokenizer merges vocab corpus document documents text
    chunk chunks chunking packing window windows stream streams state
    counting 12345 67890 2026 100 512 1024 (parens) [brackets] a.b.c
    e.g. i.e. don't can't won't it's o'clock end-to-end state-of-the-art
  """

  /** Merge budget of the committed table. */
  val defaultMerges = 256
}

/** Regenerates `src/main/resources/graft/bpe_merges.tsv` from
  * [[Bpe.seedText]] — run `sbt "runMain graft.functions.BpeTrainMain"`
  * after changing the seed or the trainer. Pure JVM (no Spark). */
object BpeTrainMain {
  def main(args: Array[String]): Unit = {
    val merges = Bpe.train(Seq(Bpe.seedText), Bpe.defaultMerges)
    val lines = merges.iterator.zipWithIndex.map { case ((l, r), i) =>
      s"${i + 1}\t$l\t$r"
    }.mkString("\n") + "\n"
    val out = java.nio.file.Paths.get(
      "src/main/resources/graft/bpe_merges.tsv")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, lines)
    println(s"[bpe-train] wrote ${merges.length} merges to $out")
  }
}
