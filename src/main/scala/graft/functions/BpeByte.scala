package graft.functions

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

/** BYTE-LEVEL BPE with a real pretokenizer — the GPT-2-class tokenizer
  * shape (Radford et al. 2019, "Language Models are Unsupervised
  * Multitask Learners", public `encoder.py` algorithm description):
  *
  *  - '''Pretokenize''' with a regex that splits contractions, letter
  *    runs, digit runs, punctuation runs, and whitespace runs — so
  *    "don't scan?" pretokenizes to `don|'t| scan|?`, unlike the
  *    whitespace-only [[Bpe]] path where "scan?" is one pretoken. The
  *    pattern here is the RE2-SAFE simplification of GPT-2's (the
  *    original's `\s+(?!\S)` lookahead is dropped — a whitespace run
  *    keeps all its spaces instead of donating its last one to the
  *    next pretoken), using only constructs whose semantics agree
  *    between Java regex (Spark) and RE2 (DuckDB): ordered alternation,
  *    `\p{L}`/`\p{N}` Unicode categories, ASCII `\s`. That is what
  *    lets an external oracle replay pretokenization verbatim.
  *  - '''Byte alphabet''': each pretoken becomes its UTF-8 BYTES, each
  *    byte mapped through the GPT-2 byte↔unicode bijection (printable
  *    bytes map to themselves, the rest shift above U+0100, so every
  *    symbol is one printable BMP char and never a space/control). Any
  *    input whatsoever is encodable — byte fallback is structural, not
  *    a special case — and decode is exact (lossless round-trip,
  *    whitespace included).
  *  - '''Encode''' with the standard min-rank-first / leftmost loop
  *    ([[BpeTable.encode]], unchanged — it is alphabet-agnostic).
  *
  * Unlike the estimate/char-BPE conventions, byte-level counts INCLUDE
  * whitespace-run tokens (real byte-level tokenizers spend tokens on
  * newlines); the per-word cost surface ([[BpeByte.wordCost]]) scores a
  * word standalone (no leading-space variant), the documented
  * approximation every word-budgeted chunker accepts.
  *
  * The committed default merges table lives at
  * `src/main/resources/graft/bpe_byte_merges.tsv`, trained by
  * [[BpeByteTrainMain]] over [[Bpe.seedText]] in byte space —
  * re-runnable provenance; the 100-TB path is [[trainOnCorpusBytes]]
  * (one distributed pretoken-frequency pass, driver-side merge loop
  * over the vocabulary). */
object BpeByte {

  /** The RE2-safe GPT-2-class pretokenizer (see object scaladoc). The
    * same string must be spliced into the DuckDB oracle verbatim. */
  val PretokenRegex: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  private val pretokenPattern = Pattern.compile(PretokenRegex)

  /** GPT-2 byte→unicode bijection: bytes that are printable/visible
    * latin-1 ('!'..'~', '¡'..'¬', '®'..'ÿ') map to themselves; the
    * remaining 68 (controls, space, DEL, soft hyphen …) map to
    * U+0100+k in byte order. Every symbol char is printable and
    * non-space, which keeps space-delimited oracle replay and TSV
    * resources unambiguous. */
  val byteToChar: Array[Char] = {
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
          (b >= 174 && b <= 255)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  private val charToByte: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    var b = 0
    while (b < 256) { m.put(byteToChar(b), b.toByte); b += 1 }
    m
  }

  /** One pretoken → its byte-space form (each UTF-8 byte as one mapped
    * char). */
  def toByteSpace(pretoken: String): String = {
    val bytes = pretoken.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = byteToChar(bytes(i) & 0xff); i += 1 }
    new String(out)
  }

  /** Byte-space form → original string (exact inverse). */
  def fromByteSpace(sym: String): String = {
    val bytes = new Array[Byte](sym.length)
    var i = 0
    while (i < sym.length) {
      val b = charToByte.get(sym.charAt(i))
      require(b != null,
        f"char U+${sym.charAt(i).toInt}%04X is not a byte symbol")
      bytes(i) = b.byteValue()
      i += 1
    }
    new String(bytes, StandardCharsets.UTF_8)
  }

  /** Regex pretokens of a document, in order. */
  def pretokens(text: String): Vector[String] = {
    val m = pretokenPattern.matcher(text)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** Resource path of the committed byte-level merges table. */
  val ResourcePath = "/graft/bpe_byte_merges.tsv"

  /** The committed byte-level table (merges are byte-space symbols;
    * same `rank\tlhs\trhs` format and loader as the char-level
    * table). Loaded once per JVM. */
  lazy val default: BpeTable = {
    val in = getClass.getResourceAsStream(ResourcePath)
    require(in != null, s"missing byte-BPE merges resource $ResourcePath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try Bpe.load(src.getLines().toIndexedSeq) finally src.close()
  }

  /** Exact byte-level BPE token count of a document: Σ per-pretoken
    * encode lengths over the regex pretokens (whitespace runs INCLUDED
    * — see object scaladoc). */
  def tokenCount(table: BpeTable, text: String): Long = {
    var sum = 0L
    val m = pretokenPattern.matcher(text)
    while (m.find()) sum += table.wordCost(toByteSpace(m.group()))
    sum
  }

  /** All byte-level BPE pieces of a document in order, in BYTE-SPACE
    * symbol form (the GPT-2 convention — "Ġthe" for " the"): a piece
    * boundary may split a multi-byte UTF-8 character, so pieces decode
    * only as a whole — [[fromByteSpace]] of the CONCATENATION re-spells
    * the document exactly (lossless, whitespace included; the spec's
    * round-trip lane). */
  def tokenize(table: BpeTable, text: String): Array[String] = {
    val out = Array.newBuilder[String]
    val m = pretokenPattern.matcher(text)
    while (m.find()) out ++= table.encode(toByteSpace(m.group()))
    out.result()
  }

  /** Standalone-word token cost (no leading-space variant) — the
    * per-word cost function word-budgeted chunkers dispatch to under
    * `tokenizer = "bpe-byte"`. */
  def wordCost(table: BpeTable, word: String): Long = tokenCount(table, word)

  /** Train a byte-level merges table from an in-memory corpus: regex
    * pretokenize, map to byte space, count, and run the standard
    * deterministic merge loop ([[Bpe.trainFromCounts]], alphabet-
    * agnostic). */
  def train(corpus: Seq[String], nMerges: Int): IndexedSeq[(String, String)] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    corpus.foreach { doc =>
      pretokens(doc).foreach { p =>
        val k = toByteSpace(p)
        counts.update(k, counts.getOrElse(k, 0L) + 1L)
      }
    }
    Bpe.trainFromCounts(counts.toSeq, nMerges)
  }

  /** Distributed byte-level training: ONE pass collapses the corpus to
    * its regex-pretoken frequency table (Spark's `regexp_extract_all`
    * runs the same Java pattern the kernel uses), the byte-space
    * mapping and merge loop run driver-side over the VOCABULARY-sized
    * counts (the [[Bpe.trainOnCorpus]] bounded-driver-state
    * discipline: refuses past `maxVocab` rather than silently
    * truncating). */
  def trainOnCorpusBytes(docs: org.apache.spark.sql.DataFrame,
                         textCol: String, nMerges: Int,
                         maxVocab: Int = 1 << 20): IndexedSeq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val counts = docs
      .select(explode(regexp_extract_all(col(textCol), lit(PretokenRegex),
        lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val rows = counts.limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"corpus pretoken vocabulary exceeds maxVocab=$maxVocab — raise the " +
        "cap or pre-prune rare pretokens before training")
    Bpe.trainFromCounts(
      rows.map(r => toByteSpace(r.getString(0)) -> r.getLong(1)).toSeq,
      nMerges)
  }
}

/** Regenerates `src/main/resources/graft/bpe_byte_merges.tsv` from
  * [[Bpe.seedText]] — run
  * `sbt "runMain graft.functions.BpeByteTrainMain"` after changing the
  * seed or the trainer. Pure JVM (no Spark). The merge budget is a
  * ceiling; training stops when no pair occurs twice (the seed corpus
  * exhausts well below it — a production table would train via
  * [[BpeByte.trainOnCorpusBytes]] at a 32k+ budget). */
object BpeByteTrainMain {

  /** Byte-level training needs what whitespace pretokenization never
    * sees: punctuation glued to words, contractions, digit runs,
    * multi-byte UTF-8. Authored here (public, re-runnable provenance),
    * appended to the shared [[Bpe.seedText]]; every construct appears
    * at least twice so its pairs clear the count-2 training floor.
    * Non-ASCII is written as \uXXXX escapes (the source stays ASCII). */
  val byteSeedExtra: String = """
    "Quoted words matter," she said. "Quoted words, really." It's the
    encoder's job; it's the encoder's job to split don't and won't and
    can't into don't-style pieces. He said, "we're ready; they're not."
    We're sure you've seen it. You've seen version 2.0, version 3.1,
    and build 2024-08-16; build 2024-08-16 shipped at 12:45:59 UTC,
    at 12:45:59 exactly. Prices: $19.99, $19.99 again, and 1,000,000
    units (one million units) -- yes, (one million)! Really?! Really?!
    See https://example.com/docs and https://example.com/docs#anchor,
    or email test@example.com, test@example.com. Arrays[0] and
    arrays[0], maps{"key": 1} and maps{"key": 2}, paths/like/this and
    paths/like/that. A caf\u00e9 is a caf\u00e9, na\u00efve or
    na\u00efve, r\u00e9sum\u00e9 and r\u00e9sum\u00e9; cost is
    \u20ac100 or \u20ac200, temperature 25\u00b0C then 26\u00b0C,
    em\u2014dash and em\u2014dash, ellipsis\u2026 and ellipsis\u2026
    tabs	and	tabs	again.
  """

  def main(args: Array[String]): Unit = {
    val merges = BpeByte.train(Seq(Bpe.seedText, byteSeedExtra),
      nMerges = 32768)
    val lines = merges.iterator.zipWithIndex.map { case ((l, r), i) =>
      s"${i + 1}\t$l\t$r"
    }.mkString("\n") + "\n"
    val out = java.nio.file.Paths.get(
      "src/main/resources/graft/bpe_byte_merges.tsv")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, lines)
    println(s"[bpe-byte-train] wrote ${merges.length} merges to $out")
  }
}
