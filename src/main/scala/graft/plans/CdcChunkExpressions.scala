package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunk boundaries + slicing as ONE codegen'd O(n) pass —
  * the native kernel behind [[graft.functions.TextFunctions.cdcChunks]].
  *
  * The HOF form evaluates the window polynomial FRESH per position
  * (`aggregate(slice(cps, i−w+1, w), 0, polyStep)` inside an interpreted
  * `filter` lambda): O(n·window) interpreted work per document. This
  * kernel computes the SAME per-window value by rolling the polynomial —
  * h' = ((h − c_out·131^{w−1}) · 131 + c_in) mod 1e9+7, every
  * intermediate < 2^63 so the modular arithmetic is exact — in one
  * compiled scan: value-identical boundaries (CdcParitySpec pins native ≡
  * HOF bit-for-bit), ~window× less arithmetic and no per-element lambda
  * interpretation.
  *
  * Character model matches the HOF chain exactly for ASCII/BMP input
  * (the documented fixture domain): the HOF's `codePoints` is
  * `ascii(split-""‑char)` = the CODE POINT of each one-char piece
  * (unpaired surrogates round-trip as '?'), reproduced here per UTF-16
  * code unit; slicing is by code unit, which equals the HOF's
  * per-codepoint `substr` on any surrogate-free string. OUTSIDE the BMP
  * the two paths diverge (the HOF hashes code-unit positions but slices
  * by codepoint — internally inconsistent for supplementary chars); the
  * native kernel guarantees instead that no boundary ever lands between
  * a surrogate pair, so chunk concatenation equals the normalized text
  * for EVERY input — bit parity with the HOF is scoped to the BMP
  * (CdcParitySpec pins both properties). */
case class CdcChunksNative(child: Expression, window: Int, maskBits: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunksNative.chunks(input.asInstanceOf[UTF8String], window, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CdcChunksNative.chunks($c, $window, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksNative =
    copy(child = newChild)
}

object CdcChunksNative {

  private val M = 1000000007L

  /** The value the HOF chain's `ascii(split-""-char)` yields per
    * character: the CODE POINT of the one-char piece (Spark 4's `ascii`
    * decodes the first character; a lone surrogate round-trips through
    * UTF8String as '?'). */
  private def asciiOf(c: Char): Long =
    if (Character.isSurrogate(c)) 63L // '?'
    else c.toLong

  /** Static kernel shared by eval and codegen. */
  def chunks(tt: UTF8String, window: Int, maskBits: Int): ArrayData = {
    val s = tt.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val modv = 1L << maskBits
    val ends = new scala.collection.mutable.ArrayBuffer[Int](4)
    if (window <= n) {
      var pw = 1L
      var k = 1
      while (k < window) { pw = pw * 131L % M; k += 1 }
      var h = 0L
      var i = 1
      while (i <= n) {
        val c = asciiOf(s.charAt(i - 1))
        h =
          if (i <= window) (h * 131L + c) % M
          else {
            val cOut = asciiOf(s.charAt(i - 1 - window))
            ((h - cOut * pw % M + M) % M * 131L + c) % M
          }
        // never cut BETWEEN a surrogate pair: a boundary after a high
        // surrogate would put the lone halves in adjacent chunks, and
        // UTF8String.fromString turns each into '?' — chunk concatenation
        // would no longer equal the normalized text for non-BMP input
        if (i >= window && h % modv == 0L && i < n &&
          !Character.isHighSurrogate(s.charAt(i - 1))) { ends += i; (): Unit }
        i += 1
      }
    }
    ends += n
    val out = new Array[Any](ends.length)
    var start = 1
    var j = 0
    while (j < ends.length) {
      out(j) = UTF8String.fromString(s.substring(start - 1, ends(j)))
      start = ends(j) + 1
      j += 1
    }
    new GenericArrayData(out)
  }
}
