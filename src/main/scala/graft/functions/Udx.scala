package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The engine's user-defined-extension surface (SURVEY.md §2b "UDx"):
  * scalar UDF, typed UDAF (Aggregator), and table-function (generator)
  * forms. Everything that *can* be a built-in Column expression should be
  * (see TextFunctions/VectorFunctions — codegen beats UDF); these exist for
  * logic that genuinely needs arbitrary Scala.
  */
object Udx {

  // ---- typed UDAF: bounded top-k heap --------------------------------

  final case class Scored(score: Double, id: Long)

  /** Exact top-k as an `Aggregator`: the buffer is the current top-k,
    * ordered by (score desc, id asc) — k·log k per merge, constant memory,
    * spill-free; the distributed form of a bounded priority queue. Use
    * instead of window row_number when k << group size: the partial
    * aggregation discards non-contenders map-side, so the shuffle carries
    * k rows per group instead of all of them. */
  final class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (-s.score, s.id))
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      (buf :+ a).sorted(ord).take(k)
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r.sorted(ord)
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Column form: `topK(3)(col("score"), col("id"))` inside an agg. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k))
    (score, id) => fn(score, id)
  }

  // ---- scalar UDF ----------------------------------------------------

  /** Scalar UDF example (black-box Scala). Prefer Column expressions when
    * expressible — a UDF breaks codegen and columnar batches. */
  val sigmoid = udf((x: Double) => 1.0 / (1.0 + math.exp(-x)))

  // ---- table function (generator) ------------------------------------

  /** UDTF form: one row per word shingle with its position — `posexplode`
    * over a generated array is Spark's native generator path (no custom
    * Generator class needed). */
  def explodeShingles(text: Column, k: Int): Column =
    posexplode(TextFunctions.shingles(text, k))
}
