package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Bpe

/** EXACT BPE tokenization as codegen'd expressions over the committed
  * merges table ([[graft.functions.Bpe.default]]) — the native-kernel
  * surface the token-budgeted operators switch to with
  * `tokenizer = "bpe"` ([[graft.operators.CorpusPrep.chunkTokens]],
  * `packTokens`, [[graft.functions.TextFunctions.tokenEstimate]]'s
  * exact twin). All three are UnaryExpressions whose eval and generated
  * code call ONE static kernel (the [[NfcNormalize]] discipline), so
  * they stay inside whole-stage codegen and inside HOF lambdas alike;
  * the per-word LRU in [[graft.functions.BpeTable]] makes the hot path
  * a hash probe per vocabulary word. Null propagates (UnaryExpression
  * default). */
private[plans] trait BpeStringExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${dt.catalogString}")
  }
}

/** Exact BPE token count of a whole document (whitespace pretokenize +
  * Σ per-word encode lengths). */
case class BpeTokenCount(child: Expression) extends BpeStringExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = BpeTokenCount.name

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  val name = "graft_bpe_count"

  def count(s: UTF8String): Long = Bpe.default.tokenCount(s.toString)

  val info = new ExpressionInfo(classOf[BpeTokenCount].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    BpeTokenCount(children.head)
  }
}

/** Exact BPE token count of ONE pretoken — the drop-in replacement for
  * the estimate rule inside per-word cost lambdas
  * ([[graft.functions.TextFunctions.wordTokenCost]]'s exact twin). */
case class BpeWordCost(child: Expression) extends BpeStringExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = BpeWordCost.name

  override protected def nullSafeEval(input: Any): Any =
    BpeWordCost.cost(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeWordCost.cost($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeWordCost =
    copy(child = newChild)
}

object BpeWordCost {
  val name = "graft_bpe_word_cost"

  def cost(s: UTF8String): Long = Bpe.default.wordCost(s.toString)

  val info = new ExpressionInfo(classOf[BpeWordCost].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    BpeWordCost(children.head)
  }
}

/** The BPE pieces themselves, document-order (per-pretoken encodes
  * concatenated) — inspection, vocabulary accounting, and the spec's
  * reconstruction lane (concat_ws of the pieces of one word re-spells
  * the word). */
case class BpeTokens(child: Expression) extends BpeStringExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = BpeTokens.name

  override protected def nullSafeEval(input: Any): Any =
    BpeTokens.pieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeTokens.pieces($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object BpeTokens {
  val name = "graft_bpe_tokens"

  def pieces(s: UTF8String): GenericArrayData =
    new GenericArrayData(
      Bpe.default.tokenize(s.toString).map(UTF8String.fromString(_)))

  val info = new ExpressionInfo(classOf[BpeTokens].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    BpeTokens(children.head)
  }
}

object BpeExpressions {
  /** Register all three under their `graft_bpe_*` names. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(BpeTokenCount.name, BpeTokenCount.builder, "built-in")
    reg.createOrReplaceTempFunction(BpeWordCost.name, BpeWordCost.builder, "built-in")
    reg.createOrReplaceTempFunction(BpeTokens.name, BpeTokens.builder, "built-in")
  }
}
