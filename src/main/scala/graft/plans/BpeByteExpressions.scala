package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BpeByte

/** BYTE-LEVEL BPE tokenization as codegen'd expressions over the
  * committed byte merges table ([[graft.functions.BpeByte.default]]) —
  * the `tokenizer = "bpe-byte"` surface: GPT-2-class regex
  * pretokenization + byte alphabet + the standard encoder. Same
  * one-static-kernel discipline as [[BpeExpressions]] so both stay
  * inside whole-stage codegen; the per-word cache in [[graft.functions
  * .BpeTable]] amortizes repeated pretokens. */
case class BpeByteTokenCount(child: Expression) extends BpeStringExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = BpeByteTokenCount.name

  override protected def nullSafeEval(input: Any): Any =
    BpeByteTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeByteTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeByteTokenCount =
    copy(child = newChild)
}

object BpeByteTokenCount {
  val name = "graft_bpe_byte_count"

  def count(s: UTF8String): Long =
    BpeByte.tokenCount(BpeByte.default, s.toString)

  val info = new ExpressionInfo(classOf[BpeByteTokenCount].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    BpeByteTokenCount(children.head)
  }
}

/** Standalone-word byte-level cost — the `tokenizer = "bpe-byte"`
  * per-word dispatch target of word-budgeted chunkers. */
case class BpeByteWordCost(child: Expression) extends BpeStringExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = BpeByteWordCost.name

  override protected def nullSafeEval(input: Any): Any =
    BpeByteWordCost.cost(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeByteWordCost.cost($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeByteWordCost =
    copy(child = newChild)
}

object BpeByteWordCost {
  val name = "graft_bpe_byte_word_cost"

  def cost(s: UTF8String): Long =
    BpeByte.wordCost(BpeByte.default, s.toString)

  val info = new ExpressionInfo(classOf[BpeByteWordCost].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    BpeByteWordCost(children.head)
  }
}

/** The byte-level pieces in byte-space symbol form ("Ġthe" for
  * " the") — a piece boundary may split a multi-byte UTF-8 char, so
  * decode applies to the concatenation ([[graft.functions.BpeByte
  * .fromByteSpace]]), which re-spells the document exactly (the spec's
  * round-trip lane). */
case class BpeByteTokens(child: Expression) extends BpeStringExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = BpeByteTokens.name

  override protected def nullSafeEval(input: Any): Any =
    BpeByteTokens.pieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeByteTokens.pieces($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeByteTokens =
    copy(child = newChild)
}

object BpeByteTokens {
  val name = "graft_bpe_byte_tokens"

  def pieces(s: UTF8String): GenericArrayData =
    new GenericArrayData(
      BpeByte.tokenize(BpeByte.default, s.toString)
        .map(UTF8String.fromString(_)))

  val info = new ExpressionInfo(classOf[BpeByteTokens].getName, name)
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    BpeByteTokens(children.head)
  }
}

object BpeByteExpressions {
  /** Register all three under their `graft_bpe_byte_*` names. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(BpeByteTokenCount.name, BpeByteTokenCount.builder, "built-in")
    reg.createOrReplaceTempFunction(BpeByteWordCost.name, BpeByteWordCost.builder, "built-in")
    reg.createOrReplaceTempFunction(BpeByteTokens.name, BpeByteTokens.builder, "built-in")
  }
}
