package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — Spark has no
  * built-in normalizer, and corpus text arrives in mixed composed /
  * decomposed forms (the same visible `é` as one codepoint or as
  * `e` + U+0301), which silently splits exact-dedup fingerprints,
  * shingle sets, and token counts for byte-identical-looking text.
  * Canonical composition (java.text.Normalizer NFC) makes every
  * downstream hash see one form. Fast path: `Normalizer.isNormalized`
  * is O(n) with no allocation and almost always true for real corpora,
  * so the common case pays one scan and returns the input UNCHANGED
  * (same UTF8String, zero copies). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${dt.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = NfcNormalize.name

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val name = "graft_nfc"

  /** Static kernel shared by eval and codegen. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[NfcNormalize].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    NfcNormalize(children.head)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
