package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native (codegen'd) cosine similarity over two `array<float>` columns.
  *
  * The HOF formulation (`aggregate(zip_with(...))`,
  * [[graft.functions.VectorFunctions.cosine]]) allocates an intermediate
  * array per row-pair and evaluates three lambda chains. This expression is
  * the SURVEY §7.4 escalation: one fused loop, no allocation, inside
  * whole-stage codegen — the hot inner loop of brute-force/LSH top-k where
  * the pair count is corpus × queries.
  *
  * Reference anchor: the reference has no vector ops; this serves the
  * BASELINE.json north star (similarity search at 100 TB scale).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($l.numElements(), $r.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double x = (double) $l.getFloat($i);
          double y = (double) $r.getFloat($i);
          $dot += x * y; $nx += x * x; $ny += y * y;
        }
        double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        ${ev.value} = ($denom == 0.0) ? 0.0 : ($dot / $denom);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val name = "graft_cosine"

  val info = new ExpressionInfo(classOf[CosineSimilarity].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"$name expects 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  /** Runtime registration for externally built sessions. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

/** Engine extensions entry point: register the engine's native functions
  * at session build time via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier(CosineSimilarity.name), CosineSimilarity.info,
        CosineSimilarity.builder))
    ext.injectFunction(
      (FunctionIdentifier(MinHashSignature.name), MinHashSignature.info,
        MinHashSignature.builder))
    ext.injectFunction(
      (FunctionIdentifier(SimHash.name), SimHash.info, SimHash.builder))
    ext.injectFunction(
      (FunctionIdentifier(HyperplaneSignature.name), HyperplaneSignature.info,
        HyperplaneSignature.builder))
    ext.injectFunction(
      (FunctionIdentifier(PqAdcScore.name), PqAdcScore.info,
        PqAdcScore.builder))
    ext.injectFunction(
      (FunctionIdentifier(Sq8Cosine.name), Sq8Cosine.info,
        Sq8Cosine.builder))
    ext.injectFunction(
      (FunctionIdentifier(NfcNormalize.name), NfcNormalize.info,
        NfcNormalize.builder))
    // SQL DML (MERGE INTO / DELETE / UPDATE) on graft tables: post-hoc so
    // the statements arrive fully resolved (star actions expanded, all
    // expressions bound) before being compiled onto the CoW merge
    ext.injectPostHocResolutionRule(_ => GraftDmlRule)
    // AFTER the DML rule: a tombstoned DML target fails fast there; read
    // relations then gain the tombstone anti-join
    ext.injectPostHocResolutionRule(_ => GraftTombstoneRule)
  }
}
