package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType}

/** Pack symmetric-int8 quantization codes (array<int>, each in
  * [-128, 127] — [[graft.functions.VectorFunctions.int8Quantize]]'s
  * output) into one signed byte per dimension: the STORED form of an
  * SQ8-quantized embedding column. dim floats (4·dim bytes) become dim
  * bytes — a 4× scan-byte reduction with near-exact ranking fidelity,
  * the FAISS `SQ8` storage trade (PQ compresses 32×, but its ranking is
  * codebook-approximate; SQ8 is the high-fidelity middle rung).
  * Out-of-range codes yield NULL (malformed input, not silent wrap). */
case class Sq8Pack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int>, got ${dt.catalogString}")
  }

  // malformed input (length/range mismatch) yields NULL even when the
  // child is non-nullable — without this override nullSafeCodeGen pins
  // ev.isNull to the FalseLiteral constant and the generated
  // `isNull = true` assignment is an ILLEGAL Java lvalue: janino fails
  // the whole stage (surfaced by a non-null array() input chain)
  override def nullable: Boolean = true

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sq8_pack"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = a.getInt(i)
      if (c < -128 || c > 127) return null
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        byte[] $out = new byte[$n];
        for (int $i = 0; $i < $n; $i++) {
          int $c = $a.getInt($i);
          if ($c < -128 || $c > 127) { ${ev.isNull} = true; break; }
          $out[$i] = (byte) $c;
        }
        if (!${ev.isNull}) { ${ev.value} = $out; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Sq8Pack =
    copy(child = newChild)
}

/** Cosine between a PACKED SQ8 code vector (binary, signed bytes) and a
  * float query vector, fused in one codegen'd loop — the asymmetric
  * scoring kernel of SQ8 ANN search. With per-vector SYMMETRIC
  * quantization (code = round(x·127/scale)) the scale factor cancels in
  * the cosine, so the stored codes rank WITHOUT carrying the scale:
  * cos(x̂, q) = Σc·q / (‖c‖·‖q‖). Length mismatch yields NULL (the
  * malformed-row discipline of [[CentroidExpressions]]); a zero-norm
  * side yields 0.0, matching [[CosineSimilarity]] exactly. */
case class Sq8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def floats(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (left.dataType == BinaryType && floats(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary, array<float>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // malformed input (length/range mismatch) yields NULL even when the
  // child is non-nullable — without this override nullSafeCodeGen pins
  // ev.isNull to the FalseLiteral constant and the generated
  // `isNull = true` assignment is an ILLEGAL Java lvalue: janino fails
  // the whole stage (surfaced by a non-null array() input chain)
  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType
  override def prettyName: String = Sq8Cosine.name

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val q = b.asInstanceOf[ArrayData]
    if (codes.length != q.numElements()) return null
    var dot = 0.0; var nc = 0.0; var nq = 0.0
    var i = 0
    while (i < codes.length) {
      val c = codes(i).toDouble
      val x = q.getFloat(i).toDouble
      dot += c * x; nc += c * c; nq += x * x
      i += 1
    }
    val denom = math.sqrt(nc) * math.sqrt(nq)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nc = ctx.freshName("nc")
      val nq = ctx.freshName("nq")
      val denom = ctx.freshName("denom")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      s"""
        if ($l.length != $r.numElements()) { ${ev.isNull} = true; }
        else {
          double $dot = 0.0; double $nc = 0.0; double $nq = 0.0;
          for (int $i = 0; $i < $l.length; $i++) {
            double $c = (double) $l[$i];
            double $x = (double) $r.getFloat($i);
            $dot += $c * $x; $nc += $c * $c; $nq += $x * $x;
          }
          double $denom = java.lang.Math.sqrt($nc) * java.lang.Math.sqrt($nq);
          ${ev.value} = ($denom == 0.0) ? 0.0 : ($dot / $denom);
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Cosine =
    copy(left = newLeft, right = newRight)
}

object Sq8Cosine {
  val name = "graft_sq8_cosine"

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[Sq8Cosine].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"$name expects 2 arguments")
    Sq8Cosine(children.head, children(1))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

/** FUSED SQ8 encode: array<float> → packed signed-byte codes in ONE
  * codegen'd pass — scale = max|x|, code = floor(x·127/scale + 0.5)
  * (the exact [[graft.functions.VectorFunctions.int8Quantize]] op
  * order, so the fused path is bit-identical to the HOF chain). The
  * HOF formulation (aggregate for the scale + transform to quantize +
  * pack) is interpreted AND re-evaluates the scale aggregate PER
  * ELEMENT when referenced inside the lambda — O(dim²) per row; this
  * kernel made the 40M-vector encode 40× cheaper (BENCH_COLD). A
  * zero vector encodes to all-zero codes, matching the HOF's
  * scale==0 branch. A vector containing NaN yields NULL codes — the
  * malformed-input discipline ([[Sq8Pack]]): the HOF chain's
  * `greatest` treats NaN as the maximum, so its scale goes NaN and the
  * ANSI int cast THROWS; a plain `x > scale` compare here is false for
  * NaN and would silently emit a finite scale and garbage codes
  * instead. Null, never garbage, never a whole-job abort. */
case class Sq8Encode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${dt.catalogString}")
  }

  // NaN input yields NULL even under a non-nullable child — the
  // ImageDHash janino lvalue discipline (nullSafeCodeGen would
  // otherwise pin ev.isNull to the FalseLiteral constant)
  override def nullable: Boolean = true

  override def dataType: DataType = BinaryType
  override def prettyName: String = Sq8Encode.name

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(a.getFloat(i).toDouble)
      // NaN propagates (x > scale is false for NaN — the silent-garbage
      // path this guard exists to close)
      if (x > scale || java.lang.Double.isNaN(x)) scale = x
      i += 1
    }
    if (java.lang.Double.isNaN(scale)) return null
    val out = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(
          a.getFloat(i).toDouble * 127.0 / scale + 0.5).toInt.toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        double $scale = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = java.lang.Math.abs((double) $a.getFloat($i));
          if ($x > $scale || java.lang.Double.isNaN($x)) $scale = $x;
        }
        if (java.lang.Double.isNaN($scale)) { ${ev.isNull} = true; }
        else {
          byte[] $out = new byte[$n];
          if ($scale != 0.0) {
            for (int $i = 0; $i < $n; $i++) {
              $out[$i] = (byte) (int) java.lang.Math.floor(
                (double) $a.getFloat($i) * 127.0 / $scale + 0.5);
            }
          }
          ${ev.value} = $out;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

object Sq8Encode {
  val name = "graft_sq8_encode"

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[Sq8Encode].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    Sq8Encode(children.head)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
