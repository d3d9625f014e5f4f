package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual image hashes over a DECODED grayscale thumbnail raster —
  * the dedup fingerprints for multimodal (image) columns. The raster
  * contract is [[graft.multimodal.Multimodal.grayRasters]]'s output:
  * row-major unsigned luma bytes on a 9-column × 8-row grid (72 bytes),
  * area-averaged from the source image so the hash is stable under
  * resize and re-encode. Splitting decode (a batched narrow map — codec
  * work, executor-side) from hashing (a codegen'd expression over a
  * fixed 72-byte buffer) keeps the hash inside whole-stage codegen and
  * makes it reusable over any raster source (resized copies, sampled
  * video frames).
  *
  * Both hashes are 64-bit longs, compared by Hamming distance
  * ([[graft.operators.Dedup.hammingPairs]] reuses the SimHash
  * chunk-banding machinery). A raster of the wrong length yields NULL
  * (malformed input, the [[Sq8Pack]] discipline).
  */
object ImageHash {
  /** Raster grid contract shared with `Multimodal.grayRasters`. */
  val GridW = 9
  val GridH = 8
  val RasterLen: Int = GridW * GridH
}

/** dHash (difference hash): bit (y·8+x) is set when the pixel to the
  * RIGHT is brighter — 8 comparisons per row across the 9-column grid.
  * Gradient signs survive global brightness/contrast shifts exactly
  * (adding a constant to every pixel preserves every order relation up
  * to clamping), which is what makes dHash the default re-encode /
  * brightness-robust image fingerprint. */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${dt.catalogString}")
  }

  // malformed input (length/range mismatch) yields NULL even when the
  // child is non-nullable — without this override nullSafeCodeGen pins
  // ev.isNull to the FalseLiteral constant and the generated
  // `isNull = true` assignment is an ILLEGAL Java lvalue: janino fails
  // the whole stage (surfaced by a non-null array() input chain)
  override def nullable: Boolean = true

  override def dataType: DataType = LongType
  override def prettyName: String = ImageDHash.name

  override protected def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[Array[Byte]]
    if (r.length != ImageHash.RasterLen) return null
    var h = 0L
    var y = 0
    while (y < ImageHash.GridH) {
      var x = 0
      while (x < ImageHash.GridH) { // 8 comparisons per 9-px row
        if ((r(y * ImageHash.GridW + x + 1) & 0xFF) >
            (r(y * ImageHash.GridW + x) & 0xFF))
          h |= 1L << (y * ImageHash.GridH + x)
        x += 1
      }
      y += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, r => {
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        if ($r.length != ${ImageHash.RasterLen}) { ${ev.isNull} = true; }
        else {
          long $h = 0L;
          for (int $y = 0; $y < ${ImageHash.GridH}; $y++) {
            for (int $x = 0; $x < ${ImageHash.GridH}; $x++) {
              if (($r[$y * ${ImageHash.GridW} + $x + 1] & 0xFF) >
                  ($r[$y * ${ImageHash.GridW} + $x] & 0xFF))
                $h |= 1L << ($y * ${ImageHash.GridH} + $x);
            }
          }
          ${ev.value} = $h;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ImageDHash =
    copy(child = newChild)
}

object ImageDHash {
  val name = "graft_image_dhash"

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[ImageDHash].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    ImageDHash(children.head)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

/** aHash (average hash): over the LEFT 8×8 of the raster, bit (y·8+x)
  * is set when the pixel is brighter than the block mean. The
  * mean-threshold form is the resize-invariance workhorse (area
  * averages commute with further averaging); the compare is kept
  * integral — px·64 > Σpx — so no division rounds the boundary. */
case class ImageAHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${dt.catalogString}")
  }

  // malformed input (length/range mismatch) yields NULL even when the
  // child is non-nullable — without this override nullSafeCodeGen pins
  // ev.isNull to the FalseLiteral constant and the generated
  // `isNull = true` assignment is an ILLEGAL Java lvalue: janino fails
  // the whole stage (surfaced by a non-null array() input chain)
  override def nullable: Boolean = true

  override def dataType: DataType = LongType
  override def prettyName: String = ImageAHash.name

  override protected def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[Array[Byte]]
    if (r.length != ImageHash.RasterLen) return null
    var total = 0L
    var y = 0
    while (y < ImageHash.GridH) {
      var x = 0
      while (x < ImageHash.GridH) {
        total += (r(y * ImageHash.GridW + x) & 0xFF).toLong
        x += 1
      }
      y += 1
    }
    var h = 0L
    y = 0
    while (y < ImageHash.GridH) {
      var x = 0
      while (x < ImageHash.GridH) {
        if ((r(y * ImageHash.GridW + x) & 0xFF).toLong * 64L > total)
          h |= 1L << (y * ImageHash.GridH + x)
        x += 1
      }
      y += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, r => {
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val total = ctx.freshName("total")
      s"""
        if ($r.length != ${ImageHash.RasterLen}) { ${ev.isNull} = true; }
        else {
          long $total = 0L;
          for (int $y = 0; $y < ${ImageHash.GridH}; $y++) {
            for (int $x = 0; $x < ${ImageHash.GridH}; $x++) {
              $total += (long) ($r[$y * ${ImageHash.GridW} + $x] & 0xFF);
            }
          }
          long $h = 0L;
          for (int $y = 0; $y < ${ImageHash.GridH}; $y++) {
            for (int $x = 0; $x < ${ImageHash.GridH}; $x++) {
              if (((long) ($r[$y * ${ImageHash.GridW} + $x] & 0xFF)) * 64L > $total)
                $h |= 1L << ($y * ${ImageHash.GridH} + $x);
            }
          }
          ${ev.value} = $h;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ImageAHash =
    copy(child = newChild)
}

object ImageAHash {
  val name = "graft_image_ahash"

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[ImageAHash].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    ImageAHash(children.head)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
