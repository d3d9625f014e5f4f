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

  /** The pHash raster contract: the classic 32×32 grid (1024 bytes,
    * python-imagehash's default) from the same decode pass. pHash
    * thresholds the DCT's top-left 8×8 block, and those coefficients
    * are only meaningfully LOW-frequency when the transform runs over a
    * grid much coarser than the kept block — on the 9×8 dedup raster
    * the "low 8×8" spans the full band and smooth images flip ~25 bits
    * under a 10% crop (measured); at 16×16 crop and cross-scene
    * distance bands still overlap (measured: crop <= 14, cross >= 10);
    * at 32×32 the kept block is the bottom 1/16 of the spectrum and
    * the bands separate. */
  val PGrid = 32
  val PRasterLen: Int = PGrid * PGrid
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

/** pHash (DCT perceptual hash): 2-D DCT-II over the 16×16 pHash raster
  * ([[ImageHash.PGrid]] — the second output of `grayRasters`' decode
  * pass), keep the top-left 8×8 LOW-FREQUENCY coefficient block, set
  * bit (v·8+u) when the coefficient exceeds the block's lower median
  * (the python-imagehash convention, DC included). Low-frequency energy
  * describes the image's large-scale structure, which survives mild
  * CROPS and rescales that flip dHash's pixel-adjacent gradient signs —
  * the reason public dedup stacks carry pHash next to dHash.
  *
  * All arithmetic is FIXED-POINT integer: the cosine tables are
  * pre-rounded longs (scale 2^14; DCT-II normalization at scale 32,
  * 32/√2 → 23), so the hash is bit-identical across platforms and libm
  * versions — no floating point anywhere. Magnitudes: 255·16·2^14 per
  * row fold, ×16·2^14 ≈ 2^44, /2^14 ×2^10 ≈ 2^40 — no overflow.
  * Median = 32nd smallest of the 64 coefficients (lower median;
  * strictly-greater sets the bit), so no fractional average rounds the
  * boundary. */
case class ImagePHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${dt.catalogString}")
  }

  // malformed input yields NULL even under a non-nullable child — the
  // ImageDHash janino lvalue discipline
  override def nullable: Boolean = true

  override def dataType: DataType = LongType
  override def prettyName: String = ImagePHash.name

  override protected def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[Array[Byte]]
    if (r.length != ImageHash.PRasterLen) return null
    ImagePHash.hash(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, r => {
      val obj = ctx.addReferenceObj("phash", ImagePHash,
        ImagePHash.getClass.getName.stripSuffix("$") + "$")
      s"""
        if ($r.length != ${ImageHash.PRasterLen}) { ${ev.isNull} = true; }
        else { ${ev.value} = $obj.hash($r); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ImagePHash =
    copy(child = newChild)
}

object ImagePHash {
  val name = "graft_image_phash"

  private val N = ImageHash.PGrid // 16

  /** cos((2x+1)·u·π / (2N)) at fixed-point scale 2^14, x,u in [0,N). */
  private val cosT: Array[Long] = Array.tabulate(N * N) { i =>
    val x = i / N; val u = i % N
    math.round(math.cos((2 * x + 1) * u * math.Pi / (2 * N)) * 16384.0)
  }
  /** DCT-II normalization at scale 32 (1/√2 → 23 for the DC basis). */
  private val norm: Array[Long] = Array.tabulate(8)(u =>
    if (u == 0) 23L else 32L)

  /** The shared interpreted/codegen kernel (codegen calls it via an
    * addReferenceObj handle — the table lookups dominate; one virtual
    * call per row is noise next to 16k multiply-adds). */
  def hash(r: Array[Byte]): Long = {
    val coeff = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0L
        var y = 0
        while (y < N) {
          var rowAcc = 0L
          var x = 0
          while (x < N) {
            rowAcc += (r(y * N + x) & 0xFF).toLong * cosT(x * N + u)
            x += 1
          }
          acc += rowAcc * cosT(y * N + v)
          y += 1
        }
        coeff(v * 8 + u) = acc / 16384L * norm(u) * norm(v)
        u += 1
      }
      v += 1
    }
    val sorted = java.util.Arrays.copyOf(coeff, 64)
    java.util.Arrays.sort(sorted)
    val median = sorted(31)
    var h = 0L
    var i = 0
    while (i < 64) {
      if (coeff(i) > median) h |= 1L << i
      i += 1
    }
    h
  }

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[ImagePHash].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    ImagePHash(children.head)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
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
