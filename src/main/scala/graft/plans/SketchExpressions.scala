package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native (codegen'd) sketch kernels for the dedup operators.
  *
  * Both take an already-hashed token/shingle array (`array<bigint>`, built
  * with the codegen'd `transform(…, xxhash64)`) and fuse the whole sketch
  * into one pass over that array — no explode, no shuffle, no wide
  * multi-accumulator aggregate. Signature computation becomes a pure
  * map-side expression: embarrassingly parallel per document, which beats
  * both the 32-lane HOF tree (re-traverses the array per lane) and the
  * explode → hash-aggregate formulation (shuffles |doc|·|shingles| rows)
  * that [[graft.operators.Dedup]] uses as its registration-free fallback.
  *
  * Hash parity: lane j of the MinHash signature is exactly
  * `min(xxhash64(h, j))` — the same `XXH64.hashLong(h, 42)` then
  * `hashInt(j, ·)` fold Spark's `xxhash64(h, lit(j))` performs — so native
  * and fallback paths produce bit-identical sketches (asserted in
  * PlansSpec).
  *
  * Reference anchor: none (the reference has no text ops); these serve the
  * BASELINE.json north star (near-dup detection at 100 TB).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> and a positive lane count, got " +
        s"${child.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = MinHashSignature.name

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var e = 0
    while (e < n) {
      val base = XXH64.hashLong(hs.getLong(e), 42L)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashInt(j, base)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val e = ctx.freshName("e")
      val j = ctx.freshName("j"); val mins = ctx.freshName("mins")
      val base = ctx.freshName("base"); val v = ctx.freshName("v")
      s"""
        int $n = $arr.numElements();
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $e = 0; $e < $n; $e++) {
          long $base = $xxh.hashLong($arr.getLong($e), 42L);
          for (int $j = 0; $j < $numHashes; $j++) {
            long $v = $xxh.hashInt($j, $base);
            if ($v < $mins[$j]) $mins[$j] = $v;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val name = "graft_minhash"
  val info = new ExpressionInfo(classOf[MinHashSignature].getName, name)

  /** graft_minhash(shingleHashes array<bigint>, numHashes literal int). */
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"$name expects 2 arguments")
    val n = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$name: numHashes must be an integer literal, got $other")
    }
    MinHashSignature(children.head, n)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

/** 64-bit SimHash from token hashes: per-bit ±1 votes in one pass, bit set
  * where votes are strictly positive — identical to the explode → 64
  * conditional sums formulation in [[graft.operators.Dedup.simHashPairs]]. */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${child.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = SimHash.name

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var e = 0
    while (e < n) {
      val h = hs.getLong(e)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      e += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val e = ctx.freshName("e")
      val b = ctx.freshName("b"); val votes = ctx.freshName("votes")
      val h = ctx.freshName("h"); val sim = ctx.freshName("sim")
      s"""
        int $n = $arr.numElements();
        int[] $votes = new int[64];
        for (int $e = 0; $e < $n; $e++) {
          long $h = $arr.getLong($e);
          for (int $b = 0; $b < 64; $b++) {
            if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
          }
        }
        long $sim = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($votes[$b] > 0) $sim |= (1L << $b);
        }
        ${ev.value} = $sim;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  val name = "graft_simhash"
  val info = new ExpressionInfo(classOf[SimHash].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$name expects 1 argument")
    SimHash(children.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

/** Random-hyperplane LSH signature over an `array<float>` embedding:
  * `nBits` sign bits of plane·vec dot products packed into a long, planes
  * from [[graft.functions.VectorFunctions.hashToUnit]]. One fused loop
  * replacing the O(nBits·dim) HOF tree; accumulation order matches the
  * HOF `aggregate` fold exactly, so signatures are bit-identical
  * (PlansSpec). */
case class HyperplaneSignature(child: Expression, nBits: Int, dim: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _)
      if nBits > 0 && nBits <= 63 && dim > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> and 0 < nBits <= 63, got " +
        s"${child.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = HyperplaneSignature.name
  // null for length-mismatched vectors (see nullSafeEval), not just null input
  override def nullable: Boolean = true

  // flattened plane matrix, row-major [bit][component]
  @transient private lazy val planes: Array[Double] = {
    val a = new Array[Double](nBits * dim)
    var i = 0
    while (i < nBits) {
      var j = 0
      while (j < dim) {
        a(i * dim + j) = graft.functions.VectorFunctions.hashToUnit(seed, i, j)
        j += 1
      }
      i += 1
    }
    a
  }

  // A vector whose length != dim yields NULL (not a truncated/padded
  // signature): silent truncation here and null-poisoned zip_with in the
  // HOF fallback would bucket the same malformed row differently, breaking
  // the bit-parity contract (PlansSpec). Both paths now agree on null.
  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var d = 0.0
      var j = 0
      while (j < dim) { d += planes(i * dim + j) * v.getFloat(j).toDouble; j += 1 }
      if (d >= 0.0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the plane matrix once per task via a codegen object reference
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val sig = ctx.freshName("sig")
      s"""
        if ($arr.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          long $sig = 0L;
          for (int $i = 0; $i < $nBits; $i++) {
            double $d = 0.0;
            for (int $j = 0; $j < $dim; $j++) {
              $d += $planesRef[$i * $dim + $j] * (double) $arr.getFloat($j);
            }
            if ($d >= 0.0) $sig |= (1L << $i);
          }
          ${ev.value} = $sig;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  val name = "graft_hyperplane"
  val info = new ExpressionInfo(classOf[HyperplaneSignature].getName, name)

  /** graft_hyperplane(vec array<float>, nBits lit, dim lit[, seed lit]). */
  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 3 || children.length == 4,
      s"$name expects 3 or 4 arguments")
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$name: $what must be an integer literal, got $other")
    }
    val seed = if (children.length == 4) children(3) match {
      case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"$name: seed must be an integer literal, got $other")
    } else 42L
    HyperplaneSignature(children.head,
      intLit(children(1), "nBits"), intLit(children(2), "dim"), seed)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
