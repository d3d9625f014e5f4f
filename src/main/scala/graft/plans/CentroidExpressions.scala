package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Nearest-centroid assignment against a BROADCAST codebook — the IVF /
  * SemDeDup coarse quantizer as one codegen'd expression.
  *
  * Why not a `typedLit` codebook (the original formulation): a literal
  * array of k centroid structs lives in the EXPRESSION TREE, so plan
  * construction, canonicalization, string rendering, and serialization
  * all scale with k·dim — fine at the fixture's k=16, a planner DoS at
  * the k≈10⁴–10⁶ a web-scale corpus needs. Here the plan carries only a
  * [[Broadcast]] HANDLE (constant size at any k); the flattened
  * centroid matrix ships to each executor once via the broadcast
  * machinery and is resolved lazily in codegen init / interpreted eval.
  * The per-row fold is a fused float loop instead of an interpreted HOF
  * lambda over struct literals.
  *
  * Semantics match the HOF fold it replaces exactly (q45/q96 oracle
  * hashes are the regression net): distances compared SQUARED (sqrt is
  * monotone), centroids iterated in codebook order with strict `<`, so
  * equal-distance ties resolve to the first (lowest-cid) centroid; with
  * `take = 2` the runner-up slot fills under the same rule. A vector
  * whose length differs from `dim` yields NULL (malformed rows drop out
  * of the cell join rather than landing in a garbage cell).
  *
  * Reference anchor: none (the reference has no vector ops); this serves
  * the BASELINE.json north star (similarity search at 100 TB).
  *
  * `codebook` broadcasts `(cids, flat)` where `flat(i*dim + j)` is
  * component j of centroid i and `cids(i)` its id. */
case class NearestCentroids(child: Expression,
                            codebook: Broadcast[(Array[Long], Array[Float])],
                            dim: Int, take: Int)
    extends UnaryExpression {

  require(take == 1 || take == 2, "take must be 1 or 2")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if dim > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> and a positive dim, got " +
        s"${child.dataType.catalogString}")
  }

  override def dataType: DataType =
    if (take == 1) LongType else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroids"

  // the plan string must stay k-independent — the whole point
  override def toString: String =
    s"$prettyName($child, bc=${codebook.id}, dim=$dim, take=$take)"

  @transient private lazy val cents: (Array[Long], Array[Float]) =
    codebook.value

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val (cids, flat) = cents
    val k = cids.length
    var d1 = Double.MaxValue; var c1 = Long.MaxValue
    var d2 = Double.MaxValue; var c2 = Long.MaxValue
    var i = 0
    while (i < k) {
      var d = 0.0
      var j = 0
      while (j < dim) {
        val diff = flat(i * dim + j).toDouble - v.getFloat(j).toDouble
        d += diff * diff
        j += 1
      }
      if (d < d1) { d2 = d1; c2 = c1; d1 = d; c1 = cids(i) }
      else if (d < d2) { d2 = d; c2 = cids(i) }
      i += 1
    }
    if (take == 1) c1 else new GenericArrayData(Array(c1, c2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the HANDLE in the codegen references; materialize the arrays
    // once per task in init, not per row
    val bcRef = ctx.addReferenceObj("codebook", codebook,
      "org.apache.spark.broadcast.Broadcast")
    val cidsVar = ctx.addMutableState("long[]", "graftCentCids")
    val tup = ctx.freshName("graftCentTup")
    val flatVar = ctx.addMutableState("float[]", "graftCentFlat",
      v => s"""
        scala.Tuple2 $tup = (scala.Tuple2) $bcRef.value();
        $cidsVar = (long[]) $tup._1();
        $v = (float[]) $tup._2();
      """)
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val d1 = ctx.freshName("d1"); val c1 = ctx.freshName("c1")
      val d2 = ctx.freshName("d2"); val c2 = ctx.freshName("c2")
      val k = ctx.freshName("k")
      val result =
        if (take == 1) s"${ev.value} = $c1;"
        else s"${ev.value} = new org.apache.spark.sql.catalyst.util." +
          s"GenericArrayData(new long[] { $c1, $c2 });"
      s"""
        if ($arr.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          int $k = $cidsVar.length;
          double $d1 = Double.MAX_VALUE; long $c1 = Long.MAX_VALUE;
          double $d2 = Double.MAX_VALUE; long $c2 = Long.MAX_VALUE;
          for (int $i = 0; $i < $k; $i++) {
            double $d = 0.0;
            for (int $j = 0; $j < $dim; $j++) {
              double $diff = (double) $flatVar[$i * $dim + $j]
                - (double) $arr.getFloat($j);
              $d += $diff * $diff;
            }
            if ($d < $d1) { $d2 = $d1; $c2 = $c1; $d1 = $d; $c1 = $cidsVar[$i]; }
            else if ($d < $d2) { $d2 = $d; $c2 = $cidsVar[$i]; }
          }
          $result
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** PQ asymmetric-distance score as ONE fused codegen'd loop:
  * `graft_pq_adc(codes, ip, cn, qn)` where `codes` are a row's m PQ cell
  * ids, `ip`/`cn` the query's flattened lookup tables (⟨query-slice,
  * centroid⟩ inner products and centroid squared norms, laid out
  * `[subspace × cells]`), and `qn` the query's vector norm. Returns the
  * approximate cosine `Σ ip[j·k+code_j] / (qn · sqrt(Σ cn[j·k+code_j]))`.
  *
  * The HOF formulation (`aggregate(zip_with(element_at ...))`) evaluates
  * INTERPRETED lambdas per element per pair — measured 4.7× slower than
  * even the exact native cosine at bench scale, inverting the whole
  * point of scanning compressed codes. This expression is the same m
  * lookups as a tight Java loop inside whole-stage codegen. Cells per
  * subspace (`k`) is derived as `ip.length / codes.length`; a row whose
  * tables don't divide evenly yields NULL (malformed input drops out
  * rather than scoring garbage). */
case class PqAdcScore(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  private def packedCodes: Boolean =
    first.dataType == org.apache.spark.sql.types.BinaryType

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType, et: DataType): Boolean = dt match {
      case ArrayType(`et`, _) => true
      case _ => false
    }
    val codesOk = arr(first.dataType, LongType) || packedCodes
    if (codesOk &&
        arr(second.dataType, org.apache.spark.sql.types.DoubleType) &&
        arr(third.dataType, org.apache.spark.sql.types.DoubleType) &&
        fourth.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint> | binary, array<double>, " +
        s"array<double>, double), got " +
        children.map(_.dataType.catalogString).mkString(", "))
  }

  // malformed input (length/range mismatch) yields NULL even when the
  // child is non-nullable — without this override nullSafeCodeGen pins
  // ev.isNull to the FalseLiteral constant and the generated
  // `isNull = true` assignment is an ILLEGAL Java lvalue: janino fails
  // the whole stage (surfaced by a non-null array() input chain)
  override def nullable: Boolean = true

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(c: Any, i: Any, n: Any, q: Any): Any = {
    val ip = i.asInstanceOf[ArrayData]
    val cn = n.asInstanceOf[ArrayData]
    val qn = q.asInstanceOf[Double]
    val m =
      if (packedCodes) c.asInstanceOf[Array[Byte]].length
      else c.asInstanceOf[ArrayData].numElements()
    if (m == 0 || ip.numElements() % m != 0 ||
        cn.numElements() != ip.numElements()) return null
    val k = ip.numElements() / m
    var num = 0.0; var den = 0.0
    var j = 0
    while (j < m) {
      val code =
        if (packedCodes) c.asInstanceOf[Array[Byte]](j) & 0xFF
        else c.asInstanceOf[ArrayData].getLong(j).toInt
      val idx = j * k + code
      num += ip.getDouble(idx); den += cn.getDouble(idx)
      j += 1
    }
    val denom = qn * math.sqrt(den)
    if (denom == 0.0) 0.0 else num / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, i, n, q) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val num = ctx.freshName("num")
      val den = ctx.freshName("den")
      val denom = ctx.freshName("denom")
      val mExpr = if (packedCodes) s"$c.length" else s"$c.numElements()"
      val codeExpr =
        if (packedCodes) s"($c[$j] & 0xFF)" else s"(int) $c.getLong($j)"
      s"""
        int $m = $mExpr;
        if ($m == 0 || $i.numElements() % $m != 0 ||
            $n.numElements() != $i.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $k = $i.numElements() / $m;
          double $num = 0.0; double $den = 0.0;
          for (int $j = 0; $j < $m; $j++) {
            int $idx = $j * $k + $codeExpr;
            $num += $i.getDouble($idx); $den += $n.getDouble($idx);
          }
          double $denom = $q * java.lang.Math.sqrt($den);
          ${ev.value} = ($denom == 0.0) ? 0.0 : ($num / $denom);
        }
      """
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, o: Expression): PqAdcScore =
    copy(first = f, second = s, third = t, fourth = o)
}

/** Pack PQ cell ids (`array<bigint>`, every value in [0,255]) into one
  * BYTE each — the persisted form of an encoded corpus: m bytes per
  * vector instead of an ~(16 + 8·m)-byte long array, and exactly the
  * compressed row the ADC kernel scans. A code outside byte range
  * (ksub > 256 codebooks) yields NULL rather than silent truncation. */
case class PqPackCodes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${dt.catalogString}")
  }

  // malformed input (length/range mismatch) yields NULL even when the
  // child is non-nullable — without this override nullSafeCodeGen pins
  // ev.isNull to the FalseLiteral constant and the generated
  // `isNull = true` assignment is an ILLEGAL Java lvalue: janino fails
  // the whole stage (surfaced by a non-null array() input chain)
  override def nullable: Boolean = true

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_pq_pack"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = a.getLong(i)
      if (c < 0L || c > 255L) return null
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
      val bad = ctx.freshName("bad")
      s"""
        int $n = $a.numElements();
        byte[] $out = new byte[$n];
        boolean $bad = false;
        for (int $i = 0; $i < $n && !$bad; $i++) {
          long $c = $a.getLong($i);
          if ($c < 0L || $c > 255L) $bad = true;
          else $out[$i] = (byte) $c;
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PqPackCodes =
    copy(child = newChild)
}

object PqAdcScore {
  val name = "graft_pq_adc"

  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[PqAdcScore].getName, name)

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 4, s"$name expects 4 arguments")
    PqAdcScore(children(0), children(1), children(2), children(3))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
