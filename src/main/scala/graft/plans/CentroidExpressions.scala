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
