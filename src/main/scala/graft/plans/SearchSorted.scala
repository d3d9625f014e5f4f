package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Count of `bounds` entries ≤ the input value — the bucket index of a
  * row among strictly-increasing run boundaries, as ONE binary search
  * inside whole-stage codegen.
  *
  * This is the merge writer's output-partition router
  * (`MutableParquetTable.writeRun`): each rewritten row lands in the
  * dirty file whose key interval owns it. The HOF formulation
  * (`size(filter(boundsLit, b => nk >= b))`) evaluates an INTERPRETED
  * lambda per boundary per row — O(dirtyFiles) comparisons per row,
  * which at a 128-file full rewrite is ~127 interpreted predicate calls
  * per row on every row of the table. Here it is O(log n) compares in
  * a tight Java loop; the boundary array rides the codegen references
  * (one object per task, never per row). The HOF form remains the
  * fallback for string/binary key domains.
  *
  * Semantics match the HOF count exactly for the strictly-increasing
  * boundary arrays the caller builds: `Arrays.binarySearch` hit at i
  * means value == bounds(i) ⇒ i+1 boundaries are ≤ value; a miss
  * returns the insertion point, which IS the count of smaller bounds. */
case class SearchSortedLong(child: Expression, bounds: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT (normalized key), got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_search_sorted"

  // the plan string must stay bounded in the boundary count
  override def toString: String = s"$prettyName($child, n=${bounds.length})"

  override protected def nullSafeEval(input: Any): Any = {
    val idx = java.util.Arrays.binarySearch(bounds, input.asInstanceOf[Long])
    if (idx >= 0) idx + 1 else -(idx + 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("graftBounds", bounds, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val idx = ctx.freshName("idx")
      s"""
        int $idx = java.util.Arrays.binarySearch($arr, $v);
        ${ev.value} = ($idx >= 0) ? $idx + 1 : -($idx + 1);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SearchSortedLong =
    copy(child = newChild)
}
