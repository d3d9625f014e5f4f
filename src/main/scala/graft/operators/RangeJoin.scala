package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join: pairs a table of points with a table of
  * `[lo, hi]` intervals on containment.
  *
  * Spark plans `p JOIN i ON p.x BETWEEN i.lo AND i.hi` as a broadcast
  * nested loop — O(|P| · |I|) comparisons, which dies when neither side is
  * tiny. This operator turns containment into an *equi*-join on a coarse
  * grid: every interval is exploded to the grid cells it covers, every
  * point belongs to exactly one cell, and a hash join on the cell id plus
  * the residual `BETWEEN` filter yields exactly the containment pairs
  * (each qualifying pair meets in precisely the point's cell — no dedup
  * pass needed).
  *
  * Cost: shuffle of |P| + Σ(interval width / bucketWidth) rows, then a
  * hash join per cell. `bucketWidth` trades replication (wide intervals
  * explode to many cells) against selectivity (huge cells approach the
  * nested loop). Pick it near the median interval width so the expected
  * replication factor is ~2. This is the standard spatial-grid trick
  * (1-D); the same composition handles temporal validity windows and the
  * zone-map routing of SURVEY §2a S7 when the file count outgrows a
  * broadcast.
  */
object RangeJoin {

  /** @param points    table with a numeric point column `pointCol`
    * @param intervals table with numeric `loCol`/`hiCol` (inclusive ends)
    * @param bucketWidth grid cell width in point units (> 0) */
  def bucketed(points: DataFrame, intervals: DataFrame,
               pointCol: String, loCol: String, hiCol: String,
               bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def cell(c: Column): Column = floor(c / bucketWidth).cast("long")
    val p = points.withColumn("__cell", cell(col(pointCol)))
    val i = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__cell",
        explode(sequence(cell(col(loCol)), cell(col(hiCol)))))
    p.join(i, Seq("__cell"))
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__cell")
  }
}
