package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered Parquet layout.
  *
  * The reference keeps ONE sort key per file and prunes row groups with
  * that key's min/max zone map (ParquetRewriter.java:239-251). A linear
  * sort gives tight stats on the sort key only: a filter on any other
  * column still reads every row group. Z-ordering interleaves the bits of
  * N normalized dimensions into a single sort value, so each row group
  * occupies a small hyper-rectangle of the dimension space and min/max
  * stats stay tight on EVERY dimension — multi-column zone-map pruning
  * from the same plain Parquet footers, no index structure needed.
  *
  * Scale shape: one pass to collect per-dimension bounds (a single tiny
  * agg row), one range shuffle on the z-value, and the z-value itself is
  * a codegen-friendly fixed tree of shift/mask/or terms — no UDF, no
  * driver-side loop over data. At 100 TB this is the standard layout
  * trick (Delta/Iceberg OPTIMIZE ZORDER BY) for dashboards that filter on
  * more than one dimension.
  */
object ZOrder {

  /** Bits kept per dimension. 2 dims × 21 bits = 42-bit z-values, well
    * inside a long with ANSI mode on. */
  val defaultBits = 16

  /** Min/max per dimension, one tiny driver row. */
  def bounds(df: DataFrame, dims: Seq[String]): Seq[(Long, Long)] = {
    val aggs = dims.flatMap(d =>
      Seq(min(col(d).cast("long")), max(col(d).cast("long"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    dims.indices.map(i => (r.getLong(2 * i), r.getLong(2 * i + 1)))
  }

  /** Normalize a column to [0, 2^bits) given its [lo, hi] bounds.
    *
    * Uses double scaling then a long cast: monotonic, and safe for the
    * full long range (the quotient is ≤ 1 before the 2^bits scale). Ties
    * from the precision loss only coarsen the curve, never break the
    * zone-map contract (stats are computed from the stored rows, not the
    * z-value).
    */
  private def normalized(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val span = math.max(1L, hi - lo)
    val scale = ((1L << bits) - 1).toDouble / span.toDouble
    least(lit((1L << bits) - 1),
      greatest(lit(0L),
        ((c.cast("long") - lit(lo)).cast("double") * lit(scale)).cast("long")))
  }

  /** The Morton interleave of the normalized dimensions as one Column:
    * bit i of dim d lands at position i * ndims + d. A fixed OR-tree of
    * shift/mask terms — whole-stage-codegen friendly, no UDF. */
  def zValue(cols: Seq[Column], boundsPerDim: Seq[(Long, Long)],
             bits: Int = defaultBits): Column = {
    require(cols.nonEmpty && cols.size == boundsPerDim.size)
    require(cols.size * bits <= 62, s"z-value would overflow a long: " +
      s"${cols.size} dims x $bits bits")
    val n = cols.size
    val norm = cols.zip(boundsPerDim).map { case (c, (lo, hi)) =>
      normalized(c, lo, hi, bits)
    }
    val terms = for {
      b <- 0 until bits
      d <- 0 until n
    } yield shiftleft(shiftright(norm(d), b).bitwiseAND(lit(1L)), b * n + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-order-clustered on `dims`: range-partition by the
    * z-value (each output file owns a contiguous curve segment ≙ a small
    * hyper-rectangle), sort within partitions so row-group stats are
    * tight, then drop the helper column. Same write machinery and layout
    * controls as [[ParquetTable.writeSorted]]. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
                    numFiles: Int, layout: ParquetLayout = ParquetLayout(),
                    bits: Int = defaultBits): Unit = {
    val b = bounds(df, dims)
    val z = zValue(dims.map(col), b, bits)
    val clustered = df
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    ParquetTable.write(clustered, path, layout)
  }

  /** Row groups whose [min,max] zone of `dim` overlaps [lo, hi] — the
    * row groups a pushed-down range filter on `dim` must read. Pruning
    * quality metric: lower is better for the same data and filter. */
  def overlappingRowGroups(spark: SparkSession, path: String, dim: String,
                           lo: Long, hi: Long): Long =
    ParquetStats.keyStats(spark, path, dim)
      .where(col("maxKeyLong") >= lo && col("minKeyLong") <= hi)
      .count()
}
