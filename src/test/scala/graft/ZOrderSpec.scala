package graft

import org.apache.spark.sql.functions._

import graft.sources.{ParquetLayout, ZOrder}

class ZOrderSpec extends SparkSpec {

  // two INDEPENDENT uniform dimensions: a linear sort on x leaves y's
  // per-row-group stats spanning the whole domain, so y-filters prune
  // nothing; the z-order curve must restore y pruning without destroying
  // x pruning.
  private lazy val data = {
    import spark.implicits._
    spark.range(0, 120000, 1, 8)
      .select(
        (xxhash64(col("id")).bitwiseAND(lit(4095L))).as("x"),
        (xxhash64(col("id"), lit(7)).bitwiseAND(lit(4095L))).as("y"),
        col("id").as("payload"))
  }

  private def writeBoth(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val linear = s"$base/linear"
    val zord = s"$base/zorder"
    val layout = ParquetLayout(rowGroupBytes = Some(64 * 1024),
      pageBytes = Some(8 * 1024), dictionaryEnabled = false)
    graft.sources.ParquetTable.writeSorted(data, linear, "x", 4, layout)
    ZOrder.writeZOrdered(data, zord, Seq("x", "y"), 4, layout, bits = 12)
    (linear, zord)
  }

  test("z-order round-trips the data unchanged") {
    val (_, zord) = writeBoth()
    val back = spark.read.parquet(zord)
    assert(back.count() === data.count())
    val a = back.agg(sum(col("payload")), sum(col("x")), sum(col("y"))).head()
    val b = data.agg(sum(col("payload")), sum(col("x")), sum(col("y"))).head()
    assert(a === b)
  }

  test("z-order prunes row groups on BOTH dimensions; linear only on its sort key") {
    val (linear, zord) = writeBoth()
    def groups(path: String, dim: String): Long =
      ZOrder.overlappingRowGroups(spark, path, dim, 1000, 1255)
    val total = graft.sources.ParquetStats
      .rowGroupStats(spark, zord).count()
    assert(total >= 16, s"fixture too coarse: $total row groups")

    // the linear layout is the reference point: near-perfect on x,
    // (essentially) no pruning on y. The bound is 4/5, not ~1: row-group
    // boundaries shift run to run (repartitionByRange samples with an
    // RDD-id-derived seed, so a longer-lived session lands different
    // boundaries) and an unlucky cut can hand y a couple of narrow
    // groups — the CLAIM is only that linear can't meaningfully prune
    // the non-sort dim, which zY < linY below pins relatively anyway
    val linX = groups(linear, "x")
    val linY = groups(linear, "y")
    assert(linY >= total * 4 / 5,
      s"expected linear layout to scan ~all groups on y: $linY of $total")

    val zX = groups(zord, "x")
    val zY = groups(zord, "y")
    // a 1/16-wide slice of a 2-d curve should touch well under all the
    // groups on either dimension; the exact count jitters by ±1 because
    // repartitionByRange samples with an RDD-id-derived seed, so group
    // boundaries shift run to run — keep a margin above the observed ~11/22
    assert(zX <= total * 3 / 5, s"z-order x pruning too weak: $zX of $total")
    assert(zY <= total * 3 / 5, s"z-order y pruning too weak: $zY of $total")
    assert(zY < linY, s"z-order must beat linear on the non-sort dim: $zY vs $linY")
    assert(linX <= zX, s"sanity: linear should be at least as tight on x")
  }

  test("z-value interleaves bits as documented") {
    import spark.implicits._
    // bounds [0,15], 4 bits: z(x=0b1010, y=0b0101) = 0b01100110
    val df = Seq((10L, 5L)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(col("x"), col("y")),
      Seq((0L, 15L), (0L, 15L)), bits = 4).as("z")).head().getLong(0)
    assert(z === Integer.parseInt("01100110", 2).toLong)
  }
}
