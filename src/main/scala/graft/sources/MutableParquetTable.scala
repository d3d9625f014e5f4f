package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MergeOps

/** Result of a copy-on-write merge: where the new snapshot lives and which
  * files were rewritten vs passed through untouched. */
final case class MergeResult(
    snapshotDir: String,
    rewrittenFiles: Seq[String],
    passthroughFiles: Seq[String],
    insertedFileCount: Int)

/** A key-sorted Parquet table supporting copy-on-write merges.
  *
  * This is the Spark-native re-expression of the reference's whole design
  * (ParquetRewriter.java:29-40): apply upserts/deletes to a key-sorted
  * Parquet dataset while leaving clean data untouched. The reference works
  * at row-group granularity inside one file (raw passthrough,
  * ParquetRewriter.java:312-322); at cluster scale the natural CoW unit is
  * the *file* — clean files are passed through as metadata-only links and
  * never opened, dirty files are rewritten by a distributed merge job.
  *
  * Layout invariant (README.md:21): files hold disjoint key ranges, each
  * internally sorted — produced by [[ParquetTable.writeSorted]]. Dirty-file
  * detection = footer key ranges (the reference's loadStats zone map,
  * ParquetRewriter.java:239-251) range-joined against the update keys
  * (the seekToKey routing of ParquetRewriter.java:263-283, made set-wise).
  *
  * Scale notes (100 TB): footer stats are read on executors; the per-file
  * ranges involved in routing are tiny (one row per file) and broadcast;
  * only dirty files are scanned, and the rewrite job is one task per dirty
  * file's worth of data. A no-op merge touches zero data files
  * (noChangesTest analog, ParquetRewriterTests.java:318-323).
  */
final class MutableParquetTable(spark: SparkSession, val dir: String, val key: String) {

  def read(): DataFrame = spark.read.parquet(dir)

  /** Per-file [minKey, maxKey] from footers only. */
  def fileRanges(): DataFrame = ParquetStats.fileKeyRanges(spark, dir, key)

  /** Route update keys to files: a key is owned by the file whose range
    * contains it; a key outside all ranges routes to the nearest file below
    * (the reference's "insert into current block" rule,
    * ParquetRewriter.java:263-283) or the first file if below all ranges.
    * Returns (file -> dirty?) and the routed updates.
    */
  def dirtyFiles(updateKeys: DataFrame): Seq[String] = {
    val ranges = ParquetStats.fileKeyRangesFast(spark, dir, key)
      .sortBy(_._2).toArray
    if (ranges.isEmpty) return Seq.empty
    val bcast = spark.sparkContext.broadcast(ranges)
    val keyCol = key
    import spark.implicits._
    val routed = updateKeys.select(col(keyCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val rs = bcast.value
        it.map { k =>
          // binary search: last file with minKey <= k, else first file
          var lo = 0; var hi = rs.length - 1; var ans = 0
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (rs(mid)._2 <= k) { ans = mid; lo = mid + 1 } else hi = mid - 1
          }
          rs(ans)._1
        }
      }.distinct().collect()
    routed.toSeq.sorted
  }

  /** Copy-on-write merge. `batch` = base schema + op column.
    * Writes a new snapshot directory: clean files hard-linked (fallback:
    * copied) without ever being opened; dirty files re-merged and rewritten
    * sorted. Returns the manifest.
    */
  def merge(batch: DataFrame, opCol: String = "op",
            snapshotDir: Option[String] = None): MergeResult = {
    val outDir = snapshotDir.getOrElse(s"$dir-v${System.currentTimeMillis()}")
    Files.createDirectories(Paths.get(outDir))

    // normalize to scheme-less local paths: footer stats yield `file:/…`
    // URIs, the local listing yields plain paths
    def localPath(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val dirty = dirtyFiles(batch.select(key)).map(localPath)
    val allFiles = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toList.sorted
      finally s.close()
    }
    val clean = allFiles.filterNot(dirty.contains)

    // metadata-only passthrough of clean files (S6 analog)
    clean.foreach { f =>
      val src = Paths.get(f)
      val dst = Paths.get(outDir, src.getFileName.toString)
      try Files.createLink(dst, src)
      catch { case _: Exception =>
        Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING) }
    }

    var inserted = 0
    if (dirty.nonEmpty || clean.isEmpty) {
      // distributed re-merge of just the dirty slice
      val base =
        if (dirty.nonEmpty) spark.read.parquet(dirty: _*)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          batch.drop(opCol).schema)
      // persist across the two passes repartitionByRange makes (range
      // sampling + the shuffle itself) so the merge join runs once
      val merged = MergeOps.applyMutations(base, batch, key, opCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = math.max(1, dirty.size)
        merged
          .repartitionByRange(n, col(key))
          .sortWithinPartitions(col(key))
          .write.mode("append").parquet(outDir)
        inserted = n
      } finally merged.unpersist(false)
    }
    MergeResult(outDir, dirty, clean, inserted)
  }
}

object MutableParquetTable {
  def apply(spark: SparkSession, dir: String, key: String): MutableParquetTable =
    new MutableParquetTable(spark, dir, key)
}
