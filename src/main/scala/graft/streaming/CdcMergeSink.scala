package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.MutableParquetTable

/** Streaming CDC apply: a change stream (upserts/deletes) continuously
  * merged into a key-sorted Parquet table through the copy-on-write path.
  *
  * This closes the loop on the reference's core scenario: its README
  * drives a *stream of updates* into a sorted Parquet file
  * (/root/reference/README.md:36-48) with the caller doing the batching.
  * Here Structured Streaming does the batching — each micro-batch becomes
  * one [[MutableParquetTable.merge]], producing a manifest-committed
  * snapshot per batch:
  *
  * {{{ tableRoot/base        — initial snapshot (writeSorted)
  *     tableRoot/v<batchId>  — snapshot after micro-batch <batchId> }}}
  *
  * Exactly-once without a transaction log: foreachBatch may REPLAY a
  * batch after a failure, but the snapshot for batch N is committed
  * atomically (manifest last) at a deterministic directory derived from
  * the batch id — a replay of a committed batch is a no-op, and a
  * half-written v<N> (no manifest) is cleaned and rebuilt. Readers only
  * ever see committed snapshots via [[latestSnapshot]].
  *
  * Scale shape: state lives entirely in the table layout (no streaming
  * state store growth); each micro-batch pays one footer-routed CoW merge
  * whose cost scales with the dirty-file count, not the table size. The
  * per-batch mutation collapse is one bounded shuffle of the batch only.
  */
object CdcMergeSink {

  /** Highest committed snapshot: max v<batchId> carrying a manifest, else
    * `base`. Uncommitted (crashed) version dirs are invisible. */
  def latestSnapshot(tableRoot: String): String = {
    val root = Paths.get(tableRoot)
    val versions = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(root)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+"))
        .filter(p => MutableParquetTable.isCommitted(p.toString))
        .map(p => p.getFileName.toString.drop(1).toLong)
        .toList
      finally s.close()
    }
    if (versions.isEmpty) s"$tableRoot/base"
    else s"$tableRoot/v${versions.max}"
  }

  /** All committed batch ids, ascending — the table's version history. */
  def versions(tableRoot: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(tableRoot))
    try s.iterator().asScala
      .filter(p => p.getFileName.toString.matches("v\\d+"))
      .filter(p => MutableParquetTable.isCommitted(p.toString))
      .map(p => p.getFileName.toString.drop(1).toLong)
      .toList.sorted
    finally s.close()
  }

  /** Time travel: the committed table state as of batch `batchId` — the
    * newest committed version at-or-before it (or the base snapshot when
    * none is). Snapshots are immutable (CoW + hard links), so history
    * reads cost nothing beyond keeping the version dirs around. */
  def readAsOf(spark: SparkSession, tableRoot: String, batchId: Long): DataFrame = {
    val at = versions(tableRoot).takeWhile(_ <= batchId).lastOption
    at match {
      case Some(v) =>
        MutableParquetTable.readCommitted(spark, s"$tableRoot/v$v")
      case None => spark.read.parquet(s"$tableRoot/base")
    }
  }

  /** Collapse a micro-batch to its FINAL mutation per key (last `seqCol`
    * wins — CDC streams carry multiple ops for one key within a batch).
    * `seqCol` must be unique per key within a batch; without one the
    * batch is required to already be key-unique. */
  private[graft] def collapse(batch: DataFrame, key: String,
                              seqCol: Option[String]): DataFrame =
    seqCol match {
      case None => batch
      case Some(seq) =>
        val w = Window.partitionBy(col(key)).orderBy(col(seq).desc)
        batch.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .drop("__rn", seq)
    }

  /** Apply one micro-batch. Idempotent in `batchId`: a committed
    * v<batchId> short-circuits (failure replay), an uncommitted one is
    * torn down and rebuilt. */
  def applyBatch(spark: SparkSession, batch: DataFrame, tableRoot: String,
                 key: String, opCol: String = "op",
                 seqCol: Option[String] = None, batchId: Long): Unit = {
    val target = s"$tableRoot/v$batchId"
    if (MutableParquetTable.isCommitted(target)) return
    if (Files.exists(Paths.get(target))) {
      // crashed half-apply: no manifest, so nothing ever read it — rebuild
      import scala.jdk.CollectionConverters._
      val s = Files.walk(Paths.get(target))
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally s.close()
    }
    val collapsed = collapse(batch, key, seqCol)
    if (collapsed.isEmpty) return // empty batch: keep the current snapshot
    val t = MutableParquetTable(spark, latestSnapshot(tableRoot), key)
    t.merge(collapsed, opCol, Some(target))
  }

  /** Attach the sink to a streaming mutation frame and start it. The
    * frame's schema must be the base table's schema plus `opCol`
    * ('upsert' | 'delete') and optionally `seqCol`. */
  def start(mutations: DataFrame, tableRoot: String, key: String,
            opCol: String = "op", seqCol: Option[String] = None,
            checkpointDir: Option[String] = None,
            queryName: String = "graft-cdc-merge"): StreamingQuery = {
    val spark = mutations.sparkSession
    val cp = checkpointDir.getOrElse(
      Files.createTempDirectory("graft-cdc-cp").toString)
    mutations.writeStream
      .queryName(queryName)
      .option("checkpointLocation", cp)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        applyBatch(spark, b, tableRoot, key, opCol, seqCol, id)
      }
      .start()
  }
}
