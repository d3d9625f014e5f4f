package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{MergeResult, MutableParquetTable}
import graft.streaming.CdcMergeSink

/** Outcome of one optimistic commit: the version it landed as, how many
  * merge attempts it took (1 = no contention), and the merge summary of
  * the attempt that won. `merge` is None for empty batches (nothing
  * committed). */
final case class ConcurrentCommit(version: Long, attempts: Int,
                                  merge: Option[MergeResult])

/** Multi-writer OPTIMISTIC CONCURRENCY for the version chain.
  *
  * The single-writer commit path computed `next = latest + 1` and merged
  * straight into `root/v<next>` — two concurrent writers would race to
  * the same slot and the later manifest write would silently clobber the
  * earlier snapshot. This protocol makes `commit` safe under any number
  * of concurrent writers (threads or separate drivers on a shared
  * filesystem) with no locks and no wait-for-predecessor coupling:
  *
  *  1. STAGE — merge against the latest committed snapshot into a
  *     private `root/.tx-<uuid>` directory (invisible to readers: the
  *     version listing matches `v\d+` only). Merges by different writers
  *     run fully concurrent — contention costs nothing until publish.
  *     The staged dir is a complete snapshot INCLUDING its manifest, and
  *     it sits directly under the table root so both hard links (same
  *     filesystem) and `../vN/...` reference entries (same depth) are
  *     already in final form.
  *  2. PUBLISH — one atomic rename of the staged dir to `root/v<n>`,
  *     n = my base version + 1. The rename either wins the slot or
  *     fails because a competing commit won it first; because staged
  *     dirs carry their manifest, a published version is committed the
  *     instant it becomes visible. This is the protocol's only atomic
  *     primitive — on an object store swap it for a conditional PUT
  *     (if-none-match) of the manifest at the versioned key.
  *  3. On conflict — REBASE or RETRY. A competing commit advanced the
  *     head past my base, so my staged snapshot's passthrough inventory
  *     is stale. If the intervening commits provably touched a disjoint
  *     set of files ([[OptimisticCommit.tryRebase]]), the staged
  *     rewrite is still valid and re-publishing costs METADATA ONLY: a
  *     manifest rebuilt against the new head. Otherwise the staging dir
  *     is discarded and the merge re-runs against the new head —
  *     write-write conflicts on the same keys/files are inherently
  *     serial in a CoW table.
  *
  * Crash safety: a writer dying at any point leaves either a partial
  * `.tx-` dir (invisible; swept by [[CdcMergeSink.vacuum]] after a
  * retention window) or a fully committed version. There is no state a
  * crashed writer can leave that blocks other writers or corrupts a
  * reader — the slot-claim IS the commit.
  *
  * Serialization semantics: commits linearize in version order; each
  * version's snapshot is its batch applied to the PREDECESSOR version
  * (re-merge) or a provably-equivalent file swap (rebase). Overlapping
  * writers therefore see last-committer-wins per key, exactly as if they
  * had run sequentially in version order.
  *
  * The reference is single-process and single-writer by construction
  * (one ParquetRewriter per sorted file, README.md:45-48); multi-writer
  * commit coordination is what a shared 100 TB table needs on top. */
object OptimisticCommit {

  /** The next version slot is occupied by an UNCOMMITTED directory this
    * protocol did not produce (a crashed direct `applyBatch` target or
    * foreign debris) — publishing over it could destroy another writer's
    * in-progress work, so the commit refuses instead. */
  final class BlockedSlotException(msg: String) extends RuntimeException(msg)

  /** Commit `batch` as the table's next version, safe under concurrent
    * writers. Returns the landed version (or the current latest for an
    * empty batch) plus attempt telemetry. `testHookAfterStage` runs
    * between staging and publish — a deterministic seam for conflict
    * tests; production callers leave the default. */
  def commit(spark: SparkSession, tableRoot: String, key: String,
             batch: DataFrame, opCol: String = "op",
             seqCol: Option[String] = None,
             passthrough: MutableParquetTable.Passthrough =
               MutableParquetTable.Link,
             maxAttempts: Int = 20,
             testHookAfterStage: () => Unit = () => ()): ConcurrentCommit = {
    val collapsed = CdcMergeSink.collapse(batch, key, seqCol)
    if (collapsed.isEmpty)
      return ConcurrentCommit(
        CdcMergeSink.versions(tableRoot).lastOption.getOrElse(-1L), 0, None)
    var attempts = 0
    var staged: Option[Staged] = None
    try {
      while (attempts < maxAttempts) {
        attempts += 1
        val st = staged match {
          case Some(s) => s // a successful rebase re-publishes as-is
          case None =>
            val baseV = CdcMergeSink.versions(tableRoot).lastOption
            val baseDir = baseV.map(v => s"$tableRoot/v$v")
              .getOrElse(s"$tableRoot/base")
            val dir = s"$tableRoot/.tx-${
              java.util.UUID.randomUUID().toString.take(12)}"
            val t = MutableParquetTable(spark, baseDir, key, passthrough,
              MutableParquetTable.manifestMoreKeys(baseDir))
            Staged(dir, baseV, t.merge(collapsed, opCol, Some(dir)))
        }
        staged = Some(st)
        testHookAfterStage()
        val target = st.baseVersion.getOrElse(-1L) + 1
        val targetDir = s"$tableRoot/v$target"
        if (tryPublish(st.dir, targetDir)) {
          staged = None
          return ConcurrentCommit(target, attempts,
            Some(st.merge.copy(snapshotDir = targetDir)))
        }
        // slot taken: with staged dirs publishing manifest-complete, any
        // committed v<target> means a competitor won the race; an
        // UNCOMMITTED v<target> was not made by this protocol — refuse
        val nowLast = CdcMergeSink.versions(tableRoot).lastOption
          .getOrElse(-1L)
        if (nowLast < target)
          throw new BlockedSlotException(
            s"$targetDir exists but is not a committed snapshot — a " +
              "crashed direct applyBatch target or foreign directory is " +
              "blocking the version chain; remove it (vacuum) and retry")
        staged = tryRebase(spark, tableRoot, st, nowLast, key, passthrough)
        if (staged.isEmpty) deleteQuietly(st.dir) // re-merge from scratch
      }
      throw new IllegalStateException(
        s"commit on $tableRoot lost the publish race $maxAttempts times — " +
          "pathological contention; raise maxAttempts or serialize writers")
    } finally staged.foreach(s => deleteQuietly(s.dir))
  }

  /** A staged-but-unpublished snapshot: its dir, the version it was
    * merged against (None = the base snapshot), and the merge summary. */
  private final case class Staged(dir: String, baseVersion: Option[Long],
                                  merge: MergeResult)

  /** Atomic slot claim. True = this staged dir is now the committed
    * version. False = the slot is already occupied (conflict). Errors
    * that are not slot-occupancy propagate. */
  private def tryPublish(staging: String, target: String): Boolean =
    try {
      Files.move(Paths.get(staging), Paths.get(target),
        StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: java.nio.file.DirectoryNotEmptyException => false
      case e: java.nio.file.FileSystemException
          if Files.exists(Paths.get(target)) => false
    }

  /** Metadata-only conflict resolution — Phase 2; None = re-merge. */
  private def tryRebase(spark: SparkSession, tableRoot: String, st: Staged,
                        newLast: Long, key: String,
                        passthrough: MutableParquetTable.Passthrough)
      : Option[Staged] = None

  private def deleteQuietly(dir: String): Unit =
    try {
      val p = Paths.get(dir)
      if (Files.exists(p)) MutableParquetTable.deleteDir(p)
    } catch { case _: Exception => () }
}
