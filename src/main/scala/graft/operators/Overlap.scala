package graft.operators

import java.util.concurrent.{Executors, ThreadFactory}
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Try}

/** BOUNDED driver-side overlap pool for §2.6 job submission (guide:
  * "2-3 jobs in flight is plenty: enough to fill the tail, not so many
  * that they fight for executors"). Every operator that overlaps
  * independent eager phases (PQ sub-builds, bm25 postings/doclen sides,
  * the dedup exact-harness overlap) submits through THIS pool instead of
  * the unbounded global ExecutionContext, so however many overlapping
  * operators are active, at most `threads` Spark job groups compete for
  * the scheduler — locally invisible, on a shared cluster the difference
  * between back-filling the tail and thrashing it.
  *
  * Sizing: `SPARK_GRAFT_OVERLAP_THREADS` (default 3). The pool is
  * process-wide and daemon-threaded (never blocks JVM exit).
  *
  * Submission discipline: only LEAF work is submitted — an operator that
  * overlaps internally (e.g. [[Similarity.pqCodebooks]]) is CALLED on the
  * caller's thread, never wrapped in another pool future, so pool threads
  * never block awaiting pool work (no thread-starvation deadlock at any
  * pool size).
  */
object Overlap {

  /** Pool width — the §2.6 jobs-in-flight bound. */
  val threads: Int =
    math.max(1, sys.env.getOrElse("SPARK_GRAFT_OVERLAP_THREADS", "3").toInt)

  implicit lazy val ec: ExecutionContext = {
    val n = new AtomicInteger
    ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(threads, new ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-overlap-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      }))
  }

  /** Await EVERY future — even after one fails — then rethrow the first
    * failure: no overlapped write is still in flight when the exception
    * propagates to the caller (the half-finished-concurrent-commit
    * failure mode of awaiting sides one by one). */
  def awaitAll[T](fs: Seq[Future[T]]): Seq[T] = {
    val done = fs.map(f => Try(Await.result(f, Duration.Inf)))
    done.collectFirst { case Failure(e) => throw e }
    done.map(_.get)
  }
}
