package graft

/** Single-lane bench harness for optimization work: times ONLY the named
  * query lanes under the exact [[Bench]] methodology (same session config,
  * same temp re-layout ingest, same sf0.001 codegen warm-up, same
  * best-of-2 noop-sink timing), so a lane can be iterated on without the
  * 20-minute full battery. Purely additive — [[Bench]]'s contract and
  * lane set are untouched.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *          runMain graft.BenchLane q192_pagerank q216_hits ...
  * Flags: --explain   also print each lane's formatted plan (over the
  *                    re-layouted data) before timing
  *        --repeat=N  best-of-N instead of best-of-2
  */
object BenchLane {
  import Bench.{time, runToNoop}

  /** Drift-immune evidence: jobs/stages/tasks/shuffle bytes per lane are
    * deterministic plan-shape metrics where wall seconds drift with host
    * phases (BENCH_NOTES). */
  private class Counts extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet(): Unit
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks.toLong)
      shuffleRead.addAndGet(
        s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead): Unit
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0)
      shuffleRead.set(0) }
    def snapshot: (Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, shuffleRead.get)
    /** Poll until the async listener bus has drained (counters stable for
      * two consecutive 100 ms reads), bounded at 5 s — deterministic where
      * a fixed sleep can under-count on a slow host. */
    def drain(): Unit = {
      var prev = snapshot
      var stable = false
      val deadline = System.nanoTime + 5000000000L
      while (!stable && System.nanoTime < deadline) {
        Thread.sleep(100)
        val cur = snapshot
        stable = cur == prev
        prev = cur
      }
    }
    def report: String = s"jobs=${jobs.get} stages=${stages.get} " +
      s"tasks=${tasks.get} shuffleReadMB=${shuffleRead.get / 1000000}"
  }

  private def reportOf(s: (Long, Long, Long, Long)): String =
    s"jobs=${s._1} stages=${s._2} tasks=${s._3} shuffleReadMB=${s._4 / 1000000}"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val explain = args.contains("--explain")
    val repeat = args.find(_.startsWith("--repeat="))
      .map(_.stripPrefix("--repeat=").toInt).getOrElse(2)
    val names = args.filterNot(_.startsWith("--")).toSeq
    require(names.nonEmpty, "pass at least one lane name")
    val spark = Bench.session(cpus)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val workDir = java.nio.file.Files.createTempDirectory("graft-lane").toString
    val dataDir = s"$workDir/data"
    results("ingest_layout") = time(Bench.ingest(spark, sfDir, dataDir))
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[lane] unknown query: $name")
        case Some(fn) =>
          if (explain) {
            println(s"\n========== $name ==========")
            try fn(spark, dataDir).explain("formatted")
            catch { case e: Throwable =>
              println(s"explain failed: ${e.getMessage}") }
          }
          try runToNoop(fn(spark, warmDir)) catch { case _: Throwable => }
          val counts = new Counts
          spark.sparkContext.addSparkListener(counts)
          // Pair each repeat's time with ITS drained counter snapshot and
          // report the snapshot belonging to the min-timed run (ADVICE r12:
          // the old code reported only the last repeat's counts).
          val runs = try {
            (1 to repeat).map { _ =>
              counts.reset()
              val t = time(runToNoop(fn(spark, dataDir)))
              counts.drain()
              (t, counts.snapshot)
            }
          } catch { case e: Throwable =>
            System.err.println(s"[lane] $name failed: ${e.getMessage}")
            Seq((-1.0, (0L, 0L, 0L, 0L)))
          }
          val (t, best) = runs.minBy(_._1)
          println(s"[lane] $name ${reportOf(best)}")
          spark.sparkContext.removeSparkListener(counts)
          results(name) = t
          spark.catalog.clearCache()
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"lanes","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
