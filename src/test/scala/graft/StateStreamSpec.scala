package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LATEST-STATE streaming source ([[graft.sources.GraftStateStream]]):
  * `spark.readStream.format("graft").load(root)` — batch 1 = the current
  * snapshot, later batches = post-image rows of feed-persisted commits
  * (the Delta streaming-source analog, upsert-stream semantics). */
class StateStreamSpec extends SparkSpec {

  private def mut(rows: Seq[(Long, Double, String)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "v", "op")
  }

  private def startStream(root: String, name: String,
                          opts: Map[String, String] = Map.empty) = {
    var r = spark.readStream.format("graft")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-ss-cp-$name").toString)
      .start()
  }

  private def rows(sink: String): Seq[(Long, Double)] =
    spark.table(sink).select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq

  test("snapshot first, then feed post-images; updates append as upsert stream") {
    val root = Files.createTempDirectory("graft-ss").toString
    val base = spark.range(0, 20)
      .select(col("id"), (col("id") * 2).cast("double").as("v"))
    val t = GraftTable.create(base, root, "id", numFiles = 2)
    t.commitWithFeed(mut(Seq((3L, 333.0, "upsert")))) // pre-stream commit

    val q = startStream(root, "ss_sink")
    try {
      q.processAllAvailable()
      // batch 1 = the CURRENT snapshot (v0 state): 20 rows, id 3 updated
      val snap = rows("ss_sink")
      assert(snap.size === 20)
      assert(snap.find(_._1 == 3L).get._2 === 333.0)

      // post-snapshot commits stream as post-images (insert AND update)
      t.commitWithFeed(mut(Seq((100L, 1.5, "upsert"), (4L, 444.0, "upsert"))))
      q.processAllAvailable()
      val now = spark.table("ss_sink").count()
      assert(now === 22, s"2 post-image rows appended, got $now")
      val appended = rows("ss_sink").diff(snap)
      assert(appended.toSet === Set((100L, 1.5), (4L, 444.0)))
    } finally q.stop()
  }

  test("maxFilesPerTrigger paces the snapshot into bounded micro-batches") {
    val root = Files.createTempDirectory("graft-ss-pace").toString
    val t = GraftTable.create(
      spark.range(0, 40).select(col("id"), col("id").cast("double").as("v")),
      root, "id", numFiles = 4)
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1").load(root)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ss-pace-cp").toString)
      .foreachBatch { (df: DataFrame, id: Long) =>
        batches.add((id, df.count())); ()
      }.start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val bs = batches.iterator().asScala.toSeq.sortBy(_._1)
      // 4 snapshot files → 4 non-empty paced batches (10 rows each),
      // plus possibly one empty transition batch
      assert(bs.count(_._2 > 0) === 4, s"got $bs")
      assert(bs.filter(_._2 > 0).forall(_._2 === 10), s"got $bs")
      assert(bs.map(_._2).sum === 40)
      // feed rows still arrive after the paced snapshot
      t.commitWithFeed(mut(Seq((100L, 1.0, "upsert"))))
      q.processAllAvailable()
      assert(batches.iterator().asScala.map(_._2).sum === 41)
    } finally q.stop()
  }

  test("maxBytesPerTrigger paces the snapshot by recorded file sizes") {
    val root = Files.createTempDirectory("graft-ss-bytes").toString
    GraftTable.create(
      spark.range(0, 40).select(col("id"), col("id").cast("double").as("v")),
      root, "id", numFiles = 4)
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    // a cap below any single file's size still takes ONE file per batch
    // (progress guarantee) — so the 4-file snapshot arrives as 4 batches
    val q = spark.readStream.format("graft")
      .option("maxBytesPerTrigger", "1").load(root)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ss-bytes-cp").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches.add(df.count()); ()
      }.start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val bs = batches.iterator().asScala.toSeq
      assert(bs.count(_ > 0) === 4, s"got $bs")
      assert(bs.sum === 40)
    } finally q.stop()
  }

  test("startingVersion skips the snapshot and streams changes from that version") {
    val root = Files.createTempDirectory("graft-ss-sv").toString
    val t = GraftTable.create(
      spark.range(0, 10).select(col("id"), col("id").cast("double").as("v")),
      root, "id", numFiles = 1)
    t.commitWithFeed(mut(Seq((100L, 1.0, "upsert")))) // v0
    t.commitWithFeed(mut(Seq((101L, 2.0, "upsert")))) // v1

    val q = startStream(root, "ss_sv",
      Map("startingVersion" -> "1"))
    try {
      q.processAllAvailable()
      // no 10-row snapshot, no v0 — exactly v1's post-image
      assert(rows("ss_sv") === Seq((101L, 2.0)))
      t.commitWithFeed(mut(Seq((102L, 3.0, "upsert")))) // v2 streams on
      q.processAllAvailable()
      assert(rows("ss_sv") === Seq((101L, 2.0), (102L, 3.0)))
    } finally q.stop()

    // "latest": only commits made after stream start
    val q2 = startStream(root, "ss_sv_latest",
      Map("startingVersion" -> "latest"))
    try {
      q2.processAllAvailable()
      assert(spark.table("ss_sv_latest").isEmpty)
      t.commitWithFeed(mut(Seq((103L, 4.0, "upsert"))))
      q2.processAllAvailable()
      assert(rows("ss_sv_latest") === Seq((103L, 4.0)))
    } finally q2.stop()
  }

  test("delete rows refuse by default; ignoreDeletes skips them") {
    val root = Files.createTempDirectory("graft-ss-del").toString
    val t = GraftTable.create(
      spark.range(0, 10).select(col("id"), col("id").cast("double").as("v")),
      root, "id", numFiles = 1)
    val q = startStream(root, "ss_del")
    try {
      q.processAllAvailable()
      t.commitWithFeed(mut(Seq((5L, 0.0, "delete"))))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msg(x: Throwable): String =
        Option(x.getMessage).getOrElse("") +
          Option(x.getCause).map(msg).getOrElse("")
      assert(msg(e).contains("ignoreDeletes"), msg(e))
    } finally q.stop()

    // with ignoreDeletes the same history streams: snapshot already has
    // the delete applied; a later mixed commit keeps only the upsert
    val q2 = startStream(root, "ss_del2", Map("ignoreDeletes" -> "true"))
    try {
      q2.processAllAvailable()
      assert(spark.table("ss_del2").count() === 9) // snapshot minus id 5
      t.commitWithFeed(mut(Seq((6L, 0.0, "delete"), (20L, 20.5, "upsert"))))
      q2.processAllAvailable()
      assert(rows("ss_del2").contains((20L, 20.5)))
      assert(spark.table("ss_del2").count() === 10, "delete row skipped")
    } finally q2.stop()
  }

  test("a feedless commit stops the stream pointing at repair_feed; repair resumes it") {
    val root = Files.createTempDirectory("graft-ss-gap").toString
    val t = GraftTable.create(
      spark.range(0, 10).select(col("id"), col("id").cast("double").as("v")),
      root, "id", numFiles = 1)
    val cp = Files.createTempDirectory("graft-ss-gap-cp").toString
    // foreachBatch, not the memory sink: the restart must RECOVER from
    // the checkpoint (memory/console sinks reject recovery)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
    def start() = spark.readStream.format("graft").load(root)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => got.add((r.getLong(0), r.getDouble(1))))
      }.start()

    val q = start()
    try {
      q.processAllAvailable()
      assert(got.size === 10)
      // a plain commit has no feed: the state stream must FAIL (silently
      // skipping would lose the row), naming the remedy
      t.commit(mut(Seq((50L, 5.5, "upsert"))))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msg(x: Throwable): String =
        Option(x.getMessage).getOrElse("") +
          Option(x.getCause).map(msg).getOrElse("")
      assert(msg(e).contains("repair_feed"), msg(e))
    } finally q.stop()

    // backfill the missing feed, restart from the SAME checkpoint: the
    // stream resumes exactly where it held and delivers the row
    t.repairFeed(0L) // the feedless commit landed as v0 (base + 1)
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.iterator().asScala.toSeq.contains((50L, 5.5)))
      assert(got.size === 11)
    } finally q2.stop()
  }

  test("restart from checkpoint never re-serves the snapshot; column pruning maps") {
    val root = Files.createTempDirectory("graft-ss-rs").toString
    val t = GraftTable.create(
      spark.range(0, 15).select(col("id"), col("id").cast("double").as("v"),
        concat(lit("n"), col("id")).as("name")),
      root, "id", numFiles = 1)
    val cp = Files.createTempDirectory("graft-ss-rs-cp").toString
    // prune to (name, id) — reordered and partial: the feed→state mapping
    // must resolve keys and after-struct fields by NAME. foreachBatch so
    // the restart recovers from the checkpoint.
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def start() = spark.readStream.format("graft").load(root)
      .select(col("name"), col("id"))
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => got.add((r.getString(0), r.getLong(1))))
      }.start()

    val q = start()
    try { q.processAllAvailable() } finally q.stop()
    assert(got.size === 15)

    val s = spark; import s.implicits._
    t.commitWithFeed(
      Seq((99L, 9.9, "n99", "upsert")).toDF("id", "v", "name", "op"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val all = got.iterator().asScala.toSeq
      assert(all.size === 16, "snapshot not re-served, new row delivered")
      assert(all.contains(("n99", 99L)),
        "feed post-image must map by name into the pruned, reordered schema")
    } finally q2.stop()
  }

  test("a checkpoint below the retention horizon FAILS instead of skipping vacuumed versions") {
    val root = Files.createTempDirectory("graft-ss-vac").toString
    val cp = Files.createTempDirectory("graft-ss-vac-cp").toString
    val t = GraftTable.create(
      spark.range(0, 10).select(col("id"), col("id").cast("double").as("v")),
      root, "id", numFiles = 2)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = spark.readStream.format("graft").load(root)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen.addAndGet(df.count()); ()
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      t.commitWithFeed(mut(Seq((100L, 1.0, "upsert")))) // v0 — consumed
      q.processAllAvailable()
      assert(seen.get() === 11)
    } finally q.stop()

    // while the stream is down: three more commits, then retention
    // drops all but the newest — the stream's next versions are GONE,
    // their feeds deleted with them
    t.commitWithFeed(mut(Seq((101L, 2.0, "upsert")))) // v1
    t.commitWithFeed(mut(Seq((102L, 3.0, "upsert")))) // v2
    t.commitWithFeed(mut(Seq((103L, 4.0, "upsert")))) // v3
    t.vacuum(keepLast = 1)

    // silently serving v3 would lose v1/v2's rows — must fail instead
    val q2 = start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      def msg(x: Throwable): String =
        Option(x.getMessage).getOrElse("") +
          Option(x.getCause).map(msg).getOrElse("")
      assert(msg(e).contains("retention horizon"), msg(e))
    } finally q2.stop()
  }
}
