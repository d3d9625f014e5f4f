package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Micro-batch streaming semantics via MemoryStream (SURVEY.md §5.2 item 5):
  * windows, watermark dedup, custom keyed state. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  test("tumbling window aggregation over a stream (complete mode)") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val df = in.toDF().toDF("ts", "user_id", "value")
    val q = Streams.tumblingAgg(df, width = "10 minutes")
      .writeStream.format("memory").queryName("tumble").outputMode("complete").start()
    try {
      in.addData((ts(1), 1L, 1.0), (ts(2), 1L, 2.0), (ts(11), 2L, 3.0))
      q.processAllAvailable()
      in.addData((ts(3), 3L, 4.0), (ts(25), 1L, 5.0))
      q.processAllAvailable()
      val got = spark.table("tumble")
        .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === Set(("10:00", 3L, 7.0), ("10:10", 1L, 3.0), ("10:20", 1L, 5.0)))
    } finally q.stop()
  }

  test("watermark drops late data beyond the delay (append mode)") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val df = in.toDF().toDF("ts", "user_id", "value")
    val q = Streams.tumblingAgg(
        Streams.withLateData(df, delay = "5 minutes"), width = "10 minutes")
      .writeStream.format("memory").queryName("wm").outputMode("append").start()
    try {
      in.addData((ts(1), 1L, 1.0), (ts(2), 1L, 2.0))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 window (+5m delay)
      in.addData((ts(31), 2L, 9.0))
      q.processAllAvailable()
      // this event is now later than watermark (10:26) and must be dropped
      in.addData((ts(3), 9L, 100.0))
      q.processAllAvailable()
      in.addData((ts(59), 2L, 1.0))
      q.processAllAvailable()
      val got = spark.table("wm")
        .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      // the 10:00 window emitted exactly once, without the late event
      assert(got.contains(("10:00", 2L, 3.0)))
      assert(!got.exists(_._3 == 103.0))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps first per key across batches") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val df = in.toDF().toDF("ts", "user_id", "value")
    val q = Streams.dedupWithinWatermark(df, Seq("user_id"), delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData((ts(1), 1L, 1.0), (ts(2), 1L, 2.0))
      q.processAllAvailable()
      in.addData((ts(3), 1L, 3.0), (ts(4), 2L, 4.0))
      q.processAllAvailable()
      val got = spark.table("dedup").select("user_id").collect().map(_.getLong(0)).toSeq
      assert(got.sorted === Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join matches only within the time window") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val lIn = MemoryStream[(Timestamp, Long, Double)]
    val rIn = MemoryStream[(Timestamp, Long, String)]
    val l = lIn.toDF().toDF("ts", "user_id", "value")
    val r = rIn.toDF().toDF("ts", "user_id", "tag")
    val q = Streams.intervalJoin(l, r, "user_id",
        before = "5 minutes", after = "5 minutes", delay = "10 minutes")
      .select(col("user_id"), col("value"), col("r_tag"))
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      lIn.addData((ts(10), 1L, 1.0), (ts(30), 1L, 2.0), (ts(10), 2L, 3.0))
      rIn.addData((ts(12), 1L, "a"), (ts(40), 1L, "b"), (ts(11), 3L, "c"))
      q.processAllAvailable()
      val got = spark.table("ij").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      // (1, t10) ↔ (1, t12, a) within ±5m; (1, t30) matches neither
      // (t12 too early, t40 too late); key 2 / key 3 have no partner
      assert(got === Set((1L, 1.0, "a")))

      // batch form of the identical plan gives the same matches
      val bl = Seq((ts(10), 1L, 1.0), (ts(30), 1L, 2.0), (ts(10), 2L, 3.0))
        .toDF("ts", "user_id", "value")
      val br = Seq((ts(12), 1L, "a"), (ts(40), 1L, "b"), (ts(11), 3L, "c"))
        .toDF("ts", "user_id", "tag")
      val batch = Streams.intervalJoin(bl, br, "user_id",
          before = "5 minutes", after = "5 minutes")
        .select(col("user_id"), col("value"), col("r_tag")).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(batch === got)
    } finally q.stop()
  }

  test("transformWithState: TTL'd first-seen suppression across micro-batches") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    // transformWithState runs only on the RocksDB state store
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // processing-time state (TTL) keeps the micro-batch engine
      // scheduling batches FOREVER — `processAllAvailable` never sees the
      // stream idle, and even AvailableNow keeps running state-driven
      // empty batches past the bounded offsets (shouldRunAnotherBatch is
      // unconditionally true in processing-time mode). Drive by POLLING
      // the sink for the expected rows, then stop the query explicitly;
      // round 2 restarts on the same checkpoint, proving the suppression
      // state survives a restart.
      val in = MemoryStream[Streams.UserEvent]
      val out = Streams.firstSeenWithTtl(in.toDS(),
        java.time.Duration.ofHours(1))
      val ckpt = java.nio.file.Files.createTempDirectory("fsttl-ck").toString
      // foreachBatch, not the memory sink: a restarted query must recover
      // from the checkpoint (memory/console sinks reject recovery)
      def drain(expect: Int): Seq[Streams.UserEvent] = {
        val got = new java.util.concurrent.ConcurrentLinkedQueue[
          Streams.UserEvent]()
        val q = out.writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .foreachBatch { (ds: org.apache.spark.sql.Dataset[Streams.UserEvent],
                           _: Long) => ds.collect().foreach(got.add) }
          .start()
        try {
          val deadline = System.nanoTime + 180L * 1000 * 1000 * 1000
          while (got.size < expect && System.nanoTime < deadline)
            Thread.sleep(200)
          // a short grace pass would catch EXTRA (wrongly unsuppressed)
          // rows that trail the expected ones
          Thread.sleep(1500)
        } finally q.stop()
        import scala.jdk.CollectionConverters._
        got.iterator().asScala.toSeq
      }
      in.addData(Streams.UserEvent(1L, 1.0), Streams.UserEvent(1L, 2.0),
        Streams.UserEvent(2L, 3.0))
      val r1 = drain(2)
      assert(r1.map(_.user_id).sorted === Seq(1L, 2L))
      assert(r1.find(_.user_id == 1L).get.value === 1.0,
        "the FIRST event per key wins within a batch")
      // key 1 again in a later run: suppressed by CHECKPOINTED state
      in.addData(Streams.UserEvent(1L, 9.0), Streams.UserEvent(3L, 4.0))
      val r2 = drain(1)
      assert(r2.map(_.user_id) === Seq(3L),
        s"restarted query must suppress key 1 from restored state: $r2")

      // batch parity: same processor over empty state = first row per key
      val batch = Seq(Streams.UserEvent(7L, 1.0), Streams.UserEvent(7L, 2.0),
        Streams.UserEvent(8L, 5.0)).toDS()
      val bres = Streams.firstSeenWithTtl(batch, java.time.Duration.ofHours(1))
        .collect()
      assert(bres.map(_.user_id).sorted === Array(7L, 8L))
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session windows merge events within the gap (batch = stream semantics)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (ts(0), 1L, 1.0), (ts(10), 1L, 1.0), (ts(50), 1L, 1.0),
      (ts(0), 2L, 1.0)).toDF("ts", "user_id", "value")
    val got = Streams.sessionAgg(df, gap = "15 minutes")
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("file-source readStream -> windowed agg -> parquet file sink (availableNow)") {
    // the full pipeline shape: stream a parquet directory, watermark +
    // tumbling agg, append to a parquet sink with checkpoint, drain with
    // the availableNow trigger (batch-backfill semantics)
    val work = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val src = Tables.events(spark, sf()).select("ts", "user_id", "value")
    src.write.parquet(s"$work/in")

    val stream = spark.readStream.schema(src.schema).parquet(s"$work/in")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("day"), col("n"), col("sum_value"))
    val q = stream.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // append mode emits only watermark-closed windows: all but the last day
    val expected = src.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val maxDay = expected.agg(max(col("day"))).head().getTimestamp(0)
    val closed = expected.where(col("day") < maxDay)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    val got = spark.read.parquet(s"$work/out")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    assert(got === closed)
  }

  test("streaming incremental dedup: cross-epoch pairs via the persisted index, within-epoch via new-vs-new") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-sds").toString
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val q = Streams.dedupIncrementalSink(
      in.toDF().toDF("doc_id", "text"), s"$work/idx", "text", "doc_id",
      s"$work/cp", threshold = 0.25) { (pairs, epoch) =>
      got.synchronized {
        got(epoch) = pairs.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    }
    try {
      // epoch 0: one doc + one unrelated doc — no pairs
      in.addData((1L, base), (2L, "completely different words " * 20))
      q.processAllAvailable()
      // epoch 1: a near-dup of doc 1 (cross-epoch, via the index), plus
      // a fresh pair of near-dups arriving together (within-batch)
      in.addData((3L, base + " tail"),
        (4L, "shared sentence material here " * 10),
        (5L, "shared sentence material here " * 10 + " coda"))
      q.processAllAvailable()
    } finally q.stop()
    val e0 = got.getOrElse(0L, Set.empty)
    val e1 = got.values.flatten.toSet -- e0
    assert(e0.isEmpty, s"unrelated docs must not pair: $e0")
    assert(e1.contains((1L, 3L)),
      s"cross-epoch near-dup must surface via the persisted index: $e1")
    assert(e1.contains((4L, 5L)),
      s"same-epoch near-dups must surface via new-vs-new: $e1")
    assert(!e1.exists(p => p._1 == 2L || p._2 == 2L),
      s"the unrelated doc must stay unpaired: $e1")
    // the index is a real graft table extended per epoch: both ingests
    // committed (seed base + one extension version)
    assert(graft.streaming.CdcMergeSink.versions(s"$work/idx").nonEmpty)
  }

  test("streaming image dedup sink: cross-epoch re-encode pairs via the fingerprint index") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.multimodal.{MediaRecord, Multimodal}
    val work = java.nio.file.Files.createTempDirectory("graft-imgs").toString
    val imgs = Multimodal.fromDocuments(
      Tables.documents(spark, sf()).where(col("doc_id").isin(0L, 3L, 6L)))
      .collect().map(m => m.media_id -> m).toMap
    def reenc(id: Long, newId: Long): MediaRecord = {
      val one = Seq(imgs(id)).toDS()
      Multimodal.reencodeImages(one, newId - id).head()
    }
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Int)]]
    val in = MemoryStream[MediaRecord]
    val q = Streams.imageDedupSink(in.toDF(), s"$work/idx", s"$work/cp") {
      (pairs, epoch) => got.synchronized {
        got(epoch) = pairs.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      }
    }
    try {
      // epoch 0: two distinct noise images — no pairs
      in.addData(imgs(0L), imgs(3L))
      q.processAllAvailable()
      // epoch 1: a re-encode of image 0 (cross-epoch, via the index) +
      // a fresh image and ITS re-encode (within-epoch pair)
      in.addData(reenc(0L, 100000L), imgs(6L), reenc(6L, 100006L))
      q.processAllAvailable()
    } finally q.stop()
    val e0 = got.getOrElse(0L, Set.empty)
    val e1 = got.values.flatten.toSet -- e0
    assert(e0.isEmpty, s"distinct noise images must not pair: $e0")
    assert(e1.contains((0L, 100000L, 0)),
      s"cross-epoch re-encode must pair at distance 0 via the index: $e1")
    assert(e1.contains((6L, 100006L, 0)),
      s"within-epoch re-encode must pair via new-vs-new: $e1")
    assert(!e1.exists(p => p._1 == 3L || p._2 == 3L),
      s"the unpaired image must stay unpaired: $e1")
    assert(graft.streaming.CdcMergeSink.versions(s"$work/idx").nonEmpty,
      "the fingerprint index is versioned graft state extended per epoch")
  }

  test("streaming image dedup sink survives corrupt payloads under onError=skip") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.multimodal.{MediaRecord, Multimodal}
    val work = java.nio.file.Files.createTempDirectory("graft-imgc").toString
    val imgs = Multimodal.fromDocuments(
      Tables.documents(spark, sf()).where(col("doc_id").isin(0L, 6L)))
      .collect().map(m => m.media_id -> m).toMap
    def reenc(id: Long, newId: Long): MediaRecord =
      Multimodal.reencodeImages(Seq(imgs(id)).toDS(), newId - id).head()
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val in = MemoryStream[MediaRecord]
    // a scraped-media stream WILL carry corrupt payloads; the sink must
    // quarantine them, not die (and a restart would replay the same
    // corrupt epoch forever under fail)
    val q = Streams.imageDedupSink(in.toDF(), s"$work/idx", s"$work/cp",
      onError = "skip") { (pairs, epoch) =>
      got.synchronized {
        got(epoch) = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    }
    try {
      in.addData(imgs(0L),
        MediaRecord(9001L, "image", Array[Byte](1, 2, 3), "corrupt"))
      q.processAllAvailable()
      in.addData(reenc(0L, 100000L), imgs(6L),
        MediaRecord(9002L, "image", "nope".getBytes, "corrupt"))
      q.processAllAvailable()
    } finally q.stop()
    val all = got.values.flatten.toSet
    assert(all.contains((0L, 100000L)),
      s"cross-epoch pair must still surface around the corrupt rows: $all")
    val corrupt = Set(9001L, 9002L)
    assert(!all.exists(p => corrupt(p._1) || corrupt(p._2)),
      s"corrupt media must never pair: $all")
    // the quarantined ids never entered the persisted index
    assert(spark.read.format("graft").load(s"$work/idx")
      .where(col("doc_id").isin(9001L, 9002L)).isEmpty,
      "null fingerprints must not be committed to the index")
  }

  test("streaming ANN index sink: per-epoch CoW ingest, new vectors servable, replay idempotent") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val work = java.nio.file.Files.createTempDirectory("graft-anns").toString
    val embs = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // seed the index WITHOUT two known vectors, then stream them in
    val seed = embs.where(!col("vec_id").isin(7L, 8L))
    val (cents, books) = graft.operators.Similarity.ivfPqIndexTable(
      spark, seed, s"$work/idx", "embedding", "vec_id", dim = 64,
      nCentroids = 16, numFiles = 8)
    val before = spark.read.format("graft").load(s"$work/idx").count()
    val held = embs.where(col("vec_id").isin(7L, 8L))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)
    val commits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Streams.annIndexSink(
      in.toDF().toDF("vec_id", "embedding"), s"$work/idx", cents, books,
      "embedding", "vec_id", dim = 64, checkpoint = s"$work/cp") {
      (v, e) => commits.synchronized { commits += ((v, e)) }
    }
    try {
      in.addData(held(0)) // epoch 0: vector 7
      q.processAllAvailable()
      in.addData(held(1)) // epoch 1: vector 8
      q.processAllAvailable()
    } finally q.stop()
    assert(commits.size === 2, s"one index commit per non-empty epoch: $commits")
    assert(commits.map(_._1).distinct.size === 2, "distinct index versions")
    val after = spark.read.format("graft").load(s"$work/idx")
    assert(after.count() === before + 2)
    assert(after.where(col("id").isin(7L, 8L)).count() === 2)
    // a near-clone of vector 7 must now serve it at rank 1
    val probe = embs.where(col("vec_id") === 7L)
      .select(col("vec_id") + 1000000L as "vec_id",
        expr("transform(embedding, x -> x + cast(0.001 as float))") as "embedding")
    val got = graft.operators.Similarity.ivfPqTopKGraft(spark, s"$work/idx",
      embs.unionByName(probe), probe, cents, books, "embedding", "vec_id",
      k = 5, dim = 64, nProbe = 4, rerank = 20).collect()
    assert(got.nonEmpty)
    assert(got.minBy(_.getInt(3)).getLong(1) === 7L,
      s"streamed vector must serve at rank 1: ${got.mkString(", ")}")
    // replayed epoch (same rows re-ingested) is byte-idempotent on the index
    graft.operators.Similarity.ivfPqIndexIngest(spark, s"$work/idx",
      spark.createDataFrame(held.toSeq).toDF("vec_id", "embedding"),
      cents, books, "embedding", "vec_id", dim = 64)
    assert(spark.read.format("graft").load(s"$work/idx").count() === before + 2)
  }

  test("bm25IndexSink: streamed docs become servable; replay is idempotent") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    import graft.operators.CorpusPrep
    val work = java.nio.file.Files
      .createTempDirectory("graft-bm25stream").toString
    val seed = Seq(
      (1L, "data data merge other words here"),
      (2L, "window merge data something else")).toDF("doc_id", "text")
    CorpusPrep.bm25SeedIndex(s"$work/idx", seed, "text", "doc_id")
    val commits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val in = MemoryStream[(Long, String)]
    val q = Streams.bm25IndexSink(
      in.toDF().toDF("doc_id", "text"), s"$work/idx", "text", "doc_id",
      checkpoint = s"$work/cp") {
      (v, e) => commits.synchronized { commits += ((v, e)) }
    }
    val late = (3L, "data data data window heavy late arrival")
    try {
      in.addData(late)
      q.processAllAvailable()
      in.addData((4L, "irrelevant filler text only"))
      q.processAllAvailable()
    } finally q.stop()
    assert(commits.size === 2, s"one commit per non-empty epoch: $commits")
    // the streamed corpus now serves identically to a batch recompute
    val all = seed.unionByName(Seq(late, (4L, "irrelevant filler text only"))
      .toDF("doc_id", "text"))
    val batch = CorpusPrep.bm25TopK(all, "text", "doc_id",
      Seq("data", "window"), 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val served = CorpusPrep.bm25TopKIndexed(spark, s"$work/idx",
      Seq("data", "window"), 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.toSeq === batch.toSeq)
    assert(served.head._1 === 3L, "the streamed heavy doc must lead")
    // replayed epoch re-ingests the same keys — index state unchanged
    val before = spark.read.format("graft").load(s"$work/idx/postings").count()
    CorpusPrep.bm25IndexIngest(s"$work/idx",
      Seq(late).toDF("doc_id", "text"), "text", "doc_id"): Unit
    assert(spark.read.format("graft").load(s"$work/idx/postings").count()
      === before)
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[Streams.UserEvent]
    val q = Streams.runningTotals(in.toDS())
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    try {
      in.addData(Streams.UserEvent(1L, 1.5), Streams.UserEvent(1L, 2.5))
      q.processAllAvailable()
      in.addData(Streams.UserEvent(1L, 1.0), Streams.UserEvent(2L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("totals").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // last emission per user reflects the full running total
      val last = rows.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      assert(last(1L) === ((1L, 3L, 5.0)))
      assert(last(2L) === ((2L, 1L, 7.0)))
    } finally q.stop()
  }

  test("running totals idle-timeout eviction emits final state and drops it") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.TestGroupState
    // the engine only fires processing-time timeouts in a long-running
    // query, so the transition function is driven directly (TestGroupState)
    val fn = Streams.updateTotals(Some("1 hour")) _

    // accumulate into fresh state: timeout must be armed
    val s1 = TestGroupState.create[Streams.UserTotals](
      Optional.empty[Streams.UserTotals](),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val out1 = fn(1L, Iterator(Streams.UserEvent(1L, 2.0), Streams.UserEvent(1L, 3.0)), s1)
    assert(out1 === Streams.UserTotals(1L, 2L, 5.0))
    assert(s1.get === out1)
    assert(s1.getTimeoutTimestampMs.isPresent) // idle timeout armed

    // timed-out call: final totals emitted once, state removed
    val s2 = TestGroupState.create[Streams.UserTotals](
      Optional.of(Streams.UserTotals(1L, 2L, 5.0)),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      99999999L, Optional.empty[Long](), hasTimedOut = true)
    val out2 = fn(1L, Iterator.empty, s2)
    assert(out2 === Streams.UserTotals(1L, 2L, 5.0))
    assert(s2.isRemoved)
  }

  test("streaming funnel: cross-batch progression, expiry re-anchor, repeat conversion") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val events = in.toDF().toDF("user_id", "event_type", "ts")
      .as[Streams.FunnelEvent]
    val q = Streams.streamingFunnel(events,
        Seq("view", "click", "purchase"), window = "10 minutes")
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      // batch 1: user 1 enters; user 3 enters
      in.addData((1L, "view", ts(0)), (3L, "view", ts(0)))
      q.processAllAvailable()
      assert(spark.table("funnel").count() === 0)
      // batch 2: user 1 clicks (state carried across batches); user 3's
      // click arrives PAST the 10-minute window -> dropped
      in.addData((1L, "click", ts(5)), (3L, "click", ts(15)))
      q.processAllAvailable()
      assert(spark.table("funnel").count() === 0)
      // batch 3: user 1 converts; user 3 re-anchors on a fresh view and
      // converts inside the new window — all in one batch
      in.addData((1L, "purchase", ts(9)),
        (3L, "view", ts(20)), (3L, "click", ts(21)), (3L, "purchase", ts(22)))
      q.processAllAvailable()
      val got = spark.table("funnel")
        .select(col("user_id"),
          date_format(col("anchor"), "HH:mm").as("a"),
          date_format(col("completed"), "HH:mm").as("c"),
          col("duration_micros"))
        .as[(Long, String, String, Long)].collect().toSet
      assert(got === Set(
        (1L, "10:00", "10:09", 9L * 60 * 1000000),
        (3L, "10:20", "10:22", 2L * 60 * 1000000)))
      // batch 4: a converted user is immediately eligible again
      in.addData((1L, "view", ts(30)), (1L, "click", ts(31)),
        (1L, "purchase", ts(32)))
      q.processAllAvailable()
      assert(spark.table("funnel").where(col("user_id") === 1L).count() === 2)
    } finally q.stop()
  }

  test("streaming anomalies: stream == batch row for row across micro-batches") {
    val s = spark; import s.implicits._
    implicit val ctx = s.sqlContext
    def ev(u: Long, i: Long, v: Double) =
      Streams.MetricEvent(u, i, ts(i.toInt), v)
    // deterministic series, one spike per user, flags must agree with
    // the batch window operator exactly — including the cold start and
    // the ring handoff across micro-batch boundaries
    val all = (0L until 30L).flatMap { i =>
      Seq(ev(1L, i, if (i == 25) 99.0 else 10.0 + (i % 3)),
        ev(2L, i, if (i == 27) 199.0 else 5.0 + (i % 5)))
    }
    val in = MemoryStream[Streams.MetricEvent]
    val q = Streams.streamingAnomalies(in.toDS(),
        lookback = 10, kSigma = 3, minPrior = 6)
      .writeStream.format("memory").queryName("anoms")
      .outputMode("append").start()
    try {
      all.grouped(20).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("anoms").as[Streams.AnomalyFlag].collect()
        .map(f => (f.user_id, f.event_id) ->
          ((f.v_scaled, f.n_prior, f.is_anomaly))).toMap
      val batch = graft.operators.EventAnalytics.rollingAnomalies(
          all.toDF(), "user_id", "ts", "event_id", "value",
          lookback = 10, kSigma = 3, minPrior = 6)
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("event_id")) ->
          ((r.getAs[Long]("v_scaled"), r.getAs[Long]("n_prior"),
            r.getAs[Int]("is_anomaly")))).toMap
      assert(streamed.size === all.size)
      assert(streamed === batch, "stream and batch flags must be identical")
      assert(streamed((1L, 25L))._3 === 1 && streamed((2L, 27L))._3 === 1)
    } finally q.stop()
  }
}
