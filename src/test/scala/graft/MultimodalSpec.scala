package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Real-decoder multimodal pipeline: payloads are genuine PNG / WAV /
  * PNG-frame-container bytes and features come from JDK codecs
  * (ImageIO / AudioSystem), checked against the generator's ground truth. */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.fromDocuments(Tables.documents(spark, sf()).where(col("doc_id") < 60))

  test("decoded dimensions match the generator ground truth for every kind") {
    val rows = Multimodal.extractFeatures(media).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, kind) = (r.getLong(0), r.getString(1))
      val (w, h, n) = (r.getInt(3), r.getInt(4), r.getInt(5))
      kind match {
        case "image" =>
          assert((w, h) === Multimodal.imageDims(id), s"image $id")
          assert(n === 1)
        case "audio" =>
          assert((w, h) === ((0, 0)))
          assert(n === Multimodal.audioSamples(id), s"audio $id")
        case "video" =>
          assert((w, h) === Multimodal.videoDims(id), s"video $id")
          assert(n === Multimodal.videoFrames(id), s"video $id")
      }
    }
  }

  test("decode is a real decoder: garbage payloads are rejected") {
    intercept[Exception](Multimodal.decode("image", Array[Byte](1, 2, 3)))
    intercept[Exception](Multimodal.decode("audio", Array[Byte](82, 73, 70, 70)))
    intercept[Exception](Multimodal.decode("video", "GVIDxxxx".getBytes))
  }

  test("n_bytes is the payload length; entropy bounds hold") {
    val feats = Multimodal.extractFeatures(media)
    val raw = media.collect().map(m => m.media_id -> m.payload.length.toLong).toMap
    feats.collect().foreach { r =>
      assert(r.getLong(2) === raw(r.getLong(0)))
      val e = r.getDouble(6)
      assert(e >= 0.0 && e <= 8.0)
    }
  }

  test("byte entropy ground truth: constant=0, uniform=8") {
    assert(Multimodal.byteEntropy(Array.fill[Byte](1024)(7)) === 0.0)
    val uniform = Array.tabulate[Byte](2560)(i => (i % 256).toByte)
    assert(math.abs(Multimodal.byteEntropy(uniform) - 8.0) < 1e-9)
    assert(Multimodal.byteEntropy(Array.emptyByteArray) === 0.0)
  }

  test("sampleFrames emits decodable PNG frames at stride positions") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) % 2 === 0)
      val png = r.getAs[Array[Byte]](2)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null, s"frame of media $id not decodable")
      assert((img.getWidth, img.getHeight) === Multimodal.videoDims(id))
    }
  }

  test("extraction is a narrow map: no exchange in the plan") {
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("resizeImages re-encodes real PNGs at the target dims, narrow map") {
    val out = Multimodal.resizeImages(media, 16, 12)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      // source dims are the generator's ground truth for the image kind
      assert((r.getInt(1), r.getInt(2)) === Multimodal.imageDims(id))
      assert((r.getInt(3), r.getInt(4)) === (16, 12))
      // the payload is a REAL decodable PNG of exactly the target size
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](5)))
      assert(img != null, s"resized payload of media $id not decodable")
      assert((img.getWidth, img.getHeight) === (16, 12))
    }
    // only image rows resize; audio/video payloads are filtered, not mangled
    assert(rows.length === media.filter(_.kind == "image").count().toInt)
    intercept[IllegalArgumentException] {
      Multimodal.resizeImages(media, 0, 12)
    }
  }

  // ---- perceptual image hashing / image near-dup -----------------------

  /** Smooth radial-gradient PNG in scale-relative coordinates — the SAME
    * scene at any resolution, so perceptual hashes should agree across
    * sizes (noise fixtures are the perceptual-hash worst case). */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val dx = (x + 0.5) / w - 0.5
      val dy = (y + 0.5) / h - 0.5
      val v = math.max(0, math.min(255,
        (255 * (1.0 - 2.0 * math.sqrt(dx * dx + dy * dy))).toInt))
      img.setRGB(x, y, v * 0x010101)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Pure-Scala reference hashes over a raster — the spec-side oracle
    * for the codegen'd expressions. */
  private def refDHash(r: Array[Byte]): Long = {
    var hsh = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if ((r(y * 9 + x + 1) & 0xFF) > (r(y * 9 + x) & 0xFF))
        hsh |= 1L << (y * 8 + x)
    hsh
  }
  private def refAHash(r: Array[Byte]): Long = {
    val px = for (y <- 0 until 8; x <- 0 until 8) yield (r(y * 9 + x) & 0xFF).toLong
    val total = px.sum
    px.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      if (p * 64L > total) acc | (1L << i) else acc }
  }
  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("image hash expressions match the Scala reference; wrong-length raster is null") {
    val s = spark; import s.implicits._
    val rasters = Multimodal.grayRasters(media).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rasters.nonEmpty && rasters.values.forall(_.length === 72))
    val got = Multimodal.imageHashes(media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.foreach { case (id, (d, a)) =>
      assert(d === refDHash(rasters(id)), s"dhash of $id")
      assert(a === refAHash(rasters(id)), s"ahash of $id")
    }
    // phash: the codegen'd column equals the shared fixed-point kernel
    // over the 16x16 pHash raster, and differs from dhash/ahash (a
    // genuinely distinct fingerprint)
    val rasters16 = Multimodal.grayRasters(media).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("raster16")).toMap
    assert(rasters16.values.forall(_.length === graft.plans.ImageHash.PRasterLen))
    val ph = Multimodal.imageHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    ph.foreach { case (id, p) =>
      assert(p === graft.plans.ImagePHash.hash(rasters16(id)), s"phash of $id")
    }
    assert(ph.exists { case (id, p) =>
      p != got(id)._1 && p != got(id)._2 },
      "phash must be a distinct fingerprint, not an alias of dhash/ahash")
    graft.plans.ImageDHash.register(s)
    graft.plans.ImageAHash.register(s)
    graft.plans.ImagePHash.register(s)
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("raster").select(
      call_function(graft.plans.ImageDHash.name, col("raster")).as("d"),
      call_function(graft.plans.ImageAHash.name, col("raster")).as("a"),
      call_function(graft.plans.ImagePHash.name, col("raster")).as("p"))
      .head()
    assert(bad.isNullAt(0) && bad.isNullAt(1) && bad.isNullAt(2))
  }

  test("pHash is crop-stable where dHash flips: DCT low frequencies survive a 10% crop") {
    val s = spark; import s.implicits._
    import graft.multimodal.MediaRecord
    // a spectrally RICH scene (1/f²-weighted low-frequency components
    // with varied phases, like a real photo — a smooth radial gradient
    // would be the degenerate case where most DCT coefficients sit at
    // zero and ANY median-threshold hash thrashes around its boundary)
    def scenePng(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val fx = (x + 0.5) / w; val fy = (y + 0.5) / h
        var sum = 0.0
        for (u <- 0 to 3; v <- 0 to 3; if u + v >= 1) {
          val p = (u * 7 + v * 13) % 6
          sum += 90.0 / ((1 + u + v) * (1 + u + v)) *
            math.cos(2 * math.Pi * u * fx + p) *
            math.cos(2 * math.Pi * v * fy + p * 0.7)
        }
        val vv = math.max(0, math.min(255, (128 + sum).toInt))
        img.setRGB(x, y, vv * 0x010101)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def cropped(png: Array[Byte], crop: Int): Array[Byte] = {
      val full = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      val sub = full.getSubimage(crop, crop,
        full.getWidth - 2 * crop, full.getHeight - 2 * crop)
      val copy = new java.awt.image.BufferedImage(
        sub.getWidth, sub.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = copy.createGraphics()
      try g.drawImage(sub, 0, 0, null): Unit finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(copy, "png", bos)
      bos.toByteArray
    }
    val base = scenePng(60, 60)
    val pairCorpus = Seq(
      MediaRecord(1L, "image", base, "t"),
      MediaRecord(2L, "image", cropped(base, 3), "t")).toDS()
    val hs = Multimodal.imageHashes(pairCorpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val dDist = ham(hs(1L)._1, hs(2L)._1)
    val pDist = ham(hs(1L)._2, hs(2L)._2)
    assert(pDist <= 8, s"phash must survive the crop, moved $pDist bits")
    assert(pDist < dDist,
      s"crop robustness is phash's reason to exist: phash=$pDist dhash=$dDist")
  }

  test("perceptual hashes are resize- and re-encode-stable on smooth images") {
    val s = spark; import s.implicits._
    import graft.multimodal.MediaRecord
    // the same smooth scene rendered at three resolutions
    val scene = Seq(
      MediaRecord(1L, "image", gradientPng(64, 64), "t"),
      MediaRecord(2L, "image", gradientPng(32, 32), "t"),
      MediaRecord(3L, "image", gradientPng(48, 36), "t")).toDS()
    val hs = Multimodal.imageHashes(scene).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (i <- Seq(2L, 3L)) {
      assert(ham(hs(1L)._1, hs(i)._1) <= 4, s"dhash 1 vs $i")
      assert(ham(hs(1L)._2, hs(i)._2) <= 4, s"ahash 1 vs $i")
    }
    // bilinear-resized copy of a real fixture image stays nearby too
    val one = media.filter(m => m.kind == "image" && m.media_id == 0L)
    val resizedPayload = Multimodal.resizeImages(one, 24, 24)
      .head().getAs[Array[Byte]]("payload")
    val both = one.union(Seq(
      MediaRecord(500L, "image", resizedPayload, "t")).toDS())
    val h2 = Multimodal.imageHashes(both).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ham(h2(0L), h2(500L)) <= 12,
      s"ahash across a bilinear resize of a noise image: ${ham(h2(0L), h2(500L))}")
    // garbage payloads are rejected, not silently hashed
    val garbage = Seq(MediaRecord(9L, "image", Array[Byte](9, 9, 9), "t")).toDS()
    intercept[Exception](Multimodal.imageHashes(garbage).collect())
  }

  test("imageNearDup: re-encoded copies pair at hamming 0, byte-level dedup would miss them, noise images don't pair") {
    val planted = Multimodal.reencodeImages(media, idOffset = 100000L)
    // the bytes really differ (byte-identical dedup finds nothing)...
    val origBytes = media.filter(_.kind == "image").collect()
      .map(m => m.media_id -> m.payload).toMap
    planted.collect().foreach { m =>
      assert(!java.util.Arrays.equals(m.payload, origBytes(m.media_id - 100000L)),
        s"re-encode of ${m.media_id} must change bytes")
    }
    // ...but every planted copy pairs with its source at distance 0,
    // and no two distinct noise images pair at this threshold
    val pairs = Multimodal.imageNearDup(media.union(planted), maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val expected = origBytes.keySet.map(id => (id, id + 100000L, 0L))
    assert(pairs.toSet === expected, s"got ${pairs.sorted.toSeq}")

    // the capped form is a no-op here (healthy corpus) with an empty receipt
    val (capped, overflow) = Multimodal.imageNearDupCapped(
      media.union(planted), maxBucketWidth = 1000, maxHamming = 2)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .toSet === expected)
    assert(overflow.isEmpty)
  }

  test("audioNearDup: re-encoded WAVs pair at hamming 0; the envelope hash is gain-invariant") {
    val s = spark; import s.implicits._
    import graft.multimodal.MediaRecord
    val audio = media.filter(_.kind == "audio")
    val planted = Multimodal.reencodeAudio(audio, idOffset = 100000L)
    val origBytes = audio.collect().map(m => m.media_id -> m.payload).toMap
    planted.collect().foreach { m =>
      assert(!java.util.Arrays.equals(m.payload, origBytes(m.media_id - 100000L)),
        s"re-encode of ${m.media_id} must change bytes")
      // the spliced LIST chunk keeps the WAV decodable
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      try assert(in.getFrameLength ===
        Multimodal.audioSamples(m.media_id - 100000L).toLong)
      finally in.close()
    }
    // fixture audio clips are one sine family: neighbors (phase/length
    // a few samples apart) land at envelope Hamming 1-2 — GENUINE
    // near-dups the hash correctly surfaces; the exact-plant assertion
    // uses maxHamming = 0 (re-encodes are distance exactly 0)
    val pairs = Multimodal.audioNearDup(audio.union(planted), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val expected = origBytes.keySet.map(id => (id, id + 100000L, 0L))
    assert(pairs.toSet === expected, s"got ${pairs.sorted.toSeq}")

    // gain invariance: halve the PCM amplitude of one clip — the
    // min-max-normalized envelope keeps the gradient-sign pattern
    val one = audio.filter(_.media_id == 1L).head()
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(one.payload))
    val (fmt, pcm) = try (in.getFormat, in.readAllBytes()) finally in.close()
    val half = pcm.clone()
    for (i <- 0 until pcm.length / 2) {
      val v = (((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF)).toShort / 2).toShort
      half(2 * i) = (v & 0xff).toByte
      half(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(half), fmt, half.length / 2),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val pairCorpus = Seq(one,
      MediaRecord(900L, "audio", bos.toByteArray, "t")).toDS()
    val hs = Multimodal.audioHashes(pairCorpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ham(hs(1L), hs(900L)) <= 2,
      s"gain shift moved the envelope hash by ${ham(hs(1L), hs(900L))} bits")
  }

  test("videoNearDup: per-frame re-encoded containers pair at hamming 0, noise videos don't") {
    val video = media.filter(_.kind == "video")
    val planted = Multimodal.reencodeVideo(video, idOffset = 100000L)
    val origBytes = video.collect().map(m => m.media_id -> m.payload).toMap
    planted.collect().foreach { m =>
      assert(!java.util.Arrays.equals(m.payload, origBytes(m.media_id - 100000L)))
      // still a well-formed container with the same frame count
      val (w, h, n) = Multimodal.decode("video", m.payload)
      assert(n === Multimodal.videoFrames(m.media_id - 100000L))
      assert((w, h) === Multimodal.videoDims(m.media_id - 100000L))
    }
    val pairs = Multimodal.videoNearDup(video.union(planted), maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val expected = origBytes.keySet.map(id => (id, id + 100000L, 0L))
    assert(pairs.toSet === expected, s"got ${pairs.sorted.toSeq}")
  }

  // ---- decode-error policy (onError = fail|skip|flag) -------------------

  private def corruptBatch = {
    val s = spark; import s.implicits._
    import graft.multimodal.MediaRecord
    media.union(Seq(
      MediaRecord(9001L, "image", Array[Byte](1, 2, 3, 4), "corrupt"),
      MediaRecord(9002L, "audio", Array[Byte](82, 73, 70, 70), "corrupt"),
      MediaRecord(9003L, "video", "GVIDxxxxgarbage".getBytes, "corrupt")).toDS())
  }

  test("onError=fail (default): one corrupt payload in a healthy batch still aborts") {
    intercept[Exception](Multimodal.extractFeatures(corruptBatch).collect())
    intercept[Exception](Multimodal.grayRasters(corruptBatch).collect())
    intercept[Exception](Multimodal.audioEnvelopes(corruptBatch).collect())
    intercept[Exception](Multimodal.frameRasters(corruptBatch).collect())
    intercept[IllegalArgumentException](
      Multimodal.extractFeatures(media, onError = "quarantine"))
  }

  test("onError=flag: every row returns, corrupt ones flagged, quarantine counted") {
    val flagged = Multimodal.extractFeatures(corruptBatch, onError = "flag")
    val rows = flagged.collect()
    assert(rows.length === corruptBatch.count().toInt,
      "flag mode must return EVERY input row")
    val bad = rows.filter(!_.isNullAt(7))
    assert(bad.map(_.getLong(0)).toSet === Set(9001L, 9002L, 9003L))
    bad.foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6),
        "flagged rows carry null feature fields")
    }
    // healthy rows are bit-identical to a healthy-only fail-mode run
    val healthy = Multimodal.extractFeatures(media).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    assert(rows.filter(_.isNullAt(7))
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toSet === healthy)
    // the counts receipt
    val q = Multimodal.quarantineStats(flagged).head()
    assert(q.getLong(0) === rows.length.toLong)
    assert(q.getLong(1) === rows.length - 3L)
    assert(q.getLong(2) === 3L)

    // per-modality flag lanes: raster/envelope/frame paths each flag
    // their own corrupt payload and keep the healthy ones
    val gr = Multimodal.grayRasters(corruptBatch, onError = "flag").collect()
    assert(gr.filter(!_.isNullAt(3)).map(_.getLong(0)).toSeq === Seq(9001L))
    assert(gr.filter(!_.isNullAt(3)).forall(r => r.isNullAt(1) && r.isNullAt(2)))
    val ae = Multimodal.audioEnvelopes(corruptBatch, onError = "flag").collect()
    assert(ae.filter(!_.isNullAt(2)).map(_.getLong(0)).toSeq === Seq(9002L))
    val fr = Multimodal.frameRasters(corruptBatch, onError = "flag").collect()
    val frBad = fr.filter(!_.isNullAt(3))
    assert(frBad.map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((9003L, -1)))
    // videoHashes groups the quarantined video to (null dhash, error)
    val vh = Multimodal.videoHashes(corruptBatch, onError = "flag").collect()
    val vhBad = vh.filter(!_.isNullAt(3))
    assert(vhBad.map(_.getLong(0)).toSeq === Seq(9003L))
    assert(vhBad.forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("onError=skip: corrupt rows dropped, schema unchanged, dedup completes") {
    val feats = Multimodal.extractFeatures(corruptBatch, onError = "skip")
    assert(feats.schema.fieldNames.toSeq ===
      Multimodal.extractFeatures(media).schema.fieldNames.toSeq,
      "skip keeps the historical schema")
    assert(feats.count() === media.count())
    assert(!feats.select("media_id").collect().map(_.getLong(0))
      .exists(_ >= 9000L))
    // the whole near-dup family completes over a corpus with corrupt
    // media — the round-8 scale-killer (one bad PNG aborting a 100-TB
    // dedup job) is gone; pairs match the healthy-only run
    val healthyPairs = Multimodal.imageNearDup(media, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq("skip", "flag").foreach { mode =>
      val p = Multimodal.imageNearDup(corruptBatch, maxHamming = 2,
        onError = mode).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p === healthyPairs, s"mode=$mode")
    }
    assert(Multimodal.audioNearDup(corruptBatch, maxHamming = 0,
      onError = "skip").collect().forall(r => r.getLong(0) < 9000L))
    assert(Multimodal.videoNearDup(corruptBatch, maxHamming = 2,
      onError = "skip").collect().forall(r => r.getLong(0) < 9000L))
  }

  test("audio format guard: non-PCM16LE-mono WAVs convert or flag, never silently wrong") {
    val s = spark; import s.implicits._
    import graft.multimodal.MediaRecord
    import javax.sound.sampled._
    // an 8-bit unsigned WAV: decodable, but the raw stream read as PCM16
    // would produce a silently wrong envelope — the JDK codec converts it
    val u8 = Array.tabulate[Byte](256)(i =>
      ((math.sin(i * 0.1) * 100).toInt + 128).toByte)
    val u8fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val bos8 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(u8), u8fmt, 256L),
      AudioFileFormat.Type.WAVE, bos8)
    // a STEREO WAV: no JDK downmix exists — must reject loudly, not
    // interleave channels into the amplitude windows
    val st = new Array[Byte](256 * 4)
    val stFmt = new AudioFormat(8000f, 16, 2, true, false)
    val bosSt = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(st), stFmt, 256L),
      AudioFileFormat.Type.WAVE, bosSt)
    val mixed = Seq(
      MediaRecord(1L, "audio", bos8.toByteArray, "u8"),
      MediaRecord(2L, "audio", bosSt.toByteArray, "stereo")).toDS()
    intercept[Exception](Multimodal.audioEnvelopes(mixed).collect())
    val out = Multimodal.audioEnvelopes(mixed, onError = "flag").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2), "u8 mono converts cleanly")
    assert(byId(1L).getAs[Array[Byte]](1).length ===
      graft.plans.ImageHash.RasterLen)
    assert(!byId(2L).isNullAt(2) && byId(2L).getString(2).contains("mono"),
      "stereo is rejected with a loud, specific error")
  }

  test("sceneChanges: one cut at the splice, none within a scene") {
    val s = spark; import s.implicits._
    val ids = Seq(3L, 10L, 17L).toDF("doc_id")
    val two = Multimodal.sceneFixtureVideos(ids, scenes = 2)
    val out = Multimodal.sceneChanges(two)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    for (id <- Seq(3L, 10L, 17L)) {
      val n1 = (2 + id % 6).toInt
      val n2 = (2 + (id * 31 + 7) % 6).toInt
      assert(out(id) === ((n1 + n2).toLong, 1L, n1),
        s"video $id must cut exactly once, at frame $n1")
    }
    // one-scene controls never cut; an impossible threshold never cuts
    val one = Multimodal.sceneFixtureVideos(ids, scenes = 1)
    assert(Multimodal.sceneChanges(one)
      .collect().forall(r => r.getLong(2) == 0L && r.getInt(3) == -1))
    assert(Multimodal.sceneChanges(two, maxHamming = 63)
      .collect().forall(_.getLong(2) == 0L),
      "hamming can never exceed 63 — threshold 63 must yield zero cuts")
  }
}
