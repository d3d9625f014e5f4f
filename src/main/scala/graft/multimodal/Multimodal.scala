package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media item: binary payload + typed metadata. The engine's
  * multimodal data model is "binary column + metadata struct" — decode is
  * always executor-side, batch-shaped, and schema'd. */
final case class MediaRecord(
    media_id: Long,
    kind: String,          // image | audio | video
    payload: Array[Byte],
    source: String)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    byte_entropy: Double)

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, processed by batched executor-side extraction.
  *
  * Decode is REAL, using only JDK codecs (no extra dependencies):
  *  - image  → PNG, decoded with `javax.imageio.ImageIO`;
  *  - audio  → WAV (RIFF, PCM16 mono 8 kHz), parsed with
  *             `javax.sound.sampled.AudioSystem`;
  *  - video  → a length-prefixed container of PNG frames ("GVID" header);
  *             the walk decodes the first frame with ImageIO and counts
  *             the rest from the container structure.
  *
  * The shape is what matters at scale: decode cost dominates, so the
  * operator must be a narrow per-partition map (no shuffle), which
  * `mapPartitions` over a typed Dataset guarantees; batches amortize codec
  * setup without holding a whole partition in memory. Swapping in a
  * heavier codec library changes `decode` only — the Spark plan is
  * unchanged.
  */
object Multimodal {

  // ---- deterministic media synthesis (the fixture side) ---------------

  /** Deterministic dimensions/frame counts per doc_id — the ground truth a
    * SQL oracle can recompute, so a correct decode is externally
    * checkable: imageDims(id) must round-trip through PNG encode →
    * ImageIO decode. */
  def imageDims(id: Long): (Int, Int) =
    ((16 + id % 32).toInt, (16 + (id / 32) % 32).toInt)
  def audioSamples(id: Long): Int = (64 + id % 192).toInt
  def videoDims(id: Long): (Int, Int) =
    ((8 + id % 16).toInt, (8 + (id / 16) % 16).toInt)
  def videoFrames(id: Long): Int = (2 + id % 6).toInt

  private def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = seed * 6364136223846793005L + (y.toLong * w + x) * 1442695040888963407L
        v ^= v >>> 33
        img.setRGB(x, y, (v & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(nSamples: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (math.sin(i * 0.1 + (seed % 97)) * 12000).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val VideoMagic = Array[Byte]('G', 'V', 'I', 'D')

  private def videoBytes(frames: Int, w: Int, h: Int, seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(VideoMagic)
    writeInt(bos, frames)
    var f = 0
    while (f < frames) {
      val png = pngBytes(w, h, seed + f)
      writeInt(bos, png.length)
      bos.write(png)
      f += 1
    }
    bos.toByteArray
  }

  private def writeInt(bos: ByteArrayOutputStream, v: Int): Unit = {
    bos.write((v >>> 24) & 0xff); bos.write((v >>> 16) & 0xff)
    bos.write((v >>> 8) & 0xff); bos.write(v & 0xff)
  }
  private def readInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  /** Manufacture a media table from the documents fixture: kind
    * round-robins image/audio/video; payloads are REAL encoded media
    * (PNG / WAV / PNG-frame container) with dimensions derived
    * deterministically from doc_id. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (id, source) =>
        val payload = (id % 3) match {
          case 0 =>
            val (w, h) = imageDims(id); pngBytes(w, h, id)
          case 1 => wavBytes(audioSamples(id), id)
          case _ =>
            val (w, h) = videoDims(id); videoBytes(videoFrames(id), w, h, id)
        }
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRecord(id, kind, payload, source)
      }
  }

  // ---- decode-error policy ---------------------------------------------

  /** The multimodal family's decode-error policy. A 100-TB web-scraped
    * corpus GUARANTEES corrupt media; a policy where one truncated PNG
    * in a billion aborts the whole dedup job (and deterministically
    * re-aborts on retry) cannot finish a real run. The engine's
    * contract is that degraded paths are visible, never fatal-or-silent
    * (the passthrough-telemetry discipline,
    * reference ParquetRewriter.java merge metrics):
    *
    *  - `"fail"` (default) — any undecodable payload throws and kills
    *    the job. Right at fixture scale: garbage is rejected loudly.
    *  - `"skip"` — undecodable payloads are dropped; the output schema
    *    is unchanged. Pair with [[quarantineStats]] on a flagged run
    *    when drop counts must be audited.
    *  - `"flag"` — EVERY input row comes back: undecodable payloads
    *    carry null data columns and a non-null `error` string (class +
    *    message), decodable ones `error = null`. The auditable-gate
    *    shape [[graft.corpus.CorpusPrep.c4Filter]]/`gopherPass` follow —
    *    downstream hash/join paths drop the null rows, the quarantine
    *    stays queryable.
    */
  private[graft] def checkMode(onError: String): Unit =
    require(onError == "fail" || onError == "skip" || onError == "flag",
      s"onError must be fail|skip|flag, got '$onError'")

  /** Run one payload's decode under the policy: Right(value), or
    * Left(error) when a non-fatal decode failure is quarantined. */
  private def guarded[T](onError: String)(body: => T): Either[String, T] =
    if (onError == "fail") Right(body)
    else try Right(body) catch {
      case scala.util.control.NonFatal(e) =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** The counts receipt for a `flag`-mode run: one row —
    * (n_rows, n_ok, n_quarantined) — from the `error` column. Per-error
    * breakdowns are one `groupBy("error")` away on the same output. */
  def quarantineStats(flagged: DataFrame): DataFrame =
    flagged.agg(count(lit(1)).as("n_rows"),
      count(when(col("error").isNull, 1)).as("n_ok"),
      count(col("error")).as("n_quarantined"))

  // ---- real decode ----------------------------------------------------

  /** Decode a payload into (width, height, n_frames) with JDK codecs. */
  private[graft] def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
    kind match {
      case "image" =>
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        require(img != null, "payload is not a decodable image")
        (img.getWidth, img.getHeight, 1)
      case "audio" =>
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        try (0, 0, in.getFrameLength.toInt) finally in.close()
      case "video" =>
        require(payload.length >= 8 &&
          VideoMagic.indices.forall(i => payload(i) == VideoMagic(i)),
          "payload is not a GVID container")
        val declared = readInt(payload, 4)
        var off = 8; var count = 0
        var dims: (Int, Int) = (0, 0)
        while (off < payload.length) {
          require(off + 4 <= payload.length, "truncated frame-length slot")
          val len = readInt(payload, off)
          // a corrupt length must error, not hang: len <= 0 would make
          // `off` stop advancing (len == -4 loops forever), and an
          // oversized len would walk past the payload
          require(len > 0 && off.toLong + 4 + len <= payload.length,
            s"corrupt frame length $len at offset $off")
          if (count == 0) { // decode the first frame for dimensions
            val img = ImageIO.read(
              new ByteArrayInputStream(payload, off + 4, len))
            require(img != null, "frame 0 is not a decodable image")
            dims = (img.getWidth, img.getHeight)
          }
          off += 4 + len
          count += 1
        }
        require(count == declared, s"container declares $declared frames, found $count")
        (dims._1, dims._2, count)
      case other =>
        throw new IllegalArgumentException(s"unknown media kind: $other")
    }

  /** Batched per-partition feature extraction — the decode/resize/
    * frame-sample slot. Batches of `batchSize` records are materialized at
    * a time (mirroring arrow-batch processing) so the decoder amortizes
    * setup without holding a whole partition in memory. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64,
                      onError: String = "fail"): DataFrame = {
    checkMode(onError)
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          guarded(onError) {
            val (w, h, frames) = decode(m.kind, m.payload)
            (m.media_id, m.kind, m.payload.length.toLong,
              w, h, frames, byteEntropy(m.payload), null: String)
          } match {
            case Right(r) => Some(r)
            case Left(_) if onError == "skip" => None
            case Left(e) =>
              Some((m.media_id, m.kind, m.payload.length.toLong,
                0, 0, 0, 0.0, e))
          }
        }
      }
    }.toDF("media_id", "kind", "n_bytes", "width", "height", "n_frames",
      "byte_entropy", "error")
    // fail/skip keep the historical MediaFeatures schema; flag carries
    // the quarantine column (null data fields on flagged rows)
    if (onError == "flag")
      rows.select(col("media_id"), col("kind"), col("n_bytes"),
        when(col("error").isNull, col("width")).as("width"),
        when(col("error").isNull, col("height")).as("height"),
        when(col("error").isNull, col("n_frames")).as("n_frames"),
        when(col("error").isNull, col("byte_entropy")).as("byte_entropy"),
        col("error"))
    else rows.drop("error")
  }

  /** Shannon entropy of the byte histogram. */
  private[graft] def byteEntropy(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    val counts = new Array[Long](256)
    payload.foreach(b => counts(b & 0xFF) += 1)
    val n = payload.length.toDouble
    var e = 0.0
    counts.foreach { c =>
      if (c > 0) { val p = c / n; e -= p * math.log(p) / math.log(2) }
    }
    math.rint(e * 1e6) / 1e6
  }

  /** REAL image resize for "image" payloads: decode (ImageIO), scale to
    * `w`×`h` (Graphics2D bilinear — the JDK's actual raster scaler, no
    * stub), re-encode PNG. Batched narrow map like [[extractFeatures]]:
    * no exchange, output rows ∝ input images, per-row memory bounded by
    * one decoded raster. Output payloads are themselves decodable PNGs
    * of exactly the target dimensions — the property the spec pins. */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int,
                   batchSize: Int = 64,
                   onError: String = "fail"): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    checkMode(onError)
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          guarded(onError) {
            val src = ImageIO.read(new ByteArrayInputStream(m.payload))
            require(src != null, "payload is not a decodable image")
            val dst = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, w, h, null): Unit
            } finally g.dispose()
            val bos = new ByteArrayOutputStream()
            ImageIO.write(dst, "png", bos)
            (src.getWidth, src.getHeight, bos.toByteArray)
          } match {
            case Right((sw, sh, p)) =>
              Some((m.media_id, sw, sh, w, h, p, null: String))
            case Left(_) if onError == "skip" => None
            case Left(e) =>
              Some((m.media_id, 0, 0, w, h, null: Array[Byte], e))
          }
        }
      }
    }.toDF("media_id", "src_w", "src_h", "width", "height", "payload", "error")
    if (onError == "flag") rows else rows.drop("error")
  }

  // ---- perceptual image hashing / image near-dup -----------------------

  /** Decode each "image" payload and area-average its luma onto the
    * fixed 9×8 grayscale grid ([[graft.plans.ImageHash]]'s raster
    * contract, 72 unsigned bytes row-major) — the decode stage of the
    * perceptual-hash pipeline. Batched narrow map like
    * [[extractFeatures]]: no exchange, decode cost dominates, output is
    * 72 bytes/row no matter the source size. Area averaging (integer
    * box mean, luma = (77R+150G+29B)>>8) rather than point sampling is
    * what buys resize stability: the cell mean of a downscaled image
    * converges to the cell mean of the original. */
  def grayRasters(media: Dataset[MediaRecord],
                  batchSize: Int = 64,
                  onError: String = "fail"): DataFrame = {
    checkMode(onError)
    val spark = media.sparkSession
    import spark.implicits._
    val gw = graft.plans.ImageHash.GridW
    val gh = graft.plans.ImageHash.GridH
    val pg = graft.plans.ImageHash.PGrid
    val rows = media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          guarded(onError) {
            val img = ImageIO.read(new ByteArrayInputStream(m.payload))
            require(img != null, "payload is not a decodable image")
            // BOTH raster contracts from ONE decode: the 9×8 dedup grid
            // (dHash/aHash) and the 16×16 pHash grid — decode dominates,
            // the second area-average is noise next to it
            (rasterOf(img, gw, gh), rasterOf(img, pg, pg))
          } match {
            case Right((r, r16)) => Some((m.media_id, r, r16, null: String))
            case Left(_) if onError == "skip" => None
            case Left(e) =>
              Some((m.media_id, null: Array[Byte], null: Array[Byte], e))
          }
        }
      }
    }.toDF("media_id", "raster", "raster16", "error")
    if (onError == "flag") rows else rows.drop("error")
  }

  private[graft] def rasterOf(img: java.awt.image.BufferedImage,
                              gw: Int, gh: Int): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh
      val y1 = math.max(y0 + 1, (cy + 1) * h / gh)
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = math.max(x0 + 1, (cx + 1) * w / gw)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) +
              29 * (rgb & 0xFF)) >> 8
            x += 1
          }
          y += 1
        }
        out(cy * gw + cx) = (sum / ((x1 - x0).toLong * (y1 - y0))).toByte
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Perceptual fingerprints for every "image" payload: decode to the
    * shared raster, then the codegen'd [[graft.plans.ImageDHash]] /
    * [[graft.plans.ImageAHash]] kernels. Returns
    * (media_id, dhash, ahash) — 16 bytes of fingerprint per image,
    * however large the source. */
  def imageHashes(media: Dataset[MediaRecord],
                  batchSize: Int = 64,
                  onError: String = "fail"): DataFrame = {
    val spark = media.sparkSession
    graft.plans.ImageDHash.register(spark)
    graft.plans.ImageAHash.register(spark)
    graft.plans.ImagePHash.register(spark)
    val rasters = grayRasters(media, batchSize, onError)
    // hash paths drop the quarantined (null-raster) rows; flag mode
    // still carries them through with null fingerprints + the error.
    // Three fingerprints per image, one decode: dhash (gradient signs —
    // re-encode/brightness robust), ahash (mean threshold — resize
    // workhorse), phash (DCT low-frequency — crop/scale robust where
    // dhash's pixel-adjacent comparisons flip). Join on whichever
    // column matches the threat model; all ride the same Hamming
    // machinery.
    val cols = Seq(col("media_id"),
      when(col("raster").isNotNull,
        call_function(graft.plans.ImageDHash.name, col("raster"))).as("dhash"),
      when(col("raster").isNotNull,
        call_function(graft.plans.ImageAHash.name, col("raster"))).as("ahash"),
      when(col("raster16").isNotNull,
        call_function(graft.plans.ImagePHash.name, col("raster16"))).as("phash")) ++
      (if (onError == "flag") Seq(col("error")) else Nil)
    rasters.select(cols: _*)
  }

  /** Image near-dup pairs — the multimodal member of the dedup family:
    * dHash fingerprints (robust to re-encode and global
    * brightness/contrast shifts; pixel-identical copies hash
    * identically whatever their bytes) joined by the shared Hamming
    * chunk-banding machinery ([[graft.operators.Dedup.hammingPairs]]).
    * Recall is exact for maxHamming <= chunks-1. Output
    * (id_a, id_b, hamming), id_a < id_b.
    *
    * Scale shape: decode is a narrow map; everything after moves 16-byte
    * fingerprint rows — the candidate join never touches a payload. For
    * corpora with degenerate thumbnail clusters (solid-color images all
    * hash to 0L) use [[imageNearDupCapped]]. */
  def imageNearDup(media: Dataset[MediaRecord], maxHamming: Int = 2,
                   chunks: Int = 4, onError: String = "fail"): DataFrame =
    graft.operators.Dedup.hammingPairs(dedupHashInput(media, onError),
      "media_id", "dhash", maxHamming, chunks)

  /** [[imageNearDup]] with the dedup family's hot-bucket guard and
    * overflow-stats visibility contract
    * ([[graft.operators.Dedup.hammingPairsCapped]]). */
  def imageNearDupCapped(media: Dataset[MediaRecord], maxBucketWidth: Int,
                         maxHamming: Int = 2, chunks: Int = 4,
                         onError: String = "fail"): (DataFrame, DataFrame) =
    graft.operators.Dedup.hammingPairsCapped(dedupHashInput(media, onError),
      "media_id", "dhash", maxBucketWidth, maxHamming, chunks)

  /** The near-dup wrappers' fingerprint feed under the decode policy:
    * pairs cannot represent per-media errors, so `flag` and `skip` both
    * drop quarantined media from the JOIN — run [[imageHashes]] with
    * `onError = "flag"` + [[quarantineStats]] when the drop counts must
    * be audited. */
  private def dedupHashInput(media: Dataset[MediaRecord],
                             onError: String): DataFrame = {
    checkMode(onError)
    val mode = if (onError == "flag") "skip" else onError
    imageHashes(media, onError = mode)
  }

  // ---- audio fingerprinting / audio near-dup ---------------------------

  /** Decode each "audio" payload (WAV via AudioSystem) and reduce its
    * PCM16 stream to the SAME 72-byte raster contract the image hashes
    * use ([[graft.plans.ImageHash]]): 72 equal time windows, mean
    * absolute amplitude per window, per-file min–max normalized to
    * unsigned bytes. Normalization makes the envelope GAIN-invariant
    * (volume changes rescale every window together), and dHash over it
    * keys on the energy-gradient SIGN pattern — a chromaprint-style
    * shape fingerprint cheap enough for a narrow map. Integer math
    * throughout (deterministic across runs/hosts). */
  def audioEnvelopes(media: Dataset[MediaRecord],
                     batchSize: Int = 64,
                     onError: String = "fail"): DataFrame = {
    checkMode(onError)
    val spark = media.sparkSession
    import spark.implicits._
    val cells = graft.plans.ImageHash.RasterLen
    val rows = media.filter(_.kind == "audio").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          guarded(onError) {
          val in0 = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(m.payload))
          // the window math below reads PCM16 LITTLE-ENDIAN MONO — an
          // 8-bit, big-endian, or stereo WAV would decode without error
          // and produce a silently WRONG envelope (channels interleave
          // into the amplitude windows). Convert what the JDK's
          // PCM-to-PCM codec can (sample size, sign, endianness);
          // multi-channel has no JDK downmix — reject it loudly.
          val fmt0 = in0.getFormat
          require(fmt0.getChannels == 1,
            s"audio envelope requires mono, got ${fmt0.getChannels} channels")
          val target = new AudioFormat(fmt0.getSampleRate, 16, 1, true, false)
          val in =
            if (fmt0.getSampleSizeInBits == 16 && !fmt0.isBigEndian &&
                fmt0.getEncoding == AudioFormat.Encoding.PCM_SIGNED) in0
            else AudioSystem.getAudioInputStream(target, in0)
          val pcm =
            try in.readAllBytes()
            finally in.close()
          val n = pcm.length / 2 // PCM16 mono little-endian
          require(n > 0, "audio payload holds no samples")
          val env = new Array[Long](cells)
          var c = 0
          while (c < cells) {
            val s0 = c * n / cells
            val s1 = math.max(s0 + 1, (c + 1) * n / cells)
            var sum = 0L
            var i = s0
            while (i < s1) {
              val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF)).toShort
              sum += math.abs(v.toLong)
              i += 1
            }
            env(c) = sum / (s1 - s0)
            c += 1
          }
          val lo = env.min; val hi = env.max
          val span = math.max(1L, hi - lo)
          env.map(e => ((e - lo) * 255L / span).toByte)
          } match {
            case Right(r) => Some((m.media_id, r, null: String))
            case Left(_) if onError == "skip" => None
            case Left(e) => Some((m.media_id, null: Array[Byte], e))
          }
        }
      }
    }.toDF("media_id", "raster", "error")
    if (onError == "flag") rows else rows.drop("error")
  }

  /** Perceptual fingerprints for every "audio" payload: the envelope
    * raster through the SAME codegen'd dHash/aHash kernels the image
    * path uses — one fingerprint algebra across modalities. */
  def audioHashes(media: Dataset[MediaRecord],
                  batchSize: Int = 64,
                  onError: String = "fail"): DataFrame = {
    val spark = media.sparkSession
    graft.plans.ImageDHash.register(spark)
    graft.plans.ImageAHash.register(spark)
    val cols = Seq(col("media_id"),
      when(col("raster").isNotNull,
        call_function(graft.plans.ImageDHash.name, col("raster"))).as("dhash"),
      when(col("raster").isNotNull,
        call_function(graft.plans.ImageAHash.name, col("raster"))).as("ahash")) ++
      (if (onError == "flag") Seq(col("error")) else Nil)
    audioEnvelopes(media, batchSize, onError).select(cols: _*)
  }

  /** Audio near-dup pairs over the envelope dHash — re-encoded and
    * gain-shifted copies collide; the candidate join is the shared
    * Hamming banding ([[graft.operators.Dedup.hammingPairs]]),
    * fingerprints only. */
  def audioNearDup(media: Dataset[MediaRecord], maxHamming: Int = 2,
                   chunks: Int = 4, onError: String = "fail"): DataFrame = {
    checkMode(onError)
    val mode = if (onError == "flag") "skip" else onError
    graft.operators.Dedup.hammingPairs(audioHashes(media, onError = mode),
      "media_id", "dhash", maxHamming, chunks)
  }

  /** Re-encode each "audio" payload: decode to PCM, re-write the WAV,
    * and append a RIFF LIST/INFO metadata chunk (RIFF size patched) —
    * byte-DIFFERENT, sample-IDENTICAL, still a decodable WAV. The audio
    * twin of [[reencodeImages]]. */
  def reencodeAudio(media: Dataset[MediaRecord], idOffset: Long,
                    batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val in = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(m.payload))
          val (fmt, pcm) =
            try (in.getFormat, in.readAllBytes())
            finally in.close()
          val bos = new ByteArrayOutputStream()
          AudioSystem.write(new AudioInputStream(
            new ByteArrayInputStream(pcm), fmt,
            pcm.length / fmt.getFrameSize),
            AudioFileFormat.Type.WAVE, bos)
          MediaRecord(m.media_id + idOffset, m.kind,
            withRiffListChunk(bos.toByteArray, "re-encoded"), m.source)
        }
      }
    }
  }

  /** Append a RIFF LIST/INFO chunk (ICMT comment) to a WAV and patch
    * the RIFF size field — valid container, trailing metadata only. */
  private[graft] def withRiffListChunk(wav: Array[Byte],
                                       comment: String): Array[Byte] = {
    require(wav.length >= 12 && wav(0) == 'R' && wav(1) == 'I', "not RIFF")
    val cbytes0 = comment.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    // ICMT data NUL-terminated and padded to even length (RIFF rule)
    val cbytes = cbytes0 ++ (if (cbytes0.length % 2 == 0) Array[Byte](0, 0)
                             else Array[Byte](0))
    val bos = new ByteArrayOutputStream()
    bos.write(wav)
    def le(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    bos.write("LIST".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bos.write(le(4 + 8 + cbytes.length)) // "INFO" + ICMT header + data
    bos.write("INFO".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bos.write("ICMT".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bos.write(le(cbytes.length))
    bos.write(cbytes)
    val out = bos.toByteArray
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte
    out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte
    out(7) = ((riffSize >> 24) & 0xff).toByte
    out
  }

  /** One INCREMENTAL image-dedup ingest against the persisted
    * fingerprint index at `indexRoot`
    * ([[graft.operators.Dedup.hammingIncremental]]): decode + hash
    * ONLY the new batch (narrow map), probe the index broadcast-
    * filtered to the batch's buckets, commit the batch's fingerprints
    * as the next index version. A 100 TB image corpus ingesting a
    * daily batch never re-decodes a stored image — the index holds 16
    * bytes per image, not pixels. */
  def imageDedupIncremental(indexRoot: String,
                            media: Dataset[MediaRecord],
                            maxHamming: Int = 2, chunks: Int = 4,
                            extendIndex: Boolean = true,
                            onError: String = "fail",
                            probeLayout: Boolean = false,
                            maxBucketWidth: Option[Int] = None)
      : graft.operators.Dedup.IncrementalDedup = {
    checkMode(onError)
    // quarantined media must never enter the PERSISTED index (a null
    // fingerprint is unprobeable forever) — flag degrades to skip here
    val mode = if (onError == "flag") "skip" else onError
    graft.operators.Dedup.hammingIncremental(indexRoot,
      imageHashes(media, onError = mode), "media_id", "dhash", maxHamming,
      chunks, extendIndex, probeLayout, maxBucketWidth)
  }

  /** Re-encode each "image" payload: decode, PNG-encode, and splice a
    * tEXt ancillary chunk before IEND — a VALID PNG with
    * pixel-IDENTICAL content and guaranteed-different bytes (metadata
    * chunks don't touch the raster). The canonical perceptual-dedup
    * test article: byte-hash dedup misses it, dHash distance is exactly
    * 0. Batched narrow map. */
  def reencodeImages(media: Dataset[MediaRecord], idOffset: Long,
                     batchSize: Int = 64): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val src = ImageIO.read(new ByteArrayInputStream(m.payload))
          require(src != null, "payload is not a decodable image")
          val bos = new ByteArrayOutputStream()
          ImageIO.write(src, "png", bos)
          MediaRecord(m.media_id + idOffset, m.kind,
            withTextChunk(bos.toByteArray, "Comment", "re-encoded"),
            m.source)
        }
      }
    }
  }

  /** Deterministic SMOOTH-scene PNG: a 1/f²-weighted sum of low-frequency
    * cosines with seed-derived phases — the perceptual twin of the noise
    * fixture ([[fromDocuments]]'s `pngBytes`). Noise is the perceptual-
    * hash worst case (every pixel independent, crops share nothing);
    * smooth scenes are the REAL-photo case where crops and rescales stay
    * perceptually identical, which is what the crop-robust pHash lane
    * (q143) exercises. */
  def smoothPngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val fx = (x + 0.5) / w; val fy = (y + 0.5) / h
        var s = 0.0
        var u = 0
        while (u <= 3) {
          var v = 0
          while (v <= 3) {
            if (u + v >= 1) {
              // the phase must mix seed AND component: a seed-only
              // offset shifts every component identically and nearby
              // seeds render near-identical scenes (cross-pair noise)
              val p = ((((seed + 1) * (u * 11 + v * 17 + 1) * 2654435761L)
                % 97 + 97) % 97).toDouble * 0.13
              s += 90.0 / ((1 + u + v) * (1 + u + v)) *
                math.cos(2 * math.Pi * u * fx + p) *
                math.cos(2 * math.Pi * v * fy + p * 0.7)
            }
            v += 1
          }
          u += 1
        }
        val vv = math.max(0, math.min(255, (128 + s).toInt))
        img.setRGB(x, y, vv * 0x010101)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** CROP each "image" payload by `margin` pixels on every side and
    * re-encode — the canonical pHash test article: bytes differ, pixels
    * differ (every grid cell's alignment shifts), but the large-scale
    * structure pHash keys on survives. Batched narrow map, the
    * [[reencodeImages]] shape. Images too small to crop pass through
    * re-encoded. */
  def cropImages(media: Dataset[MediaRecord], margin: Int, idOffset: Long,
                 batchSize: Int = 64): Dataset[MediaRecord] = {
    require(margin > 0, "margin must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val src = ImageIO.read(new ByteArrayInputStream(m.payload))
          require(src != null, "payload is not a decodable image")
          val (w, h) = (src.getWidth, src.getHeight)
          val img =
            if (w <= 2 * margin || h <= 2 * margin) src
            else {
              val sub = src.getSubimage(margin, margin,
                w - 2 * margin, h - 2 * margin)
              val copy = new java.awt.image.BufferedImage(sub.getWidth,
                sub.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = copy.createGraphics()
              try g.drawImage(sub, 0, 0, null): Unit finally g.dispose()
              copy
            }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          MediaRecord(m.media_id + idOffset, m.kind, bos.toByteArray, m.source)
        }
      }
    }
  }

  /** Splice a PNG tEXt chunk (keyword NUL text, with the standard CRC32
    * over type+data) immediately before IEND. */
  private[graft] def withTextChunk(png: Array[Byte], keyword: String,
                                   text: String): Array[Byte] = {
    // IEND is always the final 12 bytes of a well-formed PNG
    require(png.length >= 12, "not a PNG")
    val data = (keyword + "\u0000" + text)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val bos = new ByteArrayOutputStream()
    bos.write(png, 0, png.length - 12)
    writeInt(bos, data.length)
    val typ = "tEXt".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    bos.write(typ)
    bos.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ); crc.update(data)
    writeInt(bos, crc.getValue.toInt)
    bos.write(png, png.length - 12, 12)
    bos.toByteArray
  }

  // ---- video fingerprinting / video near-dup ---------------------------

  /** Decoded grayscale rasters for every `stride`-th frame of each
    * "video" payload — [[grayRasters]] at frame granularity, one row
    * per sampled frame. Narrow map; the container walk is
    * [[sampleFrames]]'s. */
  def frameRasters(media: Dataset[MediaRecord], stride: Int = 1,
                   batchSize: Int = 16,
                   onError: String = "fail"): DataFrame = {
    checkMode(onError)
    val spark = media.sparkSession
    import spark.implicits._
    val gw = graft.plans.ImageHash.GridW
    val gh = graft.plans.ImageHash.GridH
    val rows = media.filter(_.kind == "video").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          // a corrupt container/frame quarantines the WHOLE video (the
          // length walk cannot be trusted past a bad slot): one flagged
          // row per media_id, frame_idx = -1
          guarded(onError) {
            require(m.payload.length >= 8 &&
              VideoMagic.indices.forall(i => m.payload(i) == VideoMagic(i)),
              "payload is not a GVID container")
            val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
            var off = 8; var idx = 0
            while (off < m.payload.length) {
              require(off + 4 <= m.payload.length, "truncated frame-length slot")
              val len = readInt(m.payload, off)
              require(len > 0 && off.toLong + 4 + len <= m.payload.length,
                s"corrupt frame length $len at offset $off")
              if (idx % stride == 0) {
                val img = ImageIO.read(
                  new ByteArrayInputStream(m.payload, off + 4, len))
                require(img != null, s"frame $idx is not a decodable image")
                frames += ((idx, rasterOf(img, gw, gh)))
              }
              off += 4 + len; idx += 1
            }
            frames.toSeq
          } match {
            case Right(fs) => fs.map { case (i, r) => (m.media_id, i, r, null: String) }
            case Left(_) if onError == "skip" => Nil
            case Left(e) => Seq((m.media_id, -1, null: Array[Byte], e))
          }
        }
      }
    }.toDF("media_id", "frame_idx", "raster", "error")
    if (onError == "flag") rows else rows.drop("error")
  }

  /** One 64-bit fingerprint per "video" payload: dHash every sampled
    * frame (codegen'd kernel), then MAJORITY-VOTE the per-frame hashes
    * bitwise — [[graft.operators.Dedup.simHashFromHashes]] reused as
    * the frame aggregator, so a few changed/reordered frames move only
    * the bits they dominate. One narrow decode map + one agg keyed on
    * the video id. */
  def videoHashes(media: Dataset[MediaRecord], stride: Int = 1,
                  batchSize: Int = 16,
                  onError: String = "fail"): DataFrame = {
    val spark = media.sparkSession
    graft.plans.ImageDHash.register(spark)
    if (onError != "flag")
      frameRasters(media, stride, batchSize, onError)
        .select(col("media_id"),
          call_function(graft.plans.ImageDHash.name, col("raster")).as("fh"))
        .groupBy(col("media_id"))
        .agg(graft.operators.Dedup.simHashFromHashes(collect_list(col("fh")))
          .as("dhash"), count(lit(1)).as("n_frames"))
    else
      // a quarantined video arrives as ONE null-raster row carrying the
      // error; collect_list drops the null hash, so the video groups to
      // (null dhash, null n_frames, error) — visible, never fatal
      frameRasters(media, stride, batchSize, onError)
        .select(col("media_id"),
          when(col("raster").isNotNull,
            call_function(graft.plans.ImageDHash.name, col("raster"))).as("fh"),
          col("error"))
        .groupBy(col("media_id"))
        .agg(
          when(max(col("error")).isNull,
            graft.operators.Dedup.simHashFromHashes(collect_list(col("fh"))))
            .as("dhash"),
          when(max(col("error")).isNull, count(col("fh"))).as("n_frames"),
          max(col("error")).as("error"))
  }

  /** Video near-dup pairs over the majority frame fingerprint — the
    * shared Hamming banding once more. */
  def videoNearDup(media: Dataset[MediaRecord], maxHamming: Int = 2,
                   chunks: Int = 4, stride: Int = 1,
                   onError: String = "fail"): DataFrame = {
    checkMode(onError)
    val mode = if (onError == "flag") "skip" else onError
    graft.operators.Dedup.hammingPairs(
      videoHashes(media, stride, onError = mode),
      "media_id", "dhash", maxHamming, chunks)
  }

  /** Re-encode each "video" payload: every frame decoded, PNG
    * re-encoded with a spliced tEXt chunk, container rebuilt — byte-
    * different everywhere, pixel-identical frames. The video twin of
    * [[reencodeImages]]. */
  def reencodeVideo(media: Dataset[MediaRecord], idOffset: Long,
                    batchSize: Int = 16): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val bos = new ByteArrayOutputStream()
          bos.write(VideoMagic)
          writeInt(bos, readInt(m.payload, 4))
          var off = 8
          while (off < m.payload.length) {
            val len = readInt(m.payload, off)
            require(len > 0 && off.toLong + 4 + len <= m.payload.length,
              s"corrupt frame length $len at offset $off")
            val img = ImageIO.read(
              new ByteArrayInputStream(m.payload, off + 4, len))
            require(img != null, "frame is not a decodable image")
            val fb = new ByteArrayOutputStream()
            ImageIO.write(img, "png", fb)
            val spliced = withTextChunk(fb.toByteArray, "Comment", "re-encoded")
            writeInt(bos, spliced.length)
            bos.write(spliced)
            off += 4 + len
          }
          MediaRecord(m.media_id + idOffset, m.kind, bos.toByteArray, m.source)
        }
      }
    }
  }

  /** SCENE-CHANGE segmentation for "video" payloads: dHash every
    * sampled frame (the [[frameRasters]] decode + the codegen'd image
    * kernel), then flag each frame whose Hamming distance to its
    * PREDECESSOR exceeds `maxHamming` — the shot-boundary detector a
    * video pipeline runs before per-scene sampling/dedup. Returns one
    * AUDITABLE row per video: (media_id, n_frames, n_cuts, first_cut
    * — −1 when none). One narrow decode map + one per-video ordered
    * window (frame counts bound the partition) + one aggregate.
    * `onError = flag` degrades to `skip` here — a quarantined video has
    * no trustworthy frame order to segment; run [[frameRasters]]
    * directly when the error receipts are the point. */
  def sceneChanges(media: Dataset[MediaRecord], maxHamming: Int = 10,
                   stride: Int = 1, batchSize: Int = 16,
                   onError: String = "fail"): DataFrame = {
    checkMode(onError)
    require(maxHamming >= 1 && maxHamming <= 63,
      s"maxHamming must be in [1, 63] (got $maxHamming)")
    val spark = media.sparkSession
    graft.plans.ImageDHash.register(spark)
    val mode = if (onError == "flag") "skip" else onError
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frameRasters(media, stride, batchSize, mode)
      .select(col("media_id"), col("frame_idx"),
        call_function(graft.plans.ImageDHash.name, col("raster")).as("__fh"))
      .withColumn("__prev", lag(col("__fh"), 1).over(w))
      .withColumn("__cut",
        when(col("__prev").isNotNull &&
          bit_count(col("__fh").bitwiseXOR(col("__prev"))) > maxHamming, 1)
          .otherwise(0))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("__cut")).cast("long").as("n_cuts"),
        coalesce(min(when(col("__cut") === 1, col("frame_idx"))),
          lit(-1)).as("first_cut"))
  }

  /** Fixture/demo builder for [[sceneChanges]]: one video per doc id
    * made of `scenes` CONSTANT scenes — `videoFrames(id)` identical
    * frames seeded by the id, then (for scenes = 2)
    * `videoFrames(id·31 + 7)` identical frames from a far seed. The
    * ONLY frame-to-frame change is the splice, at the closed-form
    * index `videoFrames(id)` — which is exactly what an external
    * oracle replays. */
  def sceneFixtureVideos(docs: DataFrame, scenes: Int): Dataset[MediaRecord] = {
    require(scenes == 1 || scenes == 2, s"scenes must be 1 or 2 (got $scenes)")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val (w, h) = videoDims(id)
      val n1 = videoFrames(id)
      val n2 = if (scenes == 2) videoFrames(id * 31 + 7) else 0
      val p1 = pngBytes(w, h, id)
      val bos = new ByteArrayOutputStream()
      bos.write(VideoMagic)
      writeInt(bos, n1 + n2)
      (0 until n1).foreach { _ => writeInt(bos, p1.length); bos.write(p1) }
      if (scenes == 2) {
        val p2 = pngBytes(w, h, id + 999983L)
        (0 until n2).foreach { _ => writeInt(bos, p2.length); bos.write(p2) }
      }
      MediaRecord(id, "video", bos.toByteArray, "scene-fixture")
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th REAL container
    * frame, exploded to one row per sampled frame (each `frame_bytes` is
    * itself a decodable PNG). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var off = 8
      while (off < m.payload.length) {
        require(off + 4 <= m.payload.length, "truncated frame-length slot")
        val len = readInt(m.payload, off)
        require(len > 0 && off.toLong + 4 + len <= m.payload.length,
          s"corrupt frame length $len at offset $off")
        frames += java.util.Arrays.copyOfRange(m.payload, off + 4, off + 4 + len)
        off += 4 + len
      }
      frames.indices.by(stride).map(i => (m.media_id, i, frames(i)))
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
