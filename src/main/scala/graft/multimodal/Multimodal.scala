package graft.multimodal

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
    width: Int,            // STUB: deterministic fake, see decodeStub
    height: Int,
    n_frames: Int,
    byte_entropy: Double)

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, processed by batched executor-side extraction.
  *
  * The decode step is STUBBED: this container has no image/audio codecs, so
  * `decodeStub` derives deterministic fake dimensions from the payload
  * bytes. Everything around it — the binary-column schema, the typed
  * Dataset, the per-partition batched processing shape, the partitioning
  * behavior — is real and is what matters at scale: decode cost dominates,
  * so the operator must be a narrow per-partition map (no shuffle), which
  * `mapPartitions` over a typed Dataset guarantees. On a cluster with
  * codecs installed, replace `decodeStub` with the real library call; the
  * Spark plan is unchanged.
  */
object Multimodal {

  /** Manufacture a media table from the documents fixture: payload =
    * UTF-8 bytes of the text, kind round-robins image/audio/video. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("source"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic pseudo-dimensions from payload bytes.
    * A real implementation would decode the container format here. */
  private[multimodal] def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val h = payload.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xFF))
    kind match {
      case "image" => (64 + (h % 512).toInt.abs, 64 + ((h >> 9) % 512).toInt.abs, 1)
      case "audio" => (0, 0, 1 + (n / 16))                  // "frames" = 16-byte windows
      case _       => (64 + (h % 256).toInt.abs, 64 + ((h >> 8) % 256).toInt.abs, 1 + (n / 64))
    }
  }

  /** Batched per-partition feature extraction — the decode/resize/
    * frame-sample slot. Batches of `batchSize` records are materialized at
    * a time (mirroring arrow-batch processing) so a real decoder can
    * amortize codec setup without holding a whole partition in memory. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h, frames) = decodeStub(m.kind, m.payload)
          MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
            w, h, frames, byteEntropy(m.payload))
        }
      }
    }.toDF()
  }

  /** Shannon entropy of the byte histogram — a real (non-stub) feature. */
  private def byteEntropy(payload: Array[Byte]): Double = {
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

  /** Deterministic frame sampling for "video" payloads: every `stride`-th
    * 64-byte window, exploded to one row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = m.payload.grouped(64).toArray
      frames.indices.by(stride).map { i =>
        (m.media_id, i, frames(i))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
