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
}
