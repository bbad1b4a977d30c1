package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcd"), (1L, "stereo sound bytes"), (2L, "some video payload bytes here")
  ).toDF("doc_id", "text")

  test("mediaFromDocuments: opaque binary payload, round-robin kind") {
    val m = Multimodal.mediaFromDocuments(docs)
    assert(m.schema("payload").dataType == BinaryType)
    val kinds = m.select("media_id", "kind").as[(Long, String)].collect().toMap
    assert(kinds == Map(0L -> "image", 1L -> "audio", 2L -> "video"))
  }

  test("withMeta: image dims for images, duration for audio/video, never both") {
    val m = Multimodal.withMeta(Multimodal.mediaFromDocuments(docs)).collect()
    m.foreach { r =>
      val isImage = r.getAs[String]("kind") == "image"
      assert((r.getAs[Integer]("width") != null) == isImage)
      assert((r.getAs[java.lang.Long]("duration_ms") != null) == !isImage)
      if (!isImage)
        assert(r.getAs[Long]("duration_ms") == 8L * r.getAs[Int]("n_bytes"))
      else {
        val w = r.getAs[Int]("width")
        assert(w >= 64 && w <= 64 + 7 * 32 && (w - 64) % 32 == 0)
      }
    }
  }

  test("frameSample: one row per stepMs tick, videos only") {
    val meta = Multimodal.withMeta(Multimodal.mediaFromDocuments(docs))
    val frames = Multimodal.frameSample(meta, stepMs = 1000)
      .select("media_id", "frame_no", "frame_ts_ms")
      .as[(Long, Long, Long)].collect()
    assert(frames.forall(_._1 == 2L)) // only the video doc
    val d = 8L * "some video payload bytes here".length
    assert(frames.length == d / 1000 + 1)
    assert(frames.map(_._3).sorted.toSeq == (0L to d by 1000L).toSeq)
  }

  test("extractFeatures: deterministic byte-bucket means in mapPartitions") {
    val feats = Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(docs), dim = 2)
      .collect().map(f => f.media_id -> f).toMap
    // "abcd" -> chunks "ab","cd" -> means (97+98)/2, (99+100)/2
    assert(feats(0L).feature.toSeq == Seq(97.5f, 99.5f))
    assert(feats.values.forall(_.feature.length == 2))
    assert(feats(0L).n_bytes == 4)
  }
}
