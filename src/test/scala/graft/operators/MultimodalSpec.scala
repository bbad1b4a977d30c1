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

  test("a custom MediaKernel flows through withMeta/extractFeatures unchanged") {
    // the production seam: supply a kernel, never edit the operators.
    // This one reports fixed 640x480x3 images and a constant-42
    // "embedding" — values the stub can never produce (stub widths
    // are 64..288), so passing proves the injected kernel ran.
    object FixedKernel extends MediaKernel {
      override def imageMeta(payload: org.apache.spark.sql.Column) = Seq(
        "width" -> lit(640), "height" -> lit(480), "channels" -> lit(3))
      override def features(rows: Iterator[MediaRow], dim: Int) =
        rows.map(r => MediaFeatures(r.media_id, r.kind, r.payload.length,
          Array.fill(dim)(42f)))
    }
    val media = Multimodal.mediaFromDocuments(docs)
    val meta = Multimodal.withMeta(media, FixedKernel)
      .filter(col("kind") === "image")
      .select("width", "height", "channels").as[(Int, Int, Int)].collect().toSeq
    assert(meta.nonEmpty && meta.forall(_ == ((640, 480, 3))))
    val feats = Multimodal.extractFeatures(media, dim = 3, FixedKernel).collect()
    assert(feats.nonEmpty && feats.forall(_.feature.toSeq == Seq(42f, 42f, 42f)))
    // and the default path still uses the stub
    val stubW = Multimodal.withMeta(media).filter(col("kind") === "image")
      .select("width").as[Int].collect().head
    assert(stubW >= 64 && stubW <= 64 + 7 * 32)
  }

  test("imageMeta pairs are matched by NAME: order-free, missing key fails loudly") {
    // ADVICE r4: positional indexing silently swapped width/height for
    // a kernel returning a different order. Reversed order must work...
    object ReversedKernel extends MediaKernel {
      override def imageMeta(payload: org.apache.spark.sql.Column) = Seq(
        "channels" -> lit(4), "height" -> lit(111), "width" -> lit(222))
      override def features(rows: Iterator[MediaRow], dim: Int) =
        rows.map(r => MediaFeatures(r.media_id, r.kind, r.payload.length,
          Array.empty[Float]))
    }
    val media = Multimodal.mediaFromDocuments(docs)
    val m = Multimodal.withMeta(media, ReversedKernel)
      .filter(col("kind") === "image")
      .select("width", "height", "channels").as[(Int, Int, Int)].collect().toSeq
    assert(m.nonEmpty && m.forall(_ == ((222, 111, 4))))
    // ...and a kernel that forgets a key must throw, not emit nulls
    object Incomplete extends MediaKernel {
      override def imageMeta(payload: org.apache.spark.sql.Column) = Seq(
        "width" -> lit(1), "height" -> lit(2))
      override def features(rows: Iterator[MediaRow], dim: Int) = Iterator.empty
    }
    val ex = intercept[IllegalArgumentException] {
      Multimodal.withMeta(media, Incomplete)
    }
    assert(ex.getMessage.contains("channels"))
  }
}
