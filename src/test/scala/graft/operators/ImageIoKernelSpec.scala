package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The REAL kernel (VERDICT r4 #4): JDK-generated PNG/JPEG fixtures
  * flow through withMeta / extractFeatures UNCHANGED — only the
  * injected kernel differs from the stub path the oracle queries
  * exercise. */
class ImageIoKernelSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic test image: a horizontal gradient with a row tint
    * so strips differ and decode mistakes show up in the features. */
  private def testImage(w: Int, h: Int, imgType: Int): BufferedImage = {
    val img = new BufferedImage(w, h, imgType)
    for (x <- 0 until w; y <- 0 until h) {
      val v = (x * 255) / math.max(1, w - 1)
      val g = (y * 255) / math.max(1, h - 1)
      img.setRGB(x, y, (0xff << 24) | (v << 16) | (g << 8) | ((v + g) / 2))
    }
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "payload").withColumn("kind", lit("image"))

  test("imageMeta: PNG IHDR parse — width/height/channels per color type") {
    val rgb = encode(testImage(80, 50, BufferedImage.TYPE_INT_RGB), "png")
    val gray = encode(testImage(33, 20, BufferedImage.TYPE_BYTE_GRAY), "png")
    val argb = encode(testImage(17, 9, BufferedImage.TYPE_INT_ARGB), "png")
    val out = Multimodal.withMeta(
        mediaDf(Seq((0L, rgb), (1L, gray), (2L, argb))), ImageIoKernel)
      .select("media_id", "width", "height", "channels")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(out == Set((0L, 80, 50, 3), (1L, 33, 20, 1), (2L, 17, 9, 4)))
  }

  test("imageMeta: JPEG SOF segment walk finds dims past variable-length segments") {
    val jpg = encode(testImage(64, 48, BufferedImage.TYPE_INT_RGB), "jpg")
    val out = Multimodal.withMeta(mediaDf(Seq((0L, jpg))), ImageIoKernel)
      .select("width", "height", "channels")
      .as[(Int, Int, Int)].collect().toSeq
    assert(out == Seq((64, 48, 3)))
  }

  test("imageMeta: unknown format yields null metadata, not garbage") {
    val junk = "definitely not an image".getBytes("UTF-8")
    val r = Multimodal.withMeta(mediaDf(Seq((0L, junk))), ImageIoKernel)
      .select("width", "height", "channels").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("features: real decode — strip luminance profile matches pixel math") {
    val w = 40; val h = 10; val dim = 8
    val img = testImage(w, h, BufferedImage.TYPE_INT_RGB)
    val png = encode(img, "png")
    // expected: per-strip mean of (r+g+b) / (3 * pixels), from the
    // SAME pixel math the kernel documents
    val expected = Array.tabulate(dim) { i =>
      val lo = i * w / dim; val hi = (i + 1) * w / dim
      var s = 0L
      for (x <- lo until hi; y <- 0 until h) {
        val rgb = img.getRGB(x, y)
        s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }
      (s.toDouble / (3.0 * (hi - lo) * h)).toFloat
    }.toSeq
    val feats = Multimodal.extractFeatures(
        mediaDf(Seq((7L, png))), dim, ImageIoKernel)
      .collect()
    assert(feats.length == 1)
    assert(feats(0).media_id == 7L && feats(0).n_bytes == png.length)
    assert(feats(0).feature.toSeq == expected)
    // the gradient makes strips strictly increase — a transposed or
    // misdecoded image cannot produce this
    assert(feats(0).feature.toSeq == feats(0).feature.toSeq.sorted)
    assert(feats(0).feature.distinct.length == dim)
  }

  test("features: undecodable payload falls back to the stub's byte stats") {
    val junk = "corrupt payload".getBytes("UTF-8")
    val out = Multimodal.extractFeatures(
      mediaDf(Seq((3L, junk))), 4, ImageIoKernel).collect()(0)
    val stub = StubMediaKernel.features(
      Iterator(MediaRow(3L, "image", junk)), 4).next()
    assert(out.feature.toSeq == stub.feature.toSeq && out.n_bytes == junk.length)
  }

  test("media near-dup funnel over REAL decoded pixels: one-pixel edit " +
    "clusters with its original, a different image survives alone") {
    // q210 runs this funnel with the stub kernel (oracle-replayable);
    // here the SAME composed plan runs the real PNG decode path. A
    // one-pixel edit perturbs exactly one column strip's mean — one
    // feature dim — so it is inside Hamming radius 1 REGARDLESS of
    // bucket boundaries; the vertical-gradient image shares no strip
    // profile with the horizontal one.
    val base = testImage(64, 48, BufferedImage.TYPE_INT_RGB)
    val edited = testImage(64, 48, BufferedImage.TYPE_INT_RGB)
    edited.setRGB(5, 7, 0xff000000) // one pixel blacked out
    val other = {
      val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 48) {
        val v = (y * 255) / 47
        img.setRGB(x, y, (0xff << 24) | (v << 16) | (v << 8) | v)
      }
      img
    }
    val df = mediaDf(Seq((1L, encode(base, "png")),
      (2L, encode(edited, "png")), (3L, encode(other, "png"))))
    val out = Multimodal.nearDupFunnel(df, dim = 8, bucketWidth = 8.0,
        radius = 1, maxBandDf = 10, ImageIoKernel)
      .select("media_id", "nd_cluster", "kept").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // 1 and 2 are one component; min-id keeper keeps 1, drops 2
    assert(out(1L)._1.nonEmpty && out(1L)._1 == out(2L)._1,
      s"original and one-pixel edit must share a component, got $out")
    assert(out(1L)._2 && !out(2L)._2)
    // 3 is no near-dup of either: kept, outside their component
    assert(out(3L)._2 && out(3L)._1 != out(1L)._1)
  }
}
