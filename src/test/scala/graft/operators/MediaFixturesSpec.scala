package graft.operators

import graft.SparkSpec

/** The q211/q212 foundation at unit level: MediaFixtures' containers
  * must round-trip through the REAL decoders value-exactly — the
  * oracle's value-level replay is only sound if
  * decode(encode(values)) == values. */
class MediaFixturesSpec extends SparkSpec {

  test("pngOf -> ImageIoKernel: strip luminance means equal the exact " +
    "column means of the encoded pixel values") {
    // distinct per-pixel values, row-major
    val vals = Array.tabulate(64)(p => (p * 3 + 7) % 256)
    val row = MediaRow(1L, "image", MediaFixtures.pngOf(vals))
    val f = ImageIoKernel.features(Iterator(row), dim = 8).next()
    assert(f.kind == "image" && f.feature.length == 8)
    (0 until 8).foreach { x =>
      val colSum = (0 until 8).map(y => vals(y * 8 + x)).sum
      // the kernel computes (3*colSum) / (3.0*1*8); same exact rational
      val want = (colSum.toDouble / 8.0).toFloat
      assert(f.feature(x) == want,
        s"strip $x: decoded ${f.feature(x)} != exact mean $want")
    }
    // header-parse metadata path agrees with the real dimensions
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val meta = Multimodal.withMeta(
      Seq((1L, "image", row.payload)).toDF("media_id", "kind", "payload"),
      kernel = ImageIoKernel)
    val r = meta.select("width", "height", "channels").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((8, 8, 3)))
  }

  test("wavOf -> WavKernel: bucket RMS equals the exact integer " +
    "sum-of-squares arithmetic over the encoded samples") {
    val samples = Array.tabulate(64)(j => (j * 517) % 16384 - 8192)
    val row = MediaRow(2L, "audio", MediaFixtures.wavOf(samples))
    val f = WavKernel.features(Iterator(row), dim = 8).next()
    assert(f.kind == "audio" && f.feature.length == 8)
    (0 until 8).foreach { i =>
      val ss = (8 * i until 8 * (i + 1))
        .map(j => samples(j).toLong * samples(j)).sum
      val want = (math.sqrt(ss.toDouble / 8.0) / 32768.0).toFloat
      assert(f.feature(i) == want,
        s"bucket $i: decoded ${f.feature(i)} != exact RMS $want")
    }
    // the RIFF chunk walk reads the header fields back exactly
    import spark.implicits._
    val df = Seq((2L, "audio", row.payload)).toDF("media_id", "kind", "payload")
    val m = df.select(WavKernel.audioMeta(org.apache.spark.sql.functions
      .col("payload")).map { case (n, c) => c.as(n) }: _*).head()
    assert(m.getLong(0) == 8000L && m.getLong(1) == 1L && m.getLong(2) == 16L)
    assert(m.getLong(3) == samples.length.toLong * 2 * 1000 / 16000)
  }

  test("KindRoutedKernel dispatches by kind: image -> ImageIoKernel, " +
    "audio -> WavKernel, anything else -> fallback") {
    val vals = Array.fill(64)(100)
    val samples = Array.fill(64)(1000)
    val rows = Iterator(
      MediaRow(1L, "image", MediaFixtures.pngOf(vals)),
      MediaRow(2L, "audio", MediaFixtures.wavOf(samples)),
      MediaRow(3L, "video", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
    val routed = new KindRoutedKernel(ImageIoKernel, WavKernel)
      .features(rows, dim = 8).toSeq
    assert(routed.map(_.media_id) == Seq(1L, 2L, 3L))
    // image: constant 100 luminance -> every strip exactly 100
    assert(routed(0).feature.forall(_ == 100.0f))
    // audio: constant 1000 sample -> RMS = 1000/32768 in every bucket
    val rms = (math.sqrt(1000.0 * 1000.0) / 32768.0).toFloat
    assert(routed(1).feature.forall(_ == rms))
    // video: no real decoder -> the stub's byte statistics, unchanged
    val stub = StubMediaKernel.features(
      Iterator(MediaRow(3L, "video", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))),
      dim = 8).next()
    assert(routed(2).feature.toSeq == stub.feature.toSeq)
  }
}
