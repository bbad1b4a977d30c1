package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audio kernel: JDK-generated WAV fixtures — RIFF chunk-walk
  * header parse as Column exprs, real javax.sound PCM decode through
  * the untouched Multimodal operators, stub fallback on garbage. */
class WavKernelSpec extends SparkSpec {
  import spark.implicits._

  /** 16-bit PCM mono WAV: first half a loud 440 Hz sine, second half
    * silence — decode mistakes show up as a flat energy profile. */
  private def testWav(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples / 2) {
      val v = (math.sin(2 * math.Pi * 440 * i / sampleRate) * 20000).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def audioDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "payload").withColumn("kind", lit("audio"))

  test("audioMeta: RIFF chunk walk reads rate/channels/bits/duration") {
    val wav = testWav(8000, 4000) // 0.5 s
    val df = audioDf(Seq((0L, wav)))
    val metaCols = WavKernel.audioMeta(col("payload")).map { case (n, c) => c.as(n) }
    val r = df.select(metaCols: _*)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((8000L, 1L, 16L, 500L)))
  }

  test("audioMeta: non-WAV payload yields nulls, not garbage") {
    val junk = audioDf(Seq((0L, "not audio at all".getBytes("UTF-8"))))
    val metaCols = WavKernel.audioMeta(col("payload")).map { case (n, c) => c.as(n) }
    val r = junk.select(metaCols: _*).collect().head
    assert((0 until 4).forall(r.isNullAt))
  }

  test("features: real PCM decode gives a loud-then-silent energy profile") {
    val wav = testWav(8000, 4000)
    val feat = Multimodal.extractFeatures(audioDf(Seq((7L, wav))), dim = 4, WavKernel)
      .collect().head
    assert(feat.media_id == 7L)
    val Array(a, b, c, d) = feat.feature
    // sine RMS ~ 20000/(32768*sqrt(2)) ~ 0.43; silence ~ 0
    assert(a > 0.3f && b > 0.3f, s"loud half too quiet: $a $b")
    assert(c < 0.01f && d < 0.01f, s"silent half not silent: $c $d")
  }

  test("features: undecodable payload falls back to the stub, deterministically") {
    val junk = "garbage bytes that are not RIFF".getBytes("UTF-8")
    val row = MediaRow(1L, "audio", junk)
    val viaKernel = WavKernel.features(Iterator(row), 8).next()
    val viaStub = StubMediaKernel.features(Iterator(row), 8).next()
    assert(viaKernel.feature.toSeq == viaStub.feature.toSeq)
  }

  /** 16-bit PCM mono WAV from explicit sample values. */
  private def wavOf(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("media near-dup funnel over REAL decoded PCM: a last-quarter " +
    "overdub clusters with its original, a different recording survives") {
    // the audio twin of the ImageIoKernelSpec funnel test: q210's
    // composed plan, WavKernel decode. The overdub touches ONLY the
    // last quarter's samples, so dims 0-2 are byte-identical and the
    // edit is within Hamming radius 1 REGARDLESS of bucket
    // boundaries; the quiet full-length recording differs from both
    // in (at least) the two loud quarters.
    val rate = 8000; val n = 4000
    def sine(amp: Int, hz: Int)(i: Int): Int =
      (math.sin(2 * math.Pi * hz * i / rate) * amp).toInt
    val baseS = Array.tabulate(n)(i => if (i < n / 2) sine(20000, 440)(i) else 0)
    val editS = baseS.clone()
    for (i <- 3 * n / 4 until n) editS(i) = sine(10000, 220)(i)
    val otherS = Array.tabulate(n)(sine(5000, 330))
    val df = Seq((1L, wavOf(baseS, rate)), (2L, wavOf(editS, rate)),
      (3L, wavOf(otherS, rate))).toDF("media_id", "payload")
      .withColumn("kind", lit("audio"))
    val out = Multimodal.nearDupFunnel(df, dim = 4, bucketWidth = 0.125,
        radius = 1, maxBandDf = 10, WavKernel)
      .select("media_id", "nd_cluster", "kept").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2)))
      .toMap
    assert(out(1L)._1.nonEmpty && out(1L)._1 == out(2L)._1,
      s"original and overdub must share a component, got $out")
    assert(out(1L)._2 && !out(2L)._2) // min-id keeper
    assert(out(3L)._2 && out(3L)._1 != out(1L)._1)
  }

  test("imageMeta composes with the real image kernel") {
    val img = new java.awt.image.BufferedImage(
      40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.withMeta(
        Seq((0L, bos.toByteArray)).toDF("media_id", "payload")
          .withColumn("kind", lit("image")), WavKernel)
      .select("width", "height", "channels")
      .as[(Int, Int, Int)].collect().toSeq
    assert(out == Seq((40, 30, 3)))
  }
}
