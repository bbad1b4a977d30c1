package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The audio face of the JDK-only kernel family (ImageIoKernel's
  * sibling): WAV/RIFF metadata as pure codegen'd Column expressions
  * and REAL PCM decode via `javax.sound.sampled` — no external
  * codecs, operators untouched (the MediaKernel seam).
  *
  * audioMeta walks the RIFF chunk chain (chunks are not at fixed
  * offsets — a LIST/INFO chunk can precede fmt), a bounded
  * `aggregate` fold like ImageIoKernel's JPEG segment walk. WAV is
  * LITTLE-endian, so multi-byte fields read through `leUint`
  * (byte-reversed hex) rather than the big-endian `conv(hex(...))`
  * direct path.
  *
  * duration_ms = data_bytes * 1000 / byte_rate — exact integer
  * arithmetic off two header fields.
  */
object WavKernel extends MediaKernel {

  /** Little-endian unsigned int of `len` bytes at 1-based `pos`:
    * reverse the byte order, then parse the hex. */
  private def leUint(payload: Column, pos: Column, len: Int): Column = {
    val hexBe = (0 until len).reverse
      .map(o => hex(payload.substr(pos + o, lit(1))))
    conv(concat(hexBe: _*), 16, 10).cast("long")
  }

  private def fourcc(payload: Column, pos: Column): Column =
    payload.substr(pos, lit(4)).cast("string")

  /** (sample_rate, audio_channels, bits_per_sample, duration_ms) for
    * RIFF/WAVE payloads, null otherwise. The chunk walk carries
    * (next pos, rate, channels, bits, byte_rate, data_bytes) and
    * freezes each field once its chunk is seen. */
  def audioMeta(payload: Column): Seq[(String, Column)] = {
    val isWav = fourcc(payload, lit(1)) === "RIFF" &&
      fourcc(payload, lit(9)) === "WAVE"
    val nullL = lit(null).cast("long")
    val walked = aggregate(
      sequence(lit(1), lit(8)),
      struct(lit(13L).as("p"), nullL.as("rate"), nullL.as("ch"),
        nullL.as("bits"), nullL.as("brate"), nullL.as("dbytes")),
      (acc, _) => {
        val p = acc.getField("p")
        val id = fourcc(payload, p)
        val size = leUint(payload, p + 4, 4)
        val isFmt = acc.getField("rate").isNull && (id === "fmt ")
        val isData = acc.getField("dbytes").isNull && (id === "data")
        // chunks are word-aligned: odd sizes carry a pad byte
        struct(
          (p + 8 + size + pmod(size, lit(2L))).as("p"),
          when(isFmt, leUint(payload, p + 12, 4)).otherwise(acc.getField("rate")).as("rate"),
          when(isFmt, leUint(payload, p + 10, 2)).otherwise(acc.getField("ch")).as("ch"),
          when(isFmt, leUint(payload, p + 22, 2)).otherwise(acc.getField("bits")).as("bits"),
          when(isFmt, leUint(payload, p + 16, 4)).otherwise(acc.getField("brate")).as("brate"),
          when(isData, size).otherwise(acc.getField("dbytes")).as("dbytes"))
      })
    def field(c: Column) = when(isWav, c)
    Seq(
      "sample_rate" -> field(walked.getField("rate")),
      "audio_channels" -> field(walked.getField("ch")),
      "bits_per_sample" -> field(walked.getField("bits")),
      "duration_ms" -> field(
        (walked.getField("dbytes") * 1000 / walked.getField("brate"))
          .cast("long")))
  }

  /** Images still answer through the real header parse — this kernel
    * composes with ImageIoKernel rather than regressing to the stub. */
  override def imageMeta(payload: Column): Seq[(String, Column)] =
    ImageIoKernel.imageMeta(payload)

  /** Real decode: `AudioSystem.getAudioInputStream` over the payload,
    * then a `dim`-bucket RMS energy profile — bucket i is the root
    * mean square of the PCM samples in the i-th time slice, scaled to
    * [0, 1]. Exact integer sums of squares, one sqrt per bucket —
    * bit-reproducible. Undecodable payloads fall back to
    * StubMediaKernel's byte statistics (deterministic, pipeline keeps
    * moving). */
  override def features(rows: Iterator[MediaRow], dim: Int): Iterator[MediaFeatures] = {
    rows.map { r =>
      val audio =
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val fmt = in.getFormat
            if (fmt.getSampleSizeInBits != 16) null
            else (in.readAllBytes(), fmt.isBigEndian, fmt.getChannels)
          } finally in.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (audio == null) StubMediaKernel.features(Iterator(r), dim).next()
      else {
        val (pcm, bigEndian, _) = audio
        val nSamples = pcm.length / 2
        val feat = Array.tabulate(dim) { i =>
          val lo = i.toLong * nSamples / dim
          val hi = (i + 1).toLong * nSamples / dim
          if (lo >= hi) 0f
          else {
            var ss = 0L
            var j = lo.toInt
            while (j < hi) {
              val b0 = pcm(2 * j) & 0xff
              val b1 = pcm(2 * j + 1) & 0xff
              val s = (if (bigEndian) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
              ss += s.toLong * s
              j += 1
            }
            (math.sqrt(ss.toDouble / (hi - lo)) / 32768.0).toFloat
          }
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length, feat)
      }
    }
  }
}
