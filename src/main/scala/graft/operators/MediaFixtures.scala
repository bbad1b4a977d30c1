package graft.operators

/** REAL binary media payload encoders (VERDICT r8 #2): deterministic
  * pixel/sample values in, standard container bytes out — PNG via the
  * JDK's ImageIO writer, WAV as a hand-built RIFF header + 16-bit LE
  * PCM. Used by the q211/q212 oracle entries to put the REAL decode
  * kernels (ImageIoKernel, WavKernel) inside an oracle-gated plan:
  * the VALUES are derived from md5 expressions DuckDB replays, the
  * CONTAINER round-trip (encode here, decode in the kernel) is what
  * the entries prove — decode(encode(values)) must reproduce the
  * values exactly, or the feature hashes diverge.
  *
  * The encoders are pure functions of their value arrays: PNG
  * compression details may vary byte-wise across zlib versions, but
  * only the DECODED values enter any result — which is also why the
  * oracle entries never emit payload lengths. */
object MediaFixtures {

  /** An 8x8 gray-as-RGB PNG: vals are 64 luminances in [0, 255],
    * row-major (index y*8 + x); each pixel is (v, v, v), so the
    * kernel's (r+g+b)/3 per-pixel mean is exactly v. */
  def pngOf(vals: Array[Int]): Array[Byte] = {
    require(vals.length == 64, s"pngOf: need 64 pixel values, got ${vals.length}")
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < 64) {
      val v = vals(p)
      require(v >= 0 && v <= 255, s"pngOf: pixel value $v out of [0,255]")
      img.setRGB(p % 8, p / 8, (v << 16) | (v << 8) | v)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A mono 16-bit 8 kHz PCM WAV of the given samples (each in
    * [-32768, 32767]): 44-byte canonical RIFF header + little-endian
    * samples — the exact layout WavKernel's chunk walk and
    * AudioSystem decode both accept. */
  def wavOf(samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + 2 * n)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(8000) // sample rate
    bb.putInt(16000) // byte rate
    bb.putShort(2) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(2 * n)
    samples.foreach { s1 =>
      require(s1 >= -32768 && s1 <= 32767, s"wavOf: sample $s1 out of int16")
      bb.putShort(s1.toShort)
    }
    bb.array()
  }
}
