package graft.kernel

/** Pure-JVM RIFF/WAVE parser — the audio analogue of ImageHeader +
  * PixelDecode at the multimodal seam (operators.Multimodal scaladoc):
  * real container parsing and real sample decode with zero codec
  * dependencies.
  *
  * Scope (total — anything outside returns None, never throws):
  *   - RIFF little-endian, `fmt ` chunk with PCM (audio format 1),
  *     16-bit samples, 1 or 2 channels; stereo mixes to mono by
  *     truncated average ((l + r) >> 1) — integer-exact.
  *   - Chunk walk skips unknown chunks (LIST/INFO etc.) and honors the
  *     spec's odd-size pad byte.
  *   - Sample count is capped (MaxSamples) so a forged header cannot
  *     allocate unbounded memory — the audio twin of the image
  *     resolution cap.
  */
object WavParse {

  /** Decode-buffer bound: 2^22 mono samples (~95 s at 44.1 kHz, 8 MB). */
  val MaxSamples: Int = 1 << 22

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  def parse(b: Array[Byte]): Option[Wav] = {
    if (b == null || b.length < 44) return None
    try run(b) catch { case _: Exception => None }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def run(b: Array[Byte]): Option[Wav] = {
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var fmtOk = false
    var data: (Int, Int) = null // (offset, length)
    while (pos + 8 <= b.length && data == null) {
      val id = new String(b, pos, 4, "US-ASCII")
      val len = le32(b, pos + 4)
      if (len < 0 || pos + 8 + len > b.length) return None
      val l = len.toInt
      id match {
        case "fmt " =>
          if (l < 16) return None
          val audioFormat = le16(b, pos + 8)
          channels = le16(b, pos + 10)
          sampleRate = le32(b, pos + 12).toInt
          bits = le16(b, pos + 22)
          fmtOk = audioFormat == 1 && (channels == 1 || channels == 2) &&
            bits == 16 && sampleRate > 0
          if (!fmtOk) return None
        case "data" =>
          if (!fmtOk) return None // fmt must precede data
          data = (pos + 8, l)
        case _ => () // LIST/INFO/fact/...: skip
      }
      pos += 8 + l + (l & 1) // odd chunk sizes carry a pad byte
    }
    if (data == null) return None
    val (off, dlen) = data
    val frameBytes = 2 * channels
    val nFrames = dlen / frameBytes
    if (nFrames > MaxSamples) return None
    val out = new Array[Short](nFrames)
    var i = 0
    while (i < nFrames) {
      val p = off + i * frameBytes
      val s0 = (le16(b, p) << 16) >> 16 // sign-extend
      val v =
        if (channels == 1) s0
        else {
          val s1 = (le16(b, p + 2) << 16) >> 16
          (s0 + s1) >> 1
        }
      out(i) = v.toShort
      i += 1
    }
    Some(Wav(sampleRate, channels, out))
  }
}
