package graft.kernel

/** Pure-JVM ISO BMFF (MP4) metadata parser — the video analogue of
  * ImageHeader at the multimodal seam: box walk over the container,
  * movie-header timing (mvhd v0 and v1), and per-track handler types.
  * Frame DECODE (H.264 etc.) is out of scope by design — triage needs
  * duration/track structure, and the sample-offset plumbing already
  * exists (operators.Multimodal.frameSamples).
  *
  * Scope (total — anything outside returns None, never throws):
  *   - 32-bit box sizes, `largesize` (size==1) and to-end-of-file
  *     (size==0) boxes; containers walked: moov, trak, mdia.
  *   - mvhd version 0 (32-bit times) and 1 (64-bit), timescale > 0.
  *   - Track handler types read from trak/mdia/hdlr (vide / soun /
  *     anything else counted as other).
  *   - Depth- and count-capped walk so crafted nesting cannot recurse
  *     or loop unboundedly.
  */
object Mp4Parse {

  final case class Mp4Meta(
      timescale: Long, duration: Long,
      nVideoTracks: Int, nAudioTracks: Int, nOtherTracks: Int) {
    /** Integer milliseconds (truncating), cross-engine exact. */
    def durationMs: Long = if (timescale <= 0) 0L else duration * 1000L / timescale
  }

  def parse(b: Array[Byte]): Option[Mp4Meta] = {
    if (b == null || b.length < 16) return None
    try run(b) catch { case _: Exception => None }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private final class State {
    var timescale = -1L
    var duration = -1L
    var vide = 0
    var soun = 0
    var other = 0
    var boxes = 0
  }

  private val MaxBoxes = 4096
  private val MaxDepth = 8

  private def run(b: Array[Byte]): Option[Mp4Meta] = {
    // an MP4 leads with a box whose fourcc is printable — cheap sniff so
    // arbitrary binaries bail before the walk
    val cc = (4 to 7).map(i => u8(b, i))
    if (!cc.forall(c => c >= 0x20 && c < 0x7f)) return None
    val st = new State
    if (!walk(b, 0, b.length, 0, "", st)) return None
    if (st.timescale <= 0 || st.duration < 0) return None
    // forged 64-bit v1 durations: duration * 1000 must not overflow in
    // durationMs — anything past 2^53 units (>285k years at any sane
    // timescale) is a crafted header, refused like every other forgery
    if (st.duration > (1L << 53)) return None
    Some(Mp4Meta(st.timescale, st.duration, st.vide, st.soun, st.other))
  }

  /** Walk boxes in [from, until); `path` is the slash-joined ancestry. */
  private def walk(b: Array[Byte], from: Int, until: Int, depth: Int,
      path: String, st: State): Boolean = {
    if (depth > MaxDepth) return false
    var pos = from
    while (pos + 8 <= until) {
      st.boxes += 1
      if (st.boxes > MaxBoxes) return false
      val size32 = be32(b, pos)
      val fourcc = new String(b, pos + 4, 4, "US-ASCII")
      var hdr = 8
      val size =
        if (size32 == 1L) { // largesize
          if (pos + 16 > until) return false
          hdr = 16
          be64(b, pos + 8)
        } else if (size32 == 0L) (until - pos).toLong // to end of enclosing box
        else size32
      if (size < hdr || pos + size > until) return false
      val body = pos + hdr
      val bodyEnd = (pos + size).toInt
      fourcc match {
        case "moov" if depth == 0 =>
          if (!walk(b, body, bodyEnd, depth + 1, "moov", st)) return false
        case "trak" if path == "moov" =>
          if (!walk(b, body, bodyEnd, depth + 1, "moov/trak", st)) return false
        case "mdia" if path == "moov/trak" =>
          if (!walk(b, body, bodyEnd, depth + 1, "moov/trak/mdia", st)) return false
        case "mvhd" if path == "moov" =>
          if (body + 4 > bodyEnd) return false
          u8(b, body) match { // version
            case 0 =>
              if (body + 4 + 16 > bodyEnd) return false
              st.timescale = be32(b, body + 12)
              st.duration = be32(b, body + 16)
            case 1 =>
              if (body + 4 + 28 > bodyEnd) return false
              st.timescale = be32(b, body + 20)
              st.duration = be64(b, body + 24)
            case _ => return false
          }
        case "hdlr" if path == "moov/trak/mdia" =>
          if (body + 12 > bodyEnd) return false
          new String(b, body + 8, 4, "US-ASCII") match {
            case "vide" => st.vide += 1
            case "soun" => st.soun += 1
            case _      => st.other += 1
          }
        case _ => () // ftyp/mdat/free/unknown: skip
      }
      pos = bodyEnd
    }
    pos == until // boxes must tile the span exactly — no trailing slack
  }
}
