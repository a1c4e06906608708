package graft.kernel

/** Pure-JVM raster-image HEADER parsers: format + width/height from the
  * container header alone — no codec, no pixel decode. Covers the raster
  * formats the reference's upload gate accepts
  * (/root/reference/app/config/config.py:17 ALLOWED_EXTENSIONS =
  * pdf,png,jpg,jpeg,tiff) plus the gif/bmp magics the sniffer already
  * recognizes. Full pixel decode stays the documented codec seam
  * (operators.Multimodal scaladoc) — dimensions, however, are container
  * metadata and parse exactly, which is what the input-validation ladder
  * (resolution cap, API.md:473) and triage need.
  *
  * All parsers are total: any malformed/truncated header returns None,
  * never throws (the kernel contract — a bad unit is data, not a crash).
  */
object ImageHeader {

  final case class Dims(format: String, width: Int, height: Int)

  /** Cheap magic-only sniff (no dimension parse): the format label, or
    * None if the payload is not a recognized raster container.
    */
  def formatOf(b: Array[Byte]): Option[String] = {
    if (b == null) return None
    if (isPng(b)) Some("png")
    else if (isJpeg(b)) Some("jpg")
    else if (isGif(b)) Some("gif")
    else if (isTiff(b)) Some("tiff")
    else if (isBmp(b)) Some("bmp")
    else None
  }

  /** Header-parsed dimensions, or None if not a raster container / header
    * malformed. Never throws.
    */
  def parse(b: Array[Byte]): Option[Dims] = {
    if (b == null) return None
    try {
      val d =
        if (isPng(b)) png(b)
        else if (isJpeg(b)) jpeg(b)
        else if (isGif(b)) gif(b)
        else if (isTiff(b)) tiff(b)
        else if (isBmp(b)) bmp(b)
        else None
      d.filter(x => x.width > 0 && x.height > 0)
    } catch { case _: Exception => None }
  }

  // ---- magics ----

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0D && u8(b, 5) == 0x0A && u8(b, 6) == 0x1A && u8(b, 7) == 0x0A

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8 && u8(b, 2) == 0xFF

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def isTiff(b: Array[Byte]): Boolean =
    b.length >= 8 && ((b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 0x2A && u8(b, 3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 0x2A))

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  // ---- endian readers ----

  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  // ---- per-format ----

  /** dims beyond Int range CLAMP rather than fail: an absurdly huge
    * claimed dimension must still reach the resolution-cap validation
    * (returning None there would route the clearest cap violation to the
    * generic unsupported-type error instead)
    */
  private def clampDim(v: Long): Int = math.min(v, Int.MaxValue.toLong).toInt

  /** PNG (spec: 8-byte signature, then the IHDR chunk MUST be first):
    * width = BE u32 at 16, height at 20.
    */
  private def png(b: Array[Byte]): Option[Dims] = {
    if (b.length < 24) return None
    // chunk 1 must be IHDR (length 13)
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    Some(Dims("png", clampDim(be32(b, 16)), clampDim(be32(b, 20))))
  }

  /** JPEG: walk the marker segments until a start-of-frame (SOFn) marker;
    * the frame header carries height (BE u16 at +5) then width (+7).
    * SOF markers are 0xC0-0xCF excluding DHT (C4), JPG (C8), DAC (CC).
    */
  private def jpeg(b: Array[Byte]): Option[Dims] = {
    var i = 2
    val n = b.length
    while (i + 3 < n) {
      if (u8(b, i) != 0xFF) return None // desynced — not a marker
      // skip fill bytes (a marker may be preceded by any number of FFs)
      while (i + 1 < n && u8(b, i + 1) == 0xFF) i += 1
      if (i + 3 >= n) return None
      val marker = u8(b, i + 1)
      if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 &&
        marker != 0xCC) {
        if (i + 8 >= n) return None
        return Some(Dims("jpg", be16(b, i + 7), be16(b, i + 5)))
      }
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
        i += 2 // standalone markers carry no length
      } else if (marker == 0xD9) {
        return None // EOI before any SOF
      } else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return None
        i += 2 + segLen
      }
    }
    None
  }

  /** GIF: logical screen descriptor right after the 6-byte signature —
    * width LE u16 at 6, height at 8.
    */
  private def gif(b: Array[Byte]): Option[Dims] =
    if (b.length < 10) None else Some(Dims("gif", le16(b, 6), le16(b, 8)))

  /** TIFF: endian tag, IFD0 offset at 4; scan IFD entries for tags 256
    * (ImageWidth) / 257 (ImageLength), types SHORT(3)/LONG(4) — small
    * values are stored inline, left-justified in the 4-byte value field.
    */
  private def tiff(b: Array[Byte]): Option[Dims] = {
    val le = b(0) == 'I'
    def rd16(i: Int) = if (le) le16(b, i) else be16(b, i)
    def rd32(i: Int) = if (le) le32(b, i) else be32(b, i)
    val ifd = rd32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val off = ifd.toInt
    val nEntries = rd16(off)
    var w = -1L
    var h = -1L
    var e = 0
    while (e < nEntries) {
      val p = off + 2 + e * 12
      if (p + 12 > b.length) return None
      val tag = rd16(p)
      val typ = rd16(p + 2)
      if (tag == 256 || tag == 257) {
        val v: Long = typ match {
          case 3 => rd16(p + 8).toLong // SHORT, inline (left-justified)
          case 4 => rd32(p + 8)        // LONG, inline
          case _ => -1L
        }
        if (tag == 256) w = v else h = v
      }
      e += 1
    }
    if (w > 0 && h > 0) Some(Dims("tiff", clampDim(w), clampDim(h)))
    else None
  }

  /** BMP: 'BM' alone is a weak magic (any text starting "BM…" matches),
    * so dimensions are only trusted when the DIB header-size field at
    * offset 14 is a known BITMAPINFOHEADER-family size — width LE s32 at
    * 18, height LE s32 at 22 (negative height = top-down rows; magnitude
    * is the dimension). Unknown DIB size → None (the dispatcher then
    * reports unsupported-type, never a garbage resolution).
    */
  private val DibSizes = Set(40L, 52L, 56L, 64L, 108L, 124L)
  private def bmp(b: Array[Byte]): Option[Dims] = {
    if (!DibSizes.contains(le32(b, 14))) return None
    val w = le32(b, 18).toInt
    val h = math.abs(le32(b, 22).toInt)
    Some(Dims("bmp", w, h))
  }
}
