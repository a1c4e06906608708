package graft.kernel

/** Pure-JVM PIXEL decoders for the two raster containers the JDK can
  * handle with zero codec dependencies: PNG (zlib via
  * `java.util.zip.Inflater` + the five PNG scanline filters) and BMP
  * (raw padded rows). This shrinks the multimodal codec seam
  * (operators.Multimodal scaladoc) to jpg/gif/tiff — PNG and BMP
  * thumbnails are real resampled luma.
  *
  * Scope (documented, spec-pinned):
  *   - PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  *     4 (gray+alpha), 6 (RGBA), non-interlaced, one or more IDAT
  *     chunks. Interlaced/16-bit/sub-byte images return None (fall back
  *     to the seam), never throw.
  *   - BMP: BITMAPINFOHEADER family, uncompressed (BI_RGB), 8-bpp
  *     palette / 24-bpp BGR / 32-bpp BGRA, bottom-up or top-down.
  *   - Dimensions above the reference's resolution cap
  *     (MergeSpec.MaxImageDim per side) are not decoded — bounds the
  *     decode buffer exactly like the validation ladder bounds OCR.
  *
  * All paths are total: malformed, truncated, or out-of-scope payloads
  * return None (the kernel contract — a bad unit is data, not a crash).
  * Luma is integer BT.601: (77 R + 150 G + 29 B) >> 8 (77+150+29=256),
  * bit-deterministic across platforms.
  */
object PixelDecode {

  final case class Luma(width: Int, height: Int, luma: Array[Byte])

  def luma601(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b) >> 8

  /** Grayscale decode of a PNG or BMP payload; None for anything else. */
  def decodeLuma(b: Array[Byte]): Option[Luma] = {
    if (b == null || b.length < 8) return None
    try {
      if ((b(0) & 0xff) == 0x89 && b(1) == 'P') png(b)
      else if (b(0) == 'B' && b(1) == 'M') bmp(b)
      else None
    } catch { case _: Exception => None }
  }

  /** Box-filter resample of a decoded image to (tw × th): each output
    * pixel is the integer mean of its exact source box — deterministic,
    * no floating point.
    */
  def boxResample(src: Luma, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = (ty.toLong * src.height / th).toInt
      val y1 = math.max(y0 + 1, ((ty + 1).toLong * src.height / th).toInt)
      var tx = 0
      while (tx < tw) {
        val x0 = (tx.toLong * src.width / tw).toInt
        val x1 = math.max(x0 + 1, ((tx + 1).toLong * src.width / tw).toInt)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          val row = y * src.width
          while (x < x1) { sum += src.luma(row + x) & 0xff; x += 1 }
          y += 1
        }
        out(ty * tw + tx) = (sum / ((y1 - y0).toLong * (x1 - x0))).toByte
        tx += 1
      }
      ty += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // PNG
  // ------------------------------------------------------------------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  private def png(b: Array[Byte]): Option[Luma] = {
    if (b.length < 33) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > MergeSpec.MaxImageDim || h > MergeSpec.MaxImageDim)
      return None
    val bitDepth = u8(b, 24)
    val colorType = u8(b, 25)
    val interlace = u8(b, 28)
    if (bitDepth != 8 || interlace != 0 || u8(b, 26) != 0 || u8(b, 27) != 0) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    // walk chunks: collect PLTE (palette) and concatenated IDAT
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream(b.length)
    var i = 8
    var sawEnd = false
    while (i + 8 <= b.length && !sawEnd) {
      val len = be32(b, i)
      if (len < 0 || len > Int.MaxValue - 12 || i + 12 + len > b.length) return None
      val kind = new String(b, i + 4, 4, "US-ASCII")
      val l = len.toInt
      kind match {
        case "PLTE" => palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + l)
        case "IDAT" => idat.write(b, i + 8, l)
        case "IEND" => sawEnd = true
        case _      => ()
      }
      i += 12 + l
    }
    if (idat.size() == 0) return None
    if (colorType == 3 && (palette == null || palette.length % 3 != 0)) return None
    val wi = w.toInt
    val hi = h.toInt
    val rowBytes = 1 + wi * channels
    val raw = new Array[Byte](rowBytes * hi)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off < raw.length) return None
    } finally inf.end()
    unfilter(raw, wi, hi, channels)
    // luma projection
    val out = new Array[Byte](wi * hi)
    var y = 0
    while (y < hi) {
      val rowOff = y * rowBytes + 1
      var x = 0
      while (x < wi) {
        val p = rowOff + x * channels
        val v = colorType match {
          case 0 | 4 => u8(raw, p) // gray (alpha ignored)
          case 2 | 6 => luma601(u8(raw, p), u8(raw, p + 1), u8(raw, p + 2))
          case 3 =>
            val pi = u8(raw, p) * 3
            if (pi + 2 >= palette.length) return None
            luma601(u8(palette, pi), u8(palette, pi + 1), u8(palette, pi + 2))
        }
        out(y * wi + x) = v.toByte
        x += 1
      }
      y += 1
    }
    Some(Luma(wi, hi, out))
  }

  /** In-place reversal of the five PNG scanline filters (spec §9): each
    * row starts with its filter-type byte; a/b/c are the Sub/Up/Average/
    * Paeth predictors over already-reconstructed bytes.
    */
  private def unfilter(raw: Array[Byte], w: Int, h: Int, channels: Int): Unit = {
    val rowBytes = 1 + w * channels
    val bpp = channels
    var y = 0
    while (y < h) {
      val ro = y * rowBytes
      val ft = raw(ro) & 0xff
      var i = 1
      while (i <= w * channels) {
        val x = raw(ro + i) & 0xff
        val a = if (i > bpp) raw(ro + i - bpp) & 0xff else 0
        val b = if (y > 0) raw(ro - rowBytes + i) & 0xff else 0
        val c = if (y > 0 && i > bpp) raw(ro - rowBytes + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => x // unknown filter: pass through (parse stays total)
        }
        raw(ro + i) = v.toByte
        i += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------------
  // BMP
  // ------------------------------------------------------------------

  private val DibSizes = Set(40L, 52L, 56L, 64L, 108L, 124L)

  private def bmp(b: Array[Byte]): Option[Luma] = {
    if (b.length < 54) return None
    val dibSize = le32(b, 14)
    if (!DibSizes.contains(dibSize)) return None
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || w > MergeSpec.MaxImageDim || h > MergeSpec.MaxImageDim)
      return None
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (compression != 0L) return None // BI_RGB only
    val dataOff = le32(b, 10)
    if (dataOff < 0 || dataOff > b.length) return None
    val bytesPerPx = bpp match {
      case 8 => 1; case 24 => 3; case 32 => 4
      case _ => return None
    }
    val stride = (w * bytesPerPx + 3) & ~3
    if (dataOff + stride.toLong * h > b.length) return None
    // 8-bpp: BGRA palette right after the DIB header
    var palette: Array[Byte] = null
    if (bpp == 8) {
      val colorsUsed = le32(b, 46)
      val n = if (colorsUsed > 0 && colorsUsed <= 256) colorsUsed.toInt else 256
      val po = 14 + dibSize.toInt
      if (po + n * 4 > b.length) return None
      palette = java.util.Arrays.copyOfRange(b, po, po + n * 4)
    }
    val off = dataOff.toInt
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val ro = off + srcRow * stride
      var x = 0
      while (x < w) {
        val p = ro + x * bytesPerPx
        val v = bpp match {
          case 8 =>
            val pi = u8(b, p) * 4
            if (pi + 2 >= palette.length) return None
            luma601(u8(palette, pi + 2), u8(palette, pi + 1), u8(palette, pi)) // BGRA
          case _ => luma601(u8(b, p + 2), u8(b, p + 1), u8(b, p)) // BGR(A)
        }
        out(y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    Some(Luma(w, h, out))
  }
}
