package graft.sources

/** Deterministic raster-image FIXTURE builders. Two families:
  *
  *   - HEADER fixtures (`png`/`jpeg`/`tiff`/`bmp`): minimal spec-faithful
  *     container headers carrying real width/height (PNG CRCs are real
  *     CRC32s, JPEG is a valid SOI→APP0→SOF0→EOI marker walk, TIFF a
  *     well-formed IFD) with no pixel payload — for kernel.ImageHeader,
  *     the resolution-cap validation (API.md:473), and metadata triage.
  *   - REAL-PIXEL fixtures (`pngReal`/`bmpReal`): complete images a
  *     viewer would open, with caller-supplied deterministic pixels —
  *     for kernel.PixelDecode and the real-thumbnail path.
  */
object ImageGen {

  /** PNG: signature + IHDR(w, h, 8-bit RGB) + IEND, with real CRC32s. */
  def png(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w)
    putBe32(ihdr, 4, h)
    ihdr(8) = 8  // bit depth
    ihdr(9) = 2  // color type: truecolor
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** JPEG: SOI, JFIF APP0, SOF0 frame header (h then w, 3 components), EOI. */
  def jpeg(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b(0xFF, 0xD8) // SOI
    b(0xFF, 0xE0, 0x00, 0x10) // APP0, len 16
    b('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 0x48, 0, 0x48, 0, 0)
    b(0xFF, 0xC0, 0x00, 0x11, 0x08) // SOF0, len 17, precision 8
    b((h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, 3)
    b(1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) // component specs
    b(0xFF, 0xD9) // EOI
    out.toByteArray
  }

  /** TIFF (little-endian): header + one IFD with ImageWidth(256) and
    * ImageLength(257) as inline SHORTs.
    */
  def tiff(w: Int, h: Int): Array[Byte] = {
    require(w < 65536 && h < 65536, "fixture builder uses SHORT tags")
    val b = new Array[Byte](8 + 2 + 2 * 12 + 4)
    b(0) = 'I'; b(1) = 'I'; b(2) = 0x2A; b(3) = 0
    putLe32(b, 4, 8) // IFD0 right after the header
    putLe16(b, 8, 2) // 2 entries
    putEntry(b, 10, 256, w)
    putEntry(b, 22, 257, h)
    // next-IFD offset already 0
    b
  }

  /** BMP: 14-byte file header + BITMAPINFOHEADER (DIB size 40). Negative
    * height encodes top-down row order; the parser reports the magnitude.
    */
  def bmp(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](54)
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, 54)  // file size (header-only fixture)
    putLe32(b, 10, 54) // pixel-data offset
    putLe32(b, 14, 40) // DIB header size = BITMAPINFOHEADER
    putLe32(b, 18, w)
    putLe32(b, 22, h)
    putLe16(b, 26, 1)  // planes
    putLe16(b, 28, 24) // bpp
    b
  }

  // ------------------------------------------------------------------
  // Real-pixel fixtures (for kernel.PixelDecode and the real-thumbnail
  // path): spec-complete images a standard viewer would open.
  // ------------------------------------------------------------------

  /** Real-pixel PNG: 8-bit truecolor (color type 2), filter-0 rows, one
    * zlib-deflated IDAT. `px(x, y)` supplies (r, g, b).
    */
  def pngReal(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    while (y < h) {
      val ro = y * (1 + w * 3)
      raw(ro) = 0 // filter: None
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        raw(ro + 1 + x * 3) = r.toByte
        raw(ro + 2 + x * 3) = g.toByte
        raw(ro + 3 + x * 3) = b.toByte
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w)
    putBe32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // truecolor
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Real-pixel BMP: 24-bpp uncompressed BITMAPINFOHEADER, 4-byte-padded
    * rows, bottom-up unless `topDown`. `px(x, y)` supplies (r, g, b) in
    * IMAGE orientation (y = 0 is the top row).
    */
  def bmpReal(w: Int, h: Int, topDown: Boolean = false)(
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val b = new Array[Byte](54 + stride * h)
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, b.length)
    putLe32(b, 10, 54) // pixel-data offset
    putLe32(b, 14, 40) // BITMAPINFOHEADER
    putLe32(b, 18, w)
    putLe32(b, 22, if (topDown) -h else h)
    putLe16(b, 26, 1)  // planes
    putLe16(b, 28, 24) // bpp
    // compression already 0 (BI_RGB)
    var y = 0
    while (y < h) {
      val fileRow = if (topDown) y else h - 1 - y
      val ro = 54 + fileRow * stride
      var x = 0
      while (x < w) {
        val (r, g, bl) = px(x, y)
        b(ro + x * 3) = bl.toByte     // BGR order
        b(ro + x * 3 + 1) = g.toByte
        b(ro + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    b
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(raw)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  private def putEntry(b: Array[Byte], off: Int, tag: Int, v: Int): Unit = {
    putLe16(b, off, tag)
    putLe16(b, off + 2, 3) // SHORT
    putLe32(b, off + 4, 1) // count
    putLe16(b, off + 8, v) // inline value
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, kind: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putBe32(len, 0, data.length)
    out.write(len, 0, 4)
    val kb = kind.getBytes("US-ASCII")
    out.write(kb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(kb)
    crc.update(data)
    val c = new Array[Byte](4)
    putBe32(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }
  private def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
  }
  private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
    b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
  }
}
