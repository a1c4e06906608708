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

  /** Real-pixel GIF89a: global palette (≤256 RGB entries), one full
    * sequential frame, from-scratch LZW written as literal codes with the
    * dict-growth simulation mirrored against the decoder (a clear code
    * resets before the code width could exceed 12 bits). `pxIndex(x, y)`
    * supplies the palette index.
    */
  def gifReal(w: Int, h: Int, palette: Seq[(Int, Int, Int)],
      interlaced: Boolean = false)(
      pxIndex: (Int, Int) => Int): Array[Byte] = {
    require(palette.nonEmpty && palette.size <= 256)
    // palette size rounded up to a power of two (min 4: minCode >= 2)
    var bits = 2
    while ((1 << bits) < palette.size) bits += 1
    val n = 1 << bits
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 64)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0x80 | (bits - 1)) // GCT present, 2^bits entries
    out.write(0); out.write(0)   // bg color, aspect
    for (i <- 0 until n) {
      val (r, g, b) = if (i < palette.size) palette(i) else (0, 0, 0)
      out.write(r & 0xff); out.write(g & 0xff); out.write(b & 0xff)
    }
    out.write(0x2C) // image descriptor
    w16(0); w16(0); w16(w); w16(h)
    out.write(if (interlaced) 0x40 else 0) // no LCT; optional interlace
    val minCode = bits
    out.write(minCode)
    // LZW: literal codes only, clearing whenever the dict nears 12 bits.
    // The decoder adds one dict entry per code after the first following a
    // clear; mirror that bookkeeping exactly to keep code widths in sync.
    val clear = 1 << minCode
    val end = clear + 1
    val lzw = new java.io.ByteArrayOutputStream(w * h)
    var cur = 0L
    var curBits = 0
    var codeSize = minCode + 1
    var next = end + 1
    var sinceClear = 0
    def emit(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += codeSize
      while (curBits >= 8) { lzw.write((cur & 0xff).toInt); cur >>= 8; curBits -= 8 }
    }
    emit(clear)
    // pixels stream in file order: interlaced GIFs store the 4-pass row
    // permutation, sequential ones the natural order
    val rowOrder: IndexedSeq[Int] =
      if (!interlaced) 0 until h
      else ((0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)).toIndexedSeq
    var i = 0
    val total = w * h
    while (i < total) {
      emit(pxIndex(i % w, rowOrder(i / w)) & (n - 1))
      if (sinceClear > 0) { // decoder defines an entry for every code after the first
        next += 1
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
      sinceClear += 1
      if (next >= 4095) { // reset before the dict (and width bookkeeping) caps out
        emit(clear)
        codeSize = minCode + 1; next = end + 1; sinceClear = 0
      }
      i += 1
    }
    emit(end)
    if (curBits > 0) lzw.write((cur & 0xff).toInt)
    // sub-block chunking (≤255 bytes per block) + terminator + trailer
    val data = lzw.toByteArray
    var off = 0
    while (off < data.length) {
      val k = math.min(255, data.length - off)
      out.write(k)
      out.write(data, off, k)
      off += k
    }
    out.write(0)
    out.write(0x3B)
    out.toByteArray
  }

  /** Real-pixel TIFF (little-endian): 8-bit RGB, uncompressed, a strip
    * per `rowsPerStrip` rows — multiple strips exercise strip assembly.
    */
  def tiffReal(w: Int, h: Int, rowsPerStrip: Int = 5)(
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = w * 3
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val pixelBytes = rowBytes * h
    // layout: 8-byte header | pixel strips | bits array (3 SHORTs) |
    // strip offset/count arrays (if >1 strip) | IFD
    val stripOffs = Array.tabulate(nStrips)(s => 8 + s * rowsPerStrip * rowBytes)
    val stripLens = Array.tabulate(nStrips) { s =>
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
      rows * rowBytes
    }
    var pos = 8 + pixelBytes
    val bitsOff = pos; pos += 6 // three SHORT(8)s
    val needArrays = nStrips > 1
    val offsOff = pos; if (needArrays) pos += nStrips * 4
    val lensOff = pos; if (needArrays) pos += nStrips * 4
    val ifdOff = pos
    val nTags = 9
    val b = new Array[Byte](ifdOff + 2 + nTags * 12 + 4)
    b(0) = 'I'; b(1) = 'I'; b(2) = 0x2A; b(3) = 0
    putLe32(b, 4, ifdOff)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, bl) = px(x, y)
      val p = 8 + y * rowBytes + x * 3
      b(p) = r.toByte; b(p + 1) = g.toByte; b(p + 2) = bl.toByte
    }
    putLe16(b, bitsOff, 8); putLe16(b, bitsOff + 2, 8); putLe16(b, bitsOff + 4, 8)
    if (needArrays) for (s <- 0 until nStrips) {
      putLe32(b, offsOff + s * 4, stripOffs(s))
      putLe32(b, lensOff + s * 4, stripLens(s))
    }
    putLe16(b, ifdOff, nTags)
    var t = ifdOff + 2
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      putLe16(b, t, id); putLe16(b, t + 2, typ); putLe32(b, t + 4, count)
      if (typ == 3 && count == 1) putLe16(b, t + 8, value) else putLe32(b, t + 8, value)
      t += 12
    }
    tag(256, 4, 1, w)           // ImageWidth
    tag(257, 4, 1, h)           // ImageLength
    tag(258, 3, 3, bitsOff)     // BitsPerSample → offset (3 SHORTs)
    tag(259, 3, 1, 1)           // Compression: none
    tag(262, 3, 1, 2)           // Photometric: RGB
    if (needArrays) tag(273, 4, nStrips, offsOff) else tag(273, 4, 1, stripOffs(0))
    tag(277, 3, 1, 3)           // SamplesPerPixel
    tag(278, 4, 1, rowsPerStrip)
    if (needArrays) tag(279, 4, nStrips, lensOff) else tag(279, 4, 1, stripLens(0))
    // next-IFD offset stays 0
    b
  }

  /** Real-pixel LZW-compressed TIFF (little-endian, compression 5): 8-bit
    * RGB, a strip per `rowsPerStrip` rows, each strip an independent
    * MSB-first LZW stream with the TIFF early-change rule; `predictor=2`
    * applies per-row horizontal differencing before compression.
    */
  def tiffLzwReal(w: Int, h: Int, rowsPerStrip: Int = 5, predictor: Int = 1)(
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(predictor == 1 || predictor == 2)
    val rowBytes = w * 3
    val raw = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, bl) = px(x, y)
      val p = y * rowBytes + x * 3
      raw(p) = r.toByte; raw(p + 1) = g.toByte; raw(p + 2) = bl.toByte
    }
    if (predictor == 2) { // forward horizontal differencing, per row per channel
      for (y <- 0 until h) {
        val ro = y * rowBytes
        var i = rowBytes - 1
        while (i >= 3) { raw(ro + i) = (raw(ro + i) - raw(ro + i - 3)).toByte; i -= 1 }
      }
    }
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val strips = Array.tabulate(nStrips) { s =>
      val from = s * rowsPerStrip * rowBytes
      val until = math.min(raw.length, (s + 1) * rowsPerStrip * rowBytes)
      tiffLzwCompress(raw, from, until)
    }
    val stripOffs = new Array[Int](nStrips)
    var pos = 8
    for (s <- 0 until nStrips) { stripOffs(s) = pos; pos += strips(s).length }
    val bitsOff = pos; pos += 6
    val needArrays = nStrips > 1
    val offsOff = pos; if (needArrays) pos += nStrips * 4
    val lensOff = pos; if (needArrays) pos += nStrips * 4
    val ifdOff = pos
    val nTags = if (predictor == 2) 10 else 9
    val b = new Array[Byte](ifdOff + 2 + nTags * 12 + 4)
    b(0) = 'I'; b(1) = 'I'; b(2) = 0x2A; b(3) = 0
    putLe32(b, 4, ifdOff)
    for (s <- 0 until nStrips)
      System.arraycopy(strips(s), 0, b, stripOffs(s), strips(s).length)
    putLe16(b, bitsOff, 8); putLe16(b, bitsOff + 2, 8); putLe16(b, bitsOff + 4, 8)
    if (needArrays) for (s <- 0 until nStrips) {
      putLe32(b, offsOff + s * 4, stripOffs(s))
      putLe32(b, lensOff + s * 4, strips(s).length)
    }
    putLe16(b, ifdOff, nTags)
    var t = ifdOff + 2
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      putLe16(b, t, id); putLe16(b, t + 2, typ); putLe32(b, t + 4, count)
      if (typ == 3 && count == 1) putLe16(b, t + 8, value) else putLe32(b, t + 8, value)
      t += 12
    }
    tag(256, 4, 1, w)           // ImageWidth
    tag(257, 4, 1, h)           // ImageLength
    tag(258, 3, 3, bitsOff)     // BitsPerSample
    tag(259, 3, 1, 5)           // Compression: LZW
    tag(262, 3, 1, 2)           // Photometric: RGB
    if (needArrays) tag(273, 4, nStrips, offsOff) else tag(273, 4, 1, stripOffs(0))
    tag(277, 3, 1, 3)           // SamplesPerPixel
    tag(278, 4, 1, rowsPerStrip)
    if (needArrays) tag(279, 4, nStrips, lensOff) else tag(279, 4, 1, strips(0).length)
    if (predictor == 2) tag(317, 3, 1, 2)
    b
  }

  /** TIFF LZW stream over raw[from, until): literal codes only, with the
    * dict-growth simulation mirrored against kernel.PixelDecode's strip
    * decoder — MSB-first packing, early change at 2^width - 1, a clear
    * before the 12-bit dict cap. (The GIF twin above is the same scheme
    * with LSB-first packing and late change.)
    */
  private def tiffLzwCompress(raw: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val Clear = 256
    val End = 257
    val out = new java.io.ByteArrayOutputStream((until - from) * 3 / 2 + 16)
    var cur = 0L
    var curBits = 0
    var codeSize = 9
    var next = 258
    var sinceClear = 0
    def emit(code: Int): Unit = {
      cur = (cur << codeSize) | code
      curBits += codeSize
      while (curBits >= 8) { out.write(((cur >> (curBits - 8)) & 0xff).toInt); curBits -= 8 }
    }
    emit(Clear)
    var i = from
    while (i < until) {
      emit(raw(i) & 0xff)
      if (sinceClear > 0) { // decoder defines an entry per code after the first
        next += 1
        if (next == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
      }
      sinceClear += 1
      if (next >= 4093) { // reset before the dict cap
        emit(Clear)
        codeSize = 9; next = 258; sinceClear = 0
      }
      i += 1
    }
    emit(End)
    if (curBits > 0) out.write(((cur << (8 - curBits)) & 0xff).toInt)
    out.toByteArray
  }

  /** Machine-rendered TEXT image (the OCR fixture): lines of
    * kernel.GlyphOcr's 5×7 bitmap font, black on white, integer
    * `scale`, one spacing column per glyph cell and two blank rows
    * between lines, margin all around — rendered as a real grayscale
    * PNG so the OCR path exercises the actual decode chain. Characters
    * outside the font render as spaces (callers should pre-normalize
    * via GlyphOcr.normalize).
    */
  def textImageReal(lines: Seq[String], scale: Int = 2): Array[Byte] = {
    require(scale >= 1 && scale <= 8)
    import graft.kernel.GlyphOcr
    val margin = 2 * scale
    val cellW = GlyphOcr.CellW * scale
    val pitch = GlyphOcr.LinePitch * scale
    val maxLen = if (lines.isEmpty) 0 else lines.map(_.length).max
    val w = math.max(1, maxLen * cellW + 2 * margin)
    val h = math.max(1, lines.length * pitch - 2 * scale + 2 * margin)
    pngReal(w, h) { (x, y) =>
      val li = (y - margin) / pitch
      val ry = (y - margin) - li * pitch
      val on =
        y >= margin && li >= 0 && li < lines.length && ry < 7 * scale && {
          val ci = (x - margin) / cellW
          val rx = (x - margin) - ci * cellW
          x >= margin && ci >= 0 && ci < lines(li).length && rx < 5 * scale &&
            (GlyphOcr.Glyphs.get(lines(li).charAt(ci)) match {
              case Some(rows) => (rows(ry / scale) & (1 << (4 - rx / scale))) != 0
              case None       => false
            })
        }
      val v = if (on) 0 else 255
      (v, v, v)
    }
  }

  // ---- real-pixel JPEG (baseline, from-scratch encoder) ----

  /** JPEG Annex K.3.1 luminance DC Huffman table (BITS, HUFFVAL). */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** JPEG Annex K.3.2 luminance AC Huffman table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // zigzag order and DCT basis are SHARED with the decoder
  // (graft.kernel.JpegDecode.Zigzag / CosTab) — one source of truth
  private def JpegZigzag = graft.kernel.JpegDecode.Zigzag

  /** (code, length) per symbol, built canonically from (BITS, HUFFVAL) —
    * the same construction JpegDecode inverts.
    */
  private def huffCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var code = 0
    var k = 0
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) {
        out(vals(k)) = (code, l)
        code += 1
        k += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** Real-pixel baseline JPEG: uniform quant table (all 4 — high
    * quality), Annex K luminance Huffman tables for every component,
    * grayscale or 4:4:4 YCbCr with flat chroma (Cb=Cr=128 → zero
    * blocks), H=V=1 sampling. `lumaOf(x, y)` supplies Y in 0..255.
    */
  def jpegReal(w: Int, h: Int, color: Boolean = false, restartEvery: Int = 0)(
      lumaOf: (Int, Int) => Int): Array[Byte] = {
    val q = 4
    val dc = huffCodes(DcBits, DcVals)
    val ac = huffCodes(AcBits, AcVals)
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 512)
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    def seg(marker: Int, payload: Array[Int]): Unit = {
      b(0xFF, marker, (payload.length + 2) >> 8, (payload.length + 2) & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    b(0xFF, 0xD8) // SOI
    seg(0xDB, Array(0x00) ++ Array.fill(64)(q)) // DQT table 0
    val nc = if (color) 3 else 1
    seg(0xC0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      (1 to nc).flatMap(c => Seq(c, 0x11, 0))) // SOF0: H=V=1, quant 0
    seg(0xC4, Array(0x00) ++ DcBits ++ DcVals) // DHT DC 0
    seg(0xC4, Array(0x10) ++ AcBits ++ AcVals) // DHT AC 0
    if (restartEvery > 0) seg(0xDD, Array(restartEvery >> 8, restartEvery & 0xff)) // DRI
    seg(0xDA, Array(nc) ++ (1 to nc).flatMap(c => Seq(c, 0x00)) ++ Seq(0, 63, 0))
    // entropy writer: MSB-first, FF byte-stuffed
    var cur = 0L
    var nBits = 0
    def put(code: Int, len: Int): Unit = {
      cur = (cur << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val v = ((cur >> (nBits - 8)) & 0xff).toInt
        out.write(v)
        if (v == 0xFF) out.write(0x00)
        nBits -= 8
      }
    }
    def category(v: Int): Int = {
      var t = 0
      var a = math.abs(v)
      while (a != 0) { t += 1; a >>= 1 }
      t
    }
    def putMagnitude(v: Int, t: Int): Unit =
      if (t > 0) put(if (v < 0) v + (1 << t) - 1 else v, t)
    val cos = graft.kernel.JpegDecode.CosTab
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val dcPred = new Array[Int](nc)
    val block = new Array[Double](64)
    val zz = new Array[Int](64)
    var mcuNo = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartEvery > 0 && mcuNo > 0 && mcuNo % restartEvery == 0) {
        // byte-align with 1-padding, then RSTn (n cycles 0..7); DC resets
        if (nBits > 0) { val pad = 8 - nBits; put((1 << pad) - 1, pad) }
        b(0xFF, 0xD0 + ((mcuNo / restartEvery - 1) % 8))
        java.util.Arrays.fill(dcPred, 0)
      }
      mcuNo += 1
      for (ci <- 0 until nc) {
      if (ci == 0) {
        // sample the edge-clamped 8×8 luma block ONCE, then forward-DCT it
        val samp = new Array[Double](64)
        for (y <- 0 until 8; x <- 0 until 8)
          samp(y * 8 + x) =
            lumaOf(math.min(mx * 8 + x, w - 1), math.min(my * 8 + y, h - 1)) - 128.0
        for (v <- 0 until 8; u <- 0 until 8) {
          var s = 0.0
          for (y <- 0 until 8; x <- 0 until 8)
            s += samp(y * 8 + x) * cos(u)(x) * cos(v)(y)
          block(v * 8 + u) = s
        }
        for (k <- 0 until 64)
          zz(k) = StrictMath.round(block(JpegZigzag(k)) / q).toInt
      } else java.util.Arrays.fill(zz, 0) // flat chroma: all-zero blocks
      val diff = zz(0) - dcPred(ci)
      dcPred(ci) = zz(0)
      val t = category(diff)
      val (dcode, dlen) = dc(t)
      put(dcode, dlen)
      putMagnitude(diff, t)
      var k = 1
      while (k < 64) {
        var r = 0
        while (k < 64 && zz(k) == 0) { r += 1; k += 1 }
        if (k == 64) {
          val (c0, l0) = ac(0x00) // EOB
          put(c0, l0)
        } else {
          while (r > 15) { val (cz, lz) = ac(0xF0); put(cz, lz); r -= 16 } // ZRL
          val s = category(zz(k))
          val (c1, l1) = ac((r << 4) | s)
          put(c1, l1)
          putMagnitude(zz(k), s)
          k += 1
        }
      }
      }
    }
    if (nBits > 0) { val pad = 8 - nBits; put((1 << pad) - 1, pad) } // pad with 1-bits
    b(0xFF, 0xD9) // EOI
    out.toByteArray
  }

  // ---- real-pixel JPEG (progressive / SOF2, from-scratch encoder) ----

  /** AC table for the progressive scans: uniform 8-bit codes over every
    * symbol the scans can emit — EOBn (r ≤ 14), ZRL, and (run, size) for
    * sizes 1..10. Annex K's AC table lacks the EOBn symbols for r > 0,
    * and multi-block EOB runs are exactly the decoder path a progressive
    * fixture must exercise.
    */
  private val ProgAcVals: Array[Int] =
    ((0 to 14).map(r => (r << 4) | 0) ++ Seq(0xF0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray
  private val ProgAcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, ProgAcVals.length, 0, 0, 0, 0, 0, 0, 0, 0)

  /** Real-pixel progressive JPEG (SOF2): same pixel semantics as
    * `jpegReal` (uniform quant 4, grayscale or 4:4:4 flat-chroma YCbCr,
    * H=V=1) but encoded as SIX scans exercising every progressive decode
    * path — interleaved DC first (Al=1), two spectral AC-first bands
    * with multi-block EOB runs, DC refinement (raw bits), and two AC
    * refinement bands (correction bits + newly-significant ±1 placement
    * + refinement EOB runs). Fully-assembled coefficients equal the
    * baseline encoder's, so the decoded luma must be byte-identical to
    * decoding `jpegReal` of the same pixels.
    */
  def jpegProgressive(w: Int, h: Int, color: Boolean = false)(
      lumaOf: (Int, Int) => Int): Array[Byte] = {
    val q = 4
    val dc = huffCodes(DcBits, DcVals)
    val ac = huffCodes(ProgAcBits, ProgAcVals)
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    def seg(marker: Int, payload: Array[Int]): Unit = {
      b(0xFF, marker, (payload.length + 2) >> 8, (payload.length + 2) & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    b(0xFF, 0xD8) // SOI
    seg(0xDB, Array(0x00) ++ Array.fill(64)(q))
    val nc = if (color) 3 else 1
    seg(0xC2, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      (1 to nc).flatMap(c => Seq(c, 0x11, 0))) // SOF2: H=V=1, quant 0
    seg(0xC4, Array(0x00) ++ DcBits ++ DcVals)
    seg(0xC4, Array(0x10) ++ ProgAcBits ++ ProgAcVals)

    // quantized zigzag coefficients per Y block (raster block order);
    // chroma is flat (Cb=Cr=128) → all-zero blocks
    val cos = graft.kernel.JpegDecode.CosTab
    val zig = JpegZigzag
    val bx = (w + 7) / 8
    val by = (h + 7) / 8
    val nBlocks = bx * by
    val yBlocks = Array.ofDim[Int](nBlocks, 64)
    val samp = new Array[Double](64)
    val dctv = new Array[Double](64)
    for (myy <- 0 until by; mxx <- 0 until bx) {
      for (y <- 0 until 8; x <- 0 until 8)
        samp(y * 8 + x) =
          lumaOf(math.min(mxx * 8 + x, w - 1), math.min(myy * 8 + y, h - 1)) - 128.0
      for (v <- 0 until 8; u <- 0 until 8) {
        var s = 0.0
        for (y <- 0 until 8; x <- 0 until 8)
          s += samp(y * 8 + x) * cos(u)(x) * cos(v)(y)
        dctv(v * 8 + u) = s
      }
      val blk = yBlocks(myy * bx + mxx)
      for (k <- 0 until 64) blk(k) = StrictMath.round(dctv(zig(k)) / q).toInt
    }
    val zeroBlock = new Array[Int](64)
    def blockAt(ci: Int, n: Int): Array[Int] = if (ci == 0) yBlocks(n) else zeroBlock

    // entropy writer (MSB-first, FF-stuffed), reset per scan
    var cur = 0L
    var nBits = 0
    def put(code: Int, len: Int): Unit = if (len > 0) {
      cur = (cur << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val v = ((cur >> (nBits - 8)) & 0xff).toInt
        out.write(v)
        if (v == 0xFF) out.write(0x00)
        nBits -= 8
      }
    }
    def flushScan(): Unit =
      if (nBits > 0) { val pad = 8 - nBits; put((1 << pad) - 1, pad) }
    def category(v: Int): Int = {
      var t = 0
      var a = math.abs(v)
      while (a != 0) { t += 1; a >>= 1 }
      t
    }
    def putMagnitude(v: Int, t: Int): Unit =
      if (t > 0) put(if (v < 0) v + (1 << t) - 1 else v, t)
    def putAc(sym: Int): Unit = { val (c, l) = ac(sym); put(c, l) }
    def sos(compIds: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit =
      seg(0xDA, Array(compIds.length) ++ compIds.flatMap(c => Seq(c, 0x00)) ++
        Seq(ss, se, (ah << 4) | al))

    // scan 1: DC first, Al=1, all components (interleaved when nc=3)
    sos(1 to nc, 0, 0, 0, 1)
    val dcPred = new Array[Int](nc)
    for (n <- 0 until nBlocks; ci <- 0 until nc) {
      val v = blockAt(ci, n)(0) >> 1 // DC point transform: arithmetic shift
      val diff = v - dcPred(ci)
      dcPred(ci) = v
      val t = category(diff)
      val (c0, l0) = dc(t)
      put(c0, l0)
      putMagnitude(diff, t)
    }
    flushScan()

    // AC first scans: one component each, two spectral bands, Al=1;
    // consecutive all-zero bands batch into multi-block EOB runs
    def acPt(v: Int): Int = if (v < 0) -((-v) >> 1) else v >> 1 // truncate toward 0
    for ((lo, hi) <- Seq((1, 31), (32, 63)); ci <- 0 until nc) {
      sos(Seq(ci + 1), lo, hi, 0, 1)
      var m = 0 // pending block-endings: first is the open block's EOB
      def flushEob(): Unit = if (m > 0) {
        var r = 0
        while ((2 << r) <= m) r += 1 // r = floor(log2 m)
        putAc(r << 4)
        if (r > 0) put(m - (1 << r), r)
        m = 0
      }
      for (n <- 0 until nBlocks) {
        val blk = blockAt(ci, n)
        var k = lo
        var p = lo
        while (p <= hi) {
          val va = acPt(blk(p))
          if (va != 0) {
            flushEob()
            var r = p - k
            while (r > 15) { putAc(0xF0); r -= 16 }
            val s = category(va)
            putAc((r << 4) | s)
            putMagnitude(va, s)
            k = p + 1
          }
          p += 1
        }
        if (k <= hi) { if (m == 32767) flushEob(); m += 1 }
      }
      flushEob()
      flushScan()
    }

    // DC refinement: Ah=1 Al=0 — one raw bit (bit 0 of the DC value) per
    // block, no Huffman
    sos(1 to nc, 0, 0, 1, 0)
    for (n <- 0 until nBlocks; ci <- 0 until nc) put(blockAt(ci, n)(0) & 1, 1)
    flushScan()

    // AC refinement scans: corrections for history coefficients, ±1
    // placements for newly significant ones, EOB runs carrying the
    // deferred correction bits of the blocks they cover
    for ((lo, hi) <- Seq((1, 31), (32, 63)); ci <- 0 until nc) {
      sos(Seq(ci + 1), lo, hi, 1, 0)
      var m = 0
      val pend = scala.collection.mutable.ArrayBuffer.empty[Int]
      def hist(v: Int): Boolean = math.abs(v) >= 2
      def flushEob(): Unit = if (m > 0) {
        var r = 0
        while ((2 << r) <= m) r += 1
        putAc(r << 4)
        if (r > 0) put(m - (1 << r), r)
        pend.foreach(put(_, 1))
        pend.clear()
        m = 0
      }
      for (n <- 0 until nBlocks) {
        val blk = blockAt(ci, n)
        val newsigs = (lo to hi).filter(p => math.abs(blk(p)) == 1)
        if (newsigs.isEmpty) {
          if (m == 32767) flushEob()
          m += 1
          for (p <- lo to hi; if hist(blk(p))) pend += (math.abs(blk(p)) & 1)
        } else {
          flushEob()
          var k = lo
          for (p <- newsigs) {
            var r = (k until p).count(i => !hist(blk(i))) // zero-history gaps
            var pos = k
            while (r > 15) { // ZRL: 16 zero slots, corrections interleaved
              putAc(0xF0)
              var zeros = 0
              while (zeros < 16) {
                if (hist(blk(pos))) put(math.abs(blk(pos)) & 1, 1) else zeros += 1
                pos += 1
              }
              r -= 16
            }
            putAc((r << 4) | 1)
            put(if (blk(p) > 0) 1 else 0, 1) // sign of the ±1 placement
            while (pos < p) { // corrections up to the placement slot
              if (hist(blk(pos))) put(math.abs(blk(pos)) & 1, 1)
              pos += 1
            }
            k = p + 1
          }
          if (k <= hi) { // band remainder rides the next EOB run
            m += 1
            for (p <- k to hi; if hist(blk(p))) pend += (math.abs(blk(p)) & 1)
          }
        }
      }
      flushEob()
      flushScan()
    }
    b(0xFF, 0xD9) // EOI
    out.toByteArray
  }

  /** Real PCM16 WAV fixture (RIFF little-endian): mono or stereo,
    * caller-supplied integer sample function (per frame; stereo writes
    * the same value to both channels unless `right` differs). An
    * optional LIST chunk before `data` exercises the parser's
    * unknown-chunk skip (with the odd-size pad byte when `oddList`).
    */
  def wavReal(nFrames: Int, sampleRate: Int, channels: Int = 1,
      withListChunk: Boolean = false, oddList: Boolean = false)(
      sample: Int => Int, right: Int => Int = null): Array[Byte] = {
    require(channels == 1 || channels == 2)
    val listLen = if (!withListChunk) 0 else if (oddList) 5 else 4
    val listBytes = if (!withListChunk) 0 else 8 + listLen + (listLen & 1)
    val dataLen = nFrames * 2 * channels
    val b = new Array[Byte](12 + 24 + listBytes + 8 + dataLen)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putLe32(b, 4, b.length - 8)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    var p = 12
    b(p) = 'f'; b(p + 1) = 'm'; b(p + 2) = 't'; b(p + 3) = ' '
    putLe32(b, p + 4, 16)
    putLe16(b, p + 8, 1) // PCM
    putLe16(b, p + 10, channels)
    putLe32(b, p + 12, sampleRate)
    putLe32(b, p + 16, sampleRate * 2 * channels) // byte rate
    putLe16(b, p + 20, 2 * channels)              // block align
    putLe16(b, p + 22, 16)                        // bits/sample
    p += 24
    if (withListChunk) {
      b(p) = 'L'; b(p + 1) = 'I'; b(p + 2) = 'S'; b(p + 3) = 'T'
      putLe32(b, p + 4, listLen)
      p += 8 + listLen + (listLen & 1)
    }
    b(p) = 'd'; b(p + 1) = 'a'; b(p + 2) = 't'; b(p + 3) = 'a'
    putLe32(b, p + 4, dataLen)
    p += 8
    var i = 0
    while (i < nFrames) {
      putLe16(b, p + i * 2 * channels, sample(i) & 0xffff)
      if (channels == 2)
        putLe16(b, p + i * 2 * channels + 2,
          (if (right == null) sample(i) else right(i)) & 0xffff)
      i += 1
    }
    b
  }

  /** Minimal-but-valid ISO BMFF (MP4) metadata fixture: ftyp + moov
    * containing mvhd (v0 or v1) and one trak/mdia/hdlr per track, plus
    * a free box and a tiny mdat so the walk skips non-metadata boxes.
    * `handlers` supplies each track's fourcc ("vide"/"soun"/...).
    */
  def mp4(timescale: Long, duration: Long, handlers: Seq[String],
      mvhdV1: Boolean = false): Array[Byte] = {
    def box(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val b = new Array[Byte](8 + body.length)
      putBe32(b, 0, 8 + body.length)
      System.arraycopy(fourcc.getBytes("US-ASCII"), 0, b, 4, 4)
      System.arraycopy(body, 0, b, 8, body.length)
      b
    }
    val mvhd =
      if (!mvhdV1) {
        val b = new Array[Byte](4 + 20) // version/flags + ctime mtime ts dur
        putBe32(b, 12, timescale.toInt)
        putBe32(b, 16, duration.toInt)
        box("mvhd", b)
      } else {
        val b = new Array[Byte](4 + 32) // v1: 64-bit ctime mtime, ts, 64-bit dur
        b(0) = 1
        putBe32(b, 20, timescale.toInt)
        putBe32(b, 24, (duration >>> 32).toInt)
        putBe32(b, 28, duration.toInt)
        box("mvhd", b)
      }
    val traks = handlers.map { h =>
      val hb = new Array[Byte](12 + 8) // version/flags + pre_defined + type + reserved/name
      System.arraycopy(h.getBytes("US-ASCII"), 0, hb, 8, 4)
      box("trak", box("mdia", box("hdlr", hb)))
    }
    val moov = box("moov", (Seq(mvhd) ++ traks).reduce(_ ++ _))
    val ftypBody = "isom".getBytes("US-ASCII") ++ new Array[Byte](4) ++
      "isom".getBytes("US-ASCII")
    box("ftyp", ftypBody) ++ box("free", new Array[Byte](4)) ++ moov ++
      box("mdat", Array[Byte](1, 2, 3, 4))
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
