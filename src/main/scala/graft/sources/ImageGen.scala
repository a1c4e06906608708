package graft.sources

/** Deterministic raster-image FIXTURE builders: minimal container headers
  * carrying real width/height, for exercising kernel.ImageHeader, the
  * resolution-cap validation (API.md:473), and the multimodal metadata
  * path. Headers are spec-faithful (PNG CRCs are real CRC32s, JPEG is a
  * valid SOI→APP0→SOF0→EOI marker walk, TIFF is a well-formed IFD) but
  * carry no pixel payload — these are header fixtures for an engine whose
  * decode seam is the header (Multimodal scaladoc), not image files a
  * viewer would open.
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
