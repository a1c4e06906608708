package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.PixelDecode
import graft.model.Page
import graft.operators.Multimodal
import graft.sources.ImageGen

/** Real pixel decode (PNG via Inflater + the five scanline filters, BMP
  * raw rows) and the real-thumbnail path it feeds: decoded luma must
  * match the generator formula EXACTLY, thumbnails must be the exact
  * integer box-mean of the decoded image, and every malformed /
  * out-of-scope payload must fall back (never throw).
  */
class PixelDecodeSpec extends AnyFunSuite {

  private def gradient(x: Int, y: Int): (Int, Int, Int) =
    ((x * 7 + y * 13) & 0xff, (x * 3 + 1) & 0xff, (y * 5 + 2) & 0xff)

  test("PNG real-pixel round-trip: luma equals the BT.601 of the generated pixels") {
    val (w, h) = (23, 17) // odd sizes exercise non-aligned rows
    val png = ImageGen.pngReal(w, h)(gradient)
    val img = PixelDecode.decodeLuma(png).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = gradient(x, y)
      assert((img.luma(y * w + x) & 0xff) == PixelDecode.luma601(r, g, b), s"($x,$y)")
    }
  }

  test("PNG: all five scanline filters reconstruct exactly") {
    // hand-build a 4x5 RGB png whose rows use filters 0..4 — forward-filter
    // here, decode must invert
    val (w, h) = (4, 5)
    val bpp = 3
    val rows = Array.tabulate(h, w * bpp)((y, i) => ((y * 31 + i * 17 + 5) & 0xff).toByte)
    val raw = new Array[Byte](h * (1 + w * bpp))
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (1 + w * bpp)) = ft.toByte
      for (i <- 0 until w * bpp) {
        val x = rows(y)(i) & 0xff
        val a = if (i >= bpp) rows(y)(i - bpp) & 0xff else 0
        val b = if (y > 0) rows(y - 1)(i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) rows(y - 1)(i - bpp) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (1 + w * bpp) + 1 + i) = f.toByte
      }
    }
    val png = buildPng(w, h, colorType = 2, raw)
    val img = PixelDecode.decodeLuma(png).get
    for (y <- 0 until h; x <- 0 until w) {
      val i = x * bpp
      val want = PixelDecode.luma601(
        rows(y)(i) & 0xff, rows(y)(i + 1) & 0xff, rows(y)(i + 2) & 0xff)
      assert((img.luma(y * w + x) & 0xff) == want, s"($x,$y) filter ${y % 5}")
    }
  }

  test("PNG: grayscale and palette color types decode") {
    // color type 0 (grayscale): luma IS the sample
    val (w, h) = (6, 3)
    val grayRaw = new Array[Byte](h * (1 + w))
    for (y <- 0 until h) {
      grayRaw(y * (1 + w)) = 0
      for (x <- 0 until w) grayRaw(y * (1 + w) + 1 + x) = ((x * 40 + y * 9) & 0xff).toByte
    }
    val gray = PixelDecode.decodeLuma(buildPng(w, h, colorType = 0, grayRaw)).get
    for (y <- 0 until h; x <- 0 until w)
      assert((gray.luma(y * w + x) & 0xff) == ((x * 40 + y * 9) & 0xff))
    // color type 3 (palette): luma via PLTE lookup
    val palette = Array.tabulate(4 * 3)(i => ((i * 37 + 11) & 0xff).toByte)
    val palRaw = new Array[Byte](h * (1 + w))
    for (y <- 0 until h) {
      palRaw(y * (1 + w)) = 0
      for (x <- 0 until w) palRaw(y * (1 + w) + 1 + x) = ((x + y) % 4).toByte
    }
    val pal = PixelDecode.decodeLuma(buildPng(w, h, colorType = 3, palRaw, Some(palette))).get
    for (y <- 0 until h; x <- 0 until w) {
      val pi = ((x + y) % 4) * 3
      val want = PixelDecode.luma601(
        palette(pi) & 0xff, palette(pi + 1) & 0xff, palette(pi + 2) & 0xff)
      assert((pal.luma(y * w + x) & 0xff) == want, s"($x,$y)")
    }
  }

  test("BMP real-pixel round-trip: bottom-up and top-down, padded rows") {
    for (topDown <- Seq(false, true)) {
      val (w, h) = (5, 4) // 3*5=15 bytes/row → 1-byte pad exercises stride
      val bmp = ImageGen.bmpReal(w, h, topDown)(gradient)
      val img = PixelDecode.decodeLuma(bmp).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = gradient(x, y)
        assert((img.luma(y * w + x) & 0xff) == PixelDecode.luma601(r, g, b),
          s"($x,$y) topDown=$topDown")
      }
    }
  }

  private val testPalette: Seq[(Int, Int, Int)] =
    (0 until 8).map(i => ((i * 33) & 0xff, (i * 57 + 4) & 0xff, (i * 19 + 9) & 0xff))

  test("GIF real-pixel round-trip: LZW decode recovers every palette index") {
    // 80×60 = 4800 pixels forces dict growth past several code widths AND
    // the mid-stream clear/reset (dict nears 4095 entries)
    val (w, h) = (80, 60)
    def pi(x: Int, y: Int): Int = (x * 3 + y * 5 + (x * y) % 7) % 8
    for (interlaced <- Seq(false, true)) {
      val gif = ImageGen.gifReal(w, h, testPalette, interlaced)(pi)
      val img = PixelDecode.decodeLuma(gif).get
      assert(img.width == w && img.height == h, s"interlaced=$interlaced")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = testPalette(pi(x, y))
        assert((img.luma(y * w + x) & 0xff) == PixelDecode.luma601(r, g, b),
          s"($x,$y) interlaced=$interlaced")
      }
    }
  }

  test("TIFF real-pixel round-trip: single and multiple uncompressed strips") {
    val (w, h) = (21, 13)
    for (rps <- Seq(4, 64)) { // 4 → four strips (last partial); 64 → one strip
      val tif = ImageGen.tiffReal(w, h, rowsPerStrip = rps)(gradient)
      val img = PixelDecode.decodeLuma(tif).get
      assert(img.width == w && img.height == h, s"rps=$rps")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = gradient(x, y)
        assert((img.luma(y * w + x) & 0xff) == PixelDecode.luma601(r, g, b),
          s"($x,$y) rps=$rps")
      }
    }
    // header-only TIFF fixture (no strip data) stays undecodable
    assert(PixelDecode.decodeLuma(ImageGen.tiff(30, 20)).isEmpty)
  }

  test("TIFF LZW: strip round-trip across code widths, clears, and the predictor") {
    // 80×60 drives the dict past the 9→10→11-bit early changes; the
    // single-strip case also crosses the mid-stream clear at 4093
    val (w, h) = (80, 60)
    for (predictor <- Seq(1, 2); rps <- Seq(13, 64)) {
      val tif = ImageGen.tiffLzwReal(w, h, rowsPerStrip = rps, predictor = predictor)(gradient)
      val img = PixelDecode.decodeLuma(tif).get
      assert(img.width == w && img.height == h, s"p=$predictor rps=$rps")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = gradient(x, y)
        assert((img.luma(y * w + x) & 0xff) == PixelDecode.luma601(r, g, b),
          s"($x,$y) p=$predictor rps=$rps")
      }
    }
    // corrupted LZW payload: total, no throw
    val tif = ImageGen.tiffLzwReal(w, h)(gradient)
    val junk = tif.clone()
    for (i <- 12 until 200) junk(i) = 0x77
    PixelDecode.decodeLuma(junk) // must not throw
  }

  test("TIFF: a short NON-final strip is malformed -> None, not shifted rows") {
    val (w, h) = (21, 13)
    val tif = ImageGen.tiffReal(w, h, rowsPerStrip = 4)(gradient) // 4 strips
    // tag 279 (StripByteCounts, LONG, count 4) stores its array at an
    // offset; shrink the FIRST strip's count by 3 — every later row would
    // shift, so the decode must refuse
    val patched = tif.clone()
    val ti = (0 until patched.length - 3).find(i =>
      (patched(i) & 0xff) == 0x17 && (patched(i + 1) & 0xff) == 0x01 &&
        (patched(i + 2) & 0xff) == 0x04).get
    def rdLe32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    val lensOff = rdLe32(patched, ti + 8)
    val short0 = rdLe32(patched, lensOff) - 3
    patched(lensOff) = short0.toByte
    patched(lensOff + 1) = (short0 >> 8).toByte
    assert(PixelDecode.decodeLuma(patched).isEmpty)
    assert(PixelDecode.decodeLuma(tif).nonEmpty) // control
  }

  test("JPEG: flat blocks decode EXACTLY; gradients within quantization tolerance") {
    // flat image: DC-only blocks, quant 4 divides 8*(v-128) exactly → the
    // whole decode chain (huffman, dequant, IDCT) must reproduce v
    for (v <- Seq(0, 17, 128, 200, 255); color <- Seq(false, true)) {
      val jpg = ImageGen.jpegReal(24, 16, color)((_, _) => v)
      val img = PixelDecode.decodeLuma(jpg).get
      assert(img.width == 24 && img.height == 16)
      assert(img.luma.forall(b => (b & 0xff) == v), s"flat $v color=$color")
    }
    // smooth gradient: lossy, but with uniform quant 4 the per-pixel error
    // is tightly bounded
    val (w, h) = (41, 27) // non-multiple of 8 exercises edge-clamped blocks
    def lum(x: Int, y: Int): Int = (x * 5 + y * 7) % 256
    for (color <- Seq(false, true)) {
      val img = PixelDecode.decodeLuma(ImageGen.jpegReal(w, h, color)(lum)).get
      var worst = 0
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val e = math.abs((img.luma(y * w + x) & 0xff) - lum(x, y))
        worst = math.max(worst, e)
        sum += e
      }
      assert(worst <= 16, s"worst-case error $worst color=$color") // sharp wrap at 255->0 edges
      assert(sum.toDouble / (w * h) <= 3.0, s"mean error ${sum.toDouble / (w * h)}")
    }
    // restart markers: DRI + RSTn every 3 MCUs, DC predictors reset —
    // byte-identical to the no-restart decode of the same pixels
    val plain = PixelDecode.decodeLuma(ImageGen.jpegReal(w, h)(lum)).get
    val rst = PixelDecode.decodeLuma(
      ImageGen.jpegReal(w, h, restartEvery = 3)(lum)).get
    assert(rst.luma.sameElements(plain.luma), "restart-marker decode differs")
    // the header-only JPEG fixture has no scan → undecodable → None
    assert(PixelDecode.decodeLuma(ImageGen.jpeg(30, 20)).isEmpty)
  }

  test("JPEG progressive: byte-identical to the baseline decode of the same pixels") {
    // the six-scan progressive encoding reassembles the SAME quantized
    // coefficients as the baseline encoder, so the decoded luma planes
    // must match exactly — this pins DC first/refine, both AC bands'
    // first+refine, EOB runs, and ±1 placements in one equality
    val (w, h) = (41, 27) // edge-clamped partial blocks included
    def lum(x: Int, y: Int): Int = (x * 5 + y * 7) % 256
    for (color <- Seq(false, true)) {
      val base = PixelDecode.decodeLuma(ImageGen.jpegReal(w, h, color)(lum)).get
      val prog = PixelDecode.decodeLuma(ImageGen.jpegProgressive(w, h, color)(lum)).get
      assert(prog.width == w && prog.height == h, s"color=$color")
      assert(prog.luma.sameElements(base.luma), s"progressive != baseline color=$color")
    }
    // flat image: DC-only → exact reconstruction end-to-end
    for (v <- Seq(0, 77, 255)) {
      val img = PixelDecode.decodeLuma(ImageGen.jpegProgressive(24, 16)((_, _) => v)).get
      assert(img.luma.forall(b => (b & 0xff) == v), s"flat $v")
    }
    // sparse blocks: mostly-zero bands force long EOB runs in both the
    // first and refinement scans
    val sparse = PixelDecode.decodeLuma(
      ImageGen.jpegProgressive(64, 48)((x, y) => if (x == 13 && y == 29) 250 else 128)).get
    val sparseBase = PixelDecode.decodeLuma(
      ImageGen.jpegReal(64, 48)((x, y) => if (x == 13 && y == 29) 250 else 128)).get
    assert(sparse.luma.sameElements(sparseBase.luma))
    // truncated progressive stream: total, None or consistent — no throw
    val p = ImageGen.jpegProgressive(41, 27)(lum)
    assert(PixelDecode.decodeLuma(p.dropRight(p.length / 3)).forall(_ => true))
    // SOS header with trailing padding (len inflated by 2): Ss/Se/Ah/Al
    // sit at FIXED offsets, so the decode must be unchanged — reading
    // them relative to the segment END would decode the wrong band.
    // (entropy FF bytes are stuffed, so every FF DA below is a real SOS)
    val want = PixelDecode.decodeLuma(p).get
    val at = (0 until p.length - 1).filter(i =>
      (p(i) & 0xff) == 0xFF && (p(i + 1) & 0xff) == 0xDA)(1) // 2nd scan (AC)
    val len = ((p(at + 2) & 0xff) << 8) | (p(at + 3) & 0xff)
    val padded = p.take(at + 2) ++
      Array((((len + 2) >> 8) & 0xff).toByte, ((len + 2) & 0xff).toByte) ++
      p.slice(at + 4, at + 2 + len) ++ Array(0.toByte, 0.toByte) ++
      p.drop(at + 2 + len)
    val got = PixelDecode.decodeLuma(padded)
    assert(got.exists(_.luma.sameElements(want.luma)), "padded SOS changed the decode")
  }

  test("thumbOf: PNG/BMP/GIF/TIFF/JPEG thumbnails are the exact box-mean of the real pixels") {
    val (w, h) = (40, 24)
    for (payload <- Seq(
        ImageGen.pngReal(w, h)(gradient), ImageGen.bmpReal(w, h)(gradient),
        ImageGen.gifReal(w, h, testPalette)((x, y) => (x + y) % 8),
        ImageGen.tiffReal(w, h)(gradient),
        ImageGen.tiffLzwReal(w, h, predictor = 2)(gradient),
        ImageGen.jpegReal(w, h)((x, y) => (x * 4 + y * 6) % 250),
        ImageGen.jpegProgressive(w, h)((x, y) => (x * 4 + y * 6) % 250))) {
      val t = Multimodal.thumbOf(Page("img://x", null, payload, "", "en")).get
      assert(t.thumb_w == Multimodal.ThumbMax)
      assert(t.thumb_h == h * Multimodal.ThumbMax / w)
      val img = PixelDecode.decodeLuma(payload).get
      val want = PixelDecode.boxResample(img, t.thumb_w, t.thumb_h)
      assert(t.thumb.sameElements(want), t.fmt)
      // box-mean sanity, independent of boxResample: each thumb pixel lies
      // within the [min, max] luma of the whole source
      val lumas = img.luma.map(_ & 0xff)
      t.thumb.foreach(p => assert((p & 0xff) >= lumas.min && (p & 0xff) <= lumas.max))
    }
  }

  test("JPEG: single-component scan is non-interleaved (declared 2x2 sampling ignored)") {
    // T.81 A.2: grayscale scans have MCU = one block regardless of the
    // SOF sampling factors; patch the encoder's 1x1 declaration to 2x2
    // and the decode must be unchanged
    val (w, h) = (24, 16)
    def lum(x: Int, y: Int): Int = (x * 6 + y * 11) % 256
    val plain = ImageGen.jpegReal(w, h)(lum)
    val patched = plain.clone()
    val sof = (0 until patched.length - 1).find(i =>
      (patched(i) & 0xff) == 0xFF && (patched(i + 1) & 0xff) == 0xC0).get
    assert((patched(sof + 11) & 0xff) == 0x11) // comp 0 sampling byte
    patched(sof + 11) = 0x22.toByte
    val a = PixelDecode.decodeLuma(plain).get
    val b = PixelDecode.decodeLuma(patched).get
    assert(b.width == w && b.height == h)
    assert(b.luma.sameElements(a.luma), "2x2-declared grayscale must decode identically")
  }

  test("TIFF: RowsPerStrip of 2^32-1 (the spec default, one strip) decodes") {
    val (w, h) = (9, 6)
    val tif = ImageGen.tiffReal(w, h, rowsPerStrip = 64)(gradient) // single strip
    // patch tag 278 (RowsPerStrip, LONG) to 0xFFFFFFFF
    val patched = tif.clone()
    val ti = (0 until patched.length - 3).find(i =>
      (patched(i) & 0xff) == 0x16 && (patched(i + 1) & 0xff) == 0x01 &&
        (patched(i + 2) & 0xff) == 0x04).get
    for (k <- 0 until 4) patched(ti + 8 + k) = 0xFF.toByte
    val img = PixelDecode.decodeLuma(patched).get
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = gradient(x, y)
      assert((img.luma(y * w + x) & 0xff) == PixelDecode.luma601(r, g, b))
    }
  }

  test("PNG: an out-of-range filter type is malformed -> None, not garbage pixels") {
    val png = ImageGen.pngReal(6, 4)(gradient)
    // rebuild with the first row's filter byte set to 5 (invalid per spec 9.2)
    val raw = new Array[Byte](4 * (1 + 6 * 3))
    for (y <- 0 until 4) {
      raw(y * (1 + 18)) = if (y == 0) 5.toByte else 0.toByte
      for (x <- 0 until 6) {
        val (r, g, b) = gradient(x, y)
        raw(y * 19 + 1 + x * 3) = r.toByte
        raw(y * 19 + 2 + x * 3) = g.toByte
        raw(y * 19 + 3 + x * 3) = b.toByte
      }
    }
    assert(PixelDecode.decodeLuma(buildPng(6, 4, colorType = 2, raw)).isEmpty)
    assert(PixelDecode.decodeLuma(png).nonEmpty) // control
  }

  test("out-of-scope and malformed payloads fall back, never throw") {
    // header-only fixture (no IDAT): undecodable → thumbOf still yields the
    // deterministic fake with correct geometry
    val headerOnly = ImageGen.png(40, 30)
    assert(PixelDecode.decodeLuma(headerOnly).isEmpty)
    val t = Multimodal.thumbOf(Page("img://h", null, headerOnly, "", "en")).get
    assert(t.thumb.length == t.thumb_w * t.thumb_h)
    val t2 = Multimodal.thumbOf(Page("img://h", null, headerOnly, "", "en")).get
    assert(t.thumb.sameElements(t2.thumb)) // fake is deterministic
    // truncated IDAT
    val real = ImageGen.pngReal(20, 20)(gradient)
    assert(PixelDecode.decodeLuma(real.dropRight(24)).isEmpty)
    // garbage bytes with a valid signature
    val junk = real.clone(); for (i <- 40 until junk.length) junk(i) = 0x55
    PixelDecode.decodeLuma(junk) // must not throw (result irrelevant)
    // dims above the resolution cap are not decoded (buffer bound)
    val bigHdr = ImageGen.bmp(5000, 5000)
    assert(PixelDecode.decodeLuma(bigHdr).isEmpty)
    // non-raster
    assert(PixelDecode.decodeLuma("hello".getBytes("UTF-8")).isEmpty)
    assert(PixelDecode.decodeLuma(null).isEmpty)
  }

  /** Minimal PNG writer for hand-filtered raw bytes (CRCs real — the
    * decoder ignores them, but the fixture stays a valid file).
    */
  private def buildPng(w: Int, h: Int, colorType: Int, raw: Array[Byte],
      palette: Option[Array[Byte]] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(kind: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length), 0, 4)
      val kb = kind.getBytes("US-ASCII")
      out.write(kb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(kb); crc.update(data)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    chunk("IHDR", ihdr)
    palette.foreach(chunk("PLTE", _))
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](65536)
    val comp = new java.io.ByteArrayOutputStream()
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
