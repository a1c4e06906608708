package graft.kernel

/** From-scratch baseline JPEG decoder, luma plane only — the last piece
  * of the multimodal pixel seam (operators.Multimodal scaladoc). Pure
  * JVM, no codec dependency: marker walk (DQT/DHT/SOF0-1/DRI/SOS),
  * MSB-first entropy bit reader with 0xFF00 byte-unstuffing and RSTn
  * restart handling, canonical Huffman decode, dequantization, and an
  * 8×8 inverse DCT.
  *
  * Scope (total — anything outside returns None, never throws):
  *   - Baseline/extended sequential Huffman (SOF0/SOF1); progressive
  *     (SOF2), arithmetic coding, and 12-bit precision return None.
  *   - Grayscale or YCbCr where the Y component carries the maximum
  *     sampling factors (true for 4:4:4 / 4:2:2 / 4:2:0): only Y blocks
  *     run the IDCT — chroma blocks are entropy-decoded to keep the bit
  *     stream in sync, then discarded (the output is luma).
  *   - Dimensions above MergeSpec.MaxImageDim per side are not decoded.
  *
  * IDCT uses StrictMath-built cosine tables (bit-identical across
  * platforms) and double arithmetic — deterministic, spec-pinned.
  */
object JpegDecode {

  def decode(b: Array[Byte]): Option[PixelDecode.Luma] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return None
    try run(b) catch { case _: Exception => None }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  // canonical Huffman table: for each code length 1..16 the first code
  // value and the index of its first symbol (the standard JPEG decode)
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def symbol(idx: Int): Int = symbols(idx)
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nBits = 0
    var hitMarker = false // a non-RST marker ends the entropy stream

    def align(): Unit = { cur = 0; nBits = 0 }

    /** next entropy byte, honoring 0xFF00 stuffing; RSTn handled by caller */
    private def fill(): Boolean = {
      if (pos >= b.length) return false
      var v = u8(b, pos)
      if (v == 0xFF) {
        if (pos + 1 >= b.length) return false
        val m = u8(b, pos + 1)
        if (m == 0x00) { pos += 2; cur = (cur << 8) | 0xFF; nBits += 8; return true }
        hitMarker = true
        return false // a real marker: stop (caller sees hitMarker)
      }
      pos += 1
      cur = (cur << 8) | v
      nBits += 8
      true
    }

    def bit(): Int = {
      if (nBits == 0 && !fill()) return -1
      nBits -= 1
      (cur >> nBits) & 1
    }

    /** n-bit MSB-first value; -1 on exhaustion */
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }

    def decodeHuff(h: Huff): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.symbol(h.valPtr(l) + code - h.minCode(l))
        val x = bit()
        if (x < 0) return -1
        code = (code << 1) | x
        l += 1
      }
      -1 // no code that long — corrupt
    }

    /** skip to just after the next RSTn marker; false if none/other marker */
    def restart(): Boolean = {
      align()
      while (pos + 1 < b.length) {
        if (u8(b, pos) == 0xFF) {
          val m = u8(b, pos + 1)
          if (m >= 0xD0 && m <= 0xD7) { pos += 2; hitMarker = false; return true }
          if (m != 0x00 && m != 0xFF) return false
          pos += (if (m == 0xFF) 1 else 2)
        } else pos += 1
      }
      false
    }
  }

  /** Zigzag scan order (shared with the fixture encoder in ImageGen). */
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** DCT basis: cosTab(u)(x) = c(u)/2 * cos((2x+1)uπ/16), StrictMath for
    * cross-platform bit-identical tables (shared with the fixture encoder).
    */
  private[graft] val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    cu / 2.0 * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  /** 8×8 2D IDCT, rows then columns; coeffs in natural order. */
  private def idct(coef: Array[Double], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // 1D over rows
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTab(u)(x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // 1D over columns + level shift
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTab(v)(yy) * tmp(v * 8 + x); v += 1 }
        val p = StrictMath.round(s + 128.0).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }

  /** DC/AC coefficient magnitude extension (JPEG F.2.2.1). */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  private def run(b: Array[Byte]): Option[PixelDecode.Luma] = {
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = -1
    var h = -1
    var comps: Array[Comp] = null
    var restartInterval = 0
    var pos = 2
    while (pos + 4 <= b.length) {
      if (u8(b, pos) != 0xFF) return None
      var m = u8(b, pos + 1)
      while (m == 0xFF && pos + 2 < b.length) { pos += 1; m = u8(b, pos + 1) }
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) { pos += 2 }
      else if (m == 0xD9) return None // EOI before SOS
      else {
        val len = be16(b, pos + 2)
        if (len < 2 || pos + 2 + len > b.length) return None
        val seg = pos + 4
        val segEnd = pos + 2 + len
        m match {
          case 0xDB => // DQT
            var p = seg
            while (p < segEnd) {
              val pq = u8(b, p) >> 4
              val tq = u8(b, p) & 15
              if (pq != 0 || tq > 3) return None // 8-bit tables only
              if (p + 65 > segEnd) return None
              quant(tq) = Array.tabulate(64)(k => u8(b, p + 1 + k))
              p += 65
            }
          case 0xC4 => // DHT
            var p = seg
            while (p + 17 <= segEnd) {
              val tc = u8(b, p) >> 4
              val th = u8(b, p) & 15
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(k => u8(b, p + 1 + k))
              val n = counts.sum
              if (p + 17 + n > segEnd) return None
              val syms = Array.tabulate(n)(k => u8(b, p + 17 + k))
              val t = new Huff(counts, syms)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + n
            }
          case 0xC0 | 0xC1 => // SOF0 / SOF1 (both Huffman sequential)
            if (u8(b, seg) != 8) return None // 8-bit precision only
            h = be16(b, seg + 1)
            w = be16(b, seg + 3)
            if (w <= 0 || h <= 0 ||
              w > MergeSpec.MaxImageDim || h > MergeSpec.MaxImageDim) return None
            val nc = u8(b, seg + 5)
            if (nc != 1 && nc != 3) return None
            if (seg + 6 + nc * 3 > segEnd) return None // specs must fit the segment
            comps = Array.tabulate(nc) { c =>
              val p = seg + 6 + c * 3
              Comp(u8(b, p), u8(b, p + 1) >> 4, u8(b, p + 1) & 15, u8(b, p + 2))
            }
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // progressive / arithmetic / lossless — out of scope
          case 0xDD => // DRI
            restartInterval = be16(b, seg)
          case 0xDA => // SOS — entropy decode starts after this segment
            if (comps == null || w < 0) return None
            val ns = u8(b, seg)
            if (ns != comps.length) return None // single interleaved scan only
            if (seg + 1 + ns * 2 + 3 > segEnd) return None // specs must fit the segment
            val scanDc = new Array[Int](comps.length)
            val scanAc = new Array[Int](comps.length)
            var c = 0
            while (c < ns) {
              val cs = u8(b, seg + 1 + c * 2)
              val tt = u8(b, seg + 2 + c * 2)
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0) return None
              scanDc(ci) = tt >> 4
              scanAc(ci) = tt & 15
              c += 1
            }
            return entropyScan(b, segEnd, w, h, comps, quant, dcTabs, acTabs,
              scanDc, scanAc, restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        pos += 2 + len
      }
    }
    None
  }

  private def entropyScan(
      b: Array[Byte], start: Int, w: Int, h: Int, compsIn: Array[Comp],
      quant: Array[Array[Int]], dcTabs: Array[Huff], acTabs: Array[Huff],
      scanDc: Array[Int], scanAc: Array[Int],
      restartInterval: Int): Option[PixelDecode.Luma] = {
    // ITU T.81 A.2: a SINGLE-component scan is non-interleaved — the MCU
    // is one 8×8 block and the declared sampling factors do NOT tile the
    // scan (grayscale JPEGs commonly declare 2×2 sampling anyway)
    val comps =
      if (compsIn.length == 1) Array(compsIn(0).copy(h = 1, v = 1)) else compsIn
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    if (hMax < 1 || hMax > 4 || vMax < 1 || vMax > 4) return None
    // luma-only contract: Y must be the max-sampling component
    if (comps(0).h != hMax || comps(0).v != vMax) return None
    comps.foreach { c =>
      if (c.h < 1 || c.v < 1) return None
      if (quant(c.tq) == null) return None
    }
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    val yPlaneW = mcusX * hMax * 8
    val yPlane = new Array[Byte](yPlaneW * mcusY * vMax * 8)
    val reader = new BitReader(b, start)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val px = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!reader.restart()) return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val qt = quant(comp.tq)
        val dcT = dcTabs(scanDc(ci))
        val acT = acTabs(scanAc(ci))
        if (dcT == null || acT == null) return None
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            // decode one block
            java.util.Arrays.fill(coef, 0.0)
            val t = reader.decodeHuff(dcT)
            if (t < 0 || t > 15) return None
            val diffBits = if (t == 0) 0 else reader.bits(t)
            if (diffBits < 0) return None
            dcPred(ci) += extend(diffBits, t)
            coef(0) = dcPred(ci).toDouble * qt(0)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = reader.decodeHuff(acT)
              if (rs < 0) return None
              val r = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else open = false    // EOB
              } else {
                k += r
                if (k > 63) return None
                val vb = reader.bits(s)
                if (vb < 0) return None
                coef(Zigzag(k)) = extend(vb, s).toDouble * qt(k)
                k += 1
              }
            }
            if (ci == 0) { // Y block: IDCT into the luma plane
              idct(coef, px)
              val x0 = (mx * hMax + bx) * 8
              val y0 = (my * vMax + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                val row = (y0 + yy) * yPlaneW + x0
                while (xx < 8) { yPlane(row + xx) = px(yy * 8 + xx).toByte; xx += 1 }
                yy += 1
              }
            } // chroma blocks: decoded for stream sync, discarded
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // crop the padded plane to the image dims
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(yPlane, y * yPlaneW, out, y * w, w)
      y += 1
    }
    Some(PixelDecode.Luma(w, h, out))
  }
}
