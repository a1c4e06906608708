package graft.kernel

/** From-scratch baseline JPEG decoder, luma plane only — the last piece
  * of the multimodal pixel seam (operators.Multimodal scaladoc). Pure
  * JVM, no codec dependency: marker walk (DQT/DHT/SOF0-1/DRI/SOS),
  * MSB-first entropy bit reader with 0xFF00 byte-unstuffing and RSTn
  * restart handling, canonical Huffman decode, dequantization, and an
  * 8×8 inverse DCT.
  *
  * Scope (total — anything outside returns None, never throws):
  *   - Baseline/extended sequential Huffman (SOF0/SOF1) and progressive
  *     (SOF2: spectral selection + successive approximation, DC and AC
  *     first/refinement scans with EOBRUN); arithmetic coding, lossless,
  *     hierarchical, and 12-bit precision return None.
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
    var progressive = false
    var st: ProgState = null // progressive coefficient store, built at first SOS
    var pos = 2
    while (pos + 2 <= b.length) { // EOI is a bare 2-byte marker
      if (u8(b, pos) != 0xFF) return None
      var m = u8(b, pos + 1)
      while (m == 0xFF && pos + 2 < b.length) { pos += 1; m = u8(b, pos + 1) }
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) { pos += 2 }
      else if (m == 0xD9) {
        // EOI: progressive frames finish here (coefficients accumulated
        // across the preceding scans); for sequential it's premature
        return if (progressive && st != null) finishProgressive(st, quant) else None
      }
      else {
        if (pos + 4 > b.length) return None // truncated segment header
        val len = be16(b, pos + 2)
        if (len < 2 || pos + 2 + len > b.length) return None
        val seg = pos + 4
        val segEnd = pos + 2 + len
        var posOverride = -1 // a progressive SOS jumps past its entropy data
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
          case 0xC0 | 0xC1 | 0xC2 => // SOF0/SOF1 (sequential) or SOF2 (progressive)
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
            progressive = m == 0xC2
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // arithmetic / lossless / hierarchical — out of scope
          case 0xDD => // DRI
            restartInterval = be16(b, seg)
          case 0xDA => // SOS — entropy data starts after this segment
            if (comps == null || w < 0) return None
            val ns = u8(b, seg)
            if (ns < 1 || ns > comps.length) return None
            if (seg + 1 + ns * 2 + 3 > segEnd) return None // specs must fit the segment
            if (!progressive) {
              if (ns != comps.length) return None // single interleaved scan only
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
            }
            // progressive: accumulate this scan's coefficients, then keep
            // walking markers (DHT/DQT/DRI may precede further scans)
            if (st == null) {
              st = ProgState.build(comps, w, h).getOrElse(return None)
            }
            val scanComps = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cs = u8(b, seg + 1 + c * 2)
              val tt = u8(b, seg + 2 + c * 2)
              val ci = st.comps.indexWhere(_.id == cs)
              if (ci < 0) return None
              scanComps(c) = ci
              scanDc(c) = tt >> 4
              scanAc(c) = tt & 15
              c += 1
            }
            // Ss/Se/Ah/Al sit at FIXED offsets after the component specs
            // (B.2.3) — reading from segEnd would misparse an SOS whose
            // declared length carries trailing padding, and a wrong band/
            // bit-plane means wrong pixels, not a refusal
            val trio = seg + 1 + ns * 2
            val ss = u8(b, trio)
            val se = u8(b, trio + 1)
            val ah = u8(b, trio + 2) >> 4
            val al = u8(b, trio + 2) & 15
            val nxt = progressiveScan(b, segEnd, st, scanComps, scanDc, scanAc,
              ss, se, ah, al, dcTabs, acTabs, restartInterval)
            if (nxt < 0) return None
            posOverride = nxt
          case _ => () // APPn / COM / others: skip
        }
        pos = if (posOverride >= 0) posOverride else pos + 2 + len
      }
    }
    None
  }

  // ------------------------------------------------------------------
  // Progressive (SOF2): coefficients accumulate across scans — spectral
  // selection bands (Ss..Se) and successive-approximation bit planes
  // (Ah/Al) — then one dequant+IDCT pass at EOI. Only the Y plane is
  // rendered, but every component's coefficients are tracked so the
  // entropy stream stays in sync through interleaved DC scans.
  // ------------------------------------------------------------------

  /** Per-frame progressive state: one flat Int array per component over
    * the MCU-padded block grid, 64 coefficients per block in ZIGZAG
    * order (DC at 0 in either order; quant tables are zigzag-indexed).
    */
  private final class ProgState(
      val comps: Array[Comp], val w: Int, val h: Int,
      val hMax: Int, val vMax: Int, val mcusX: Int, val mcusY: Int,
      val blocksPerLine: Array[Int], val blocksPerCol: Array[Int],
      val niCols: Array[Int], val niRows: Array[Int],
      val coefs: Array[Array[Int]]) {
    val dcPred = new Array[Int](comps.length)
  }

  private object ProgState {
    def build(compsIn: Array[Comp], w: Int, h: Int): Option[ProgState] = {
      // single-component frames: scans are non-interleaved, declared
      // sampling does not tile (same T.81 A.2 rule as the baseline path)
      val comps =
        if (compsIn.length == 1) Array(compsIn(0).copy(h = 1, v = 1)) else compsIn
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      if (hMax < 1 || hMax > 4 || vMax < 1 || vMax > 4) return None
      if (comps(0).h != hMax || comps(0).v != vMax) return None // luma-only contract
      if (comps.exists(c => c.h < 1 || c.v < 1)) return None
      val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      val bpl = comps.map(c => mcusX * c.h)
      val bpc = comps.map(c => mcusY * c.v)
      // non-interleaved grids: ceil of the component's true pixel dims
      val niCols = comps.map(c => ((w * c.h + hMax - 1) / hMax + 7) / 8)
      val niRows = comps.map(c => ((h * c.v + vMax - 1) / vMax + 7) / 8)
      // coefficient memory is bounded by the MaxImageDim cap; guard the
      // pathological sampling corner anyway (3 comps × 4×4 at 4096²)
      val totalInts = comps.indices.map(i => bpl(i).toLong * bpc(i) * 64).sum
      if (totalInts > (64L << 20)) return None
      val coefs = comps.indices.map(i => new Array[Int](bpl(i) * bpc(i) * 64)).toArray
      Some(new ProgState(comps, w, h, hMax, vMax, mcusX, mcusY, bpl, bpc,
        niCols, niRows, coefs))
    }
  }

  /** Decode ONE progressive scan's entropy data (T.81 G.2), mutating the
    * coefficient store; returns the position of the next marker, or -1
    * on malformation.
    */
  private def progressiveScan(
      b: Array[Byte], start: Int, st: ProgState,
      scanComps: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      dcTabs: Array[Huff], acTabs: Array[Huff],
      restartInterval: Int): Int = {
    val ns = scanComps.length
    val isDc = ss == 0
    if (isDc && se != 0) return -1
    if (!isDc && (ns != 1 || se > 63 || ss > se)) return -1 // AC scans: one component
    if (al > 13 || ah > 14) return -1
    val reader = new BitReader(b, start)
    java.util.Arrays.fill(st.dcPred, 0)
    var eobrun = 0

    def refineBit(blk: Array[Int], i: Int): Boolean = {
      val x = reader.bit()
      if (x < 0) return false
      if (x == 1 && (blk(i) & (1 << al)) == 0)
        blk(i) += (if (blk(i) > 0) 1 << al else -(1 << al))
      true
    }

    // one block in a DC scan (sci = scan-component slot, blk/off its store)
    def dcBlock(sci: Int, blk: Array[Int], off: Int): Boolean = {
      if (ah == 0) {
        val dcT = dcTabs(scanDc(sci))
        if (dcT == null) return false
        val t = reader.decodeHuff(dcT)
        if (t < 0 || t > 15) return false
        val db = if (t == 0) 0 else { val x = reader.bits(t); if (x < 0) return false; x }
        st.dcPred(scanComps(sci)) += extend(db, t)
        blk(off) = st.dcPred(scanComps(sci)) << al
      } else {
        val x = reader.bit()
        if (x < 0) return false
        if (x == 1) blk(off) |= 1 << al
      }
      true
    }

    def acFirstBlock(acT: Huff, blk: Array[Int], off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = reader.decodeHuff(acT)
        if (rs < 0) return false
        val r = rs >> 4
        val sv = rs & 15
        if (sv == 0) {
          if (r < 15) { // EOBn: this block done, r-coded more to skip
            eobrun = (1 << r) - 1
            if (r > 0) { val x = reader.bits(r); if (x < 0) return false; eobrun += x }
            return true
          }
          k += 16 // ZRL
        } else {
          k += r
          if (k > se) return false
          val vb = reader.bits(sv)
          if (vb < 0) return false
          blk(off + k) = extend(vb, sv) << al
          k += 1
        }
      }
      true
    }

    def acRefineBlock(acT: Huff, blk: Array[Int], off: Int): Boolean = {
      var k = ss
      if (eobrun > 0) { // covered by a previous EOBn: corrections only
        eobrun -= 1
        while (k <= se) {
          if (blk(off + k) != 0 && !refineBit(blk, off + k)) return false
          k += 1
        }
        return true
      }
      while (k <= se) {
        val rs = reader.decodeHuff(acT)
        if (rs < 0) return false
        var r = rs >> 4
        val sv = rs & 15
        var newVal = 0
        if (sv == 0) {
          if (r < 15) { // EOBn: refine this block's remaining history, then skip
            eobrun = (1 << r) - 1
            if (r > 0) { val x = reader.bits(r); if (x < 0) return false; eobrun += x }
            while (k <= se) {
              if (blk(off + k) != 0 && !refineBit(blk, off + k)) return false
              k += 1
            }
            return true
          }
          // ZRL: 16 zero-history slots consumed below with r = 15
        } else {
          if (sv != 1) return false // refinement introduces only ±1<<Al
          val sign = reader.bit()
          if (sign < 0) return false
          newVal = if (sign == 1) 1 << al else -(1 << al)
        }
        // walk: corrections ride nonzero-history slots; r counts down on
        // zero-history slots; the (r+1)-th zero-history slot takes newVal
        var placed = false
        while (k <= se && !placed) {
          if (blk(off + k) != 0) {
            if (!refineBit(blk, off + k)) return false
          } else if (r == 0) {
            if (newVal != 0) blk(off + k) = newVal
            placed = true
          } else r -= 1
          k += 1
        }
        if (!placed && newVal != 0) return false // ran off the band
      }
      true
    }

    def oneBlock(sci: Int, blk: Array[Int], off: Int): Boolean =
      if (isDc) dcBlock(sci, blk, off)
      else {
        val acT = acTabs(scanAc(sci))
        if (acT == null) false
        else if (ah == 0) acFirstBlock(acT, blk, off)
        else acRefineBlock(acT, blk, off)
      }

    def atRestart(unit: Int): Boolean =
      restartInterval > 0 && unit > 0 && unit % restartInterval == 0

    def restart(): Boolean = {
      if (!reader.restart()) return false
      java.util.Arrays.fill(st.dcPred, 0)
      eobrun = 0
      true
    }

    if (isDc && ns > 1) { // interleaved DC: MCU order across components
      val nMcus = st.mcusX * st.mcusY
      var mcu = 0
      while (mcu < nMcus) {
        if (atRestart(mcu) && !restart()) return -1
        val mx = mcu % st.mcusX
        val my = mcu / st.mcusX
        var sci = 0
        while (sci < ns) {
          val ci = scanComps(sci)
          val comp = st.comps(ci)
          val blk = st.coefs(ci)
          var by = 0
          while (by < comp.v) {
            var bx = 0
            while (bx < comp.h) {
              val off = ((my * comp.v + by) * st.blocksPerLine(ci) +
                (mx * comp.h + bx)) * 64
              if (!oneBlock(sci, blk, off)) return -1
              bx += 1
            }
            by += 1
          }
          sci += 1
        }
        mcu += 1
      }
    } else { // single-component scan (all AC scans; DC over one comp)
      val ci = scanComps(0)
      val blk = st.coefs(ci)
      val rows = st.niRows(ci)
      val cols = st.niCols(ci)
      var n = 0
      val total = rows * cols
      while (n < total) {
        if (atRestart(n) && !restart()) return -1
        val off = ((n / cols) * st.blocksPerLine(ci) + n % cols) * 64
        if (!oneBlock(0, blk, off)) return -1
        n += 1
      }
    }
    nextMarkerPos(b, reader.pos)
  }

  /** First non-stuffed, non-RST marker at or after `from`. */
  private def nextMarkerPos(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < b.length) {
      if (u8(b, p) == 0xFF) {
        val m = u8(b, p + 1)
        if (m != 0x00 && m != 0xFF && !(m >= 0xD0 && m <= 0xD7)) return p
        p += (if (m == 0xFF) 1 else 2)
      } else p += 1
    }
    b.length
  }

  /** Dequantize + IDCT the accumulated Y coefficients, crop to (w, h). */
  private def finishProgressive(st: ProgState,
      quant: Array[Array[Int]]): Option[PixelDecode.Luma] = {
    val qt = quant(st.comps(0).tq)
    if (qt == null) return None
    val bpl = st.blocksPerLine(0)
    val bpc = st.blocksPerCol(0)
    val yPlaneW = bpl * 8
    val yPlane = new Array[Byte](yPlaneW * bpc * 8)
    val y = st.coefs(0)
    val coefN = new Array[Double](64)
    val px = new Array[Int](64)
    var br = 0
    while (br < bpc) {
      var bc = 0
      while (bc < bpl) {
        val off = (br * bpl + bc) * 64
        java.util.Arrays.fill(coefN, 0.0)
        var k = 0
        while (k < 64) { coefN(Zigzag(k)) = y(off + k).toDouble * qt(k); k += 1 }
        idct(coefN, px)
        val x0 = bc * 8
        val y0 = br * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          val row = (y0 + yy) * yPlaneW + x0
          while (xx < 8) { yPlane(row + xx) = px(yy * 8 + xx).toByte; xx += 1 }
          yy += 1
        }
        bc += 1
      }
      br += 1
    }
    val out = new Array[Byte](st.w * st.h)
    var r = 0
    while (r < st.h) {
      System.arraycopy(yPlane, r * yPlaneW, out, r * st.w, st.w)
      r += 1
    }
    Some(PixelDecode.Luma(st.w, st.h, out))
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
