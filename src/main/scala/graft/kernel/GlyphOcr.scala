package graft.kernel

/** From-scratch glyph OCR for machine-rendered text — the final step of
  * the image branch the reference delegates to Tesseract
  * (ocr_service.py:114-156) or a vision LLM (llm_service.py:319-365).
  * Matching those engines byte-for-byte is impossible without their
  * models; what CAN be built from scratch is the full pipeline shape —
  * binary payload → pixel decode → binarize → line/glyph segmentation →
  * glyph classification → text — with the glyph MODEL swapped for an
  * exact template matcher over a built-in 5×7 bitmap font. The plumbing
  * (totality, determinism, narrow per-row kernel map) is production
  * shaped; the model is the documented seam (SURVEY §8).
  *
  * Recognition contract (total — anything outside returns None):
  *   - Ink = luma < 128 (dark-on-light), any uniform integer scale.
  *   - Alphabet: A–Z and 0–9 (every glyph spans the full 7-row height,
  *     which anchors per-line scale inference); word gaps ≥ a space
  *     cell collapse to one space; blank row bands separate lines.
  *   - Unknown glyph patterns or non-integral scales → None, never a
  *     wrong character (the kernel bad-unit-is-data rule: a mismatch is
  *     better surfaced as unrecognized than silently misread).
  */
object GlyphOcr {

  /** 5×7 glyphs, one Int per row, bit 4 = leftmost column. */
  private[graft] val Glyphs: Map[Char, Array[Int]] = Map(
    'A' -> Array(0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    'B' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    'C' -> Array(0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    'D' -> Array(0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    'E' -> Array(0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    'F' -> Array(0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    'G' -> Array(0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0E),
    'H' -> Array(0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    'I' -> Array(0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    'J' -> Array(0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    'K' -> Array(0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    'L' -> Array(0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    'M' -> Array(0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    'N' -> Array(0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    'O' -> Array(0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    'P' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    'Q' -> Array(0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    'R' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    'S' -> Array(0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    'T' -> Array(0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    'U' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    'V' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    'W' -> Array(0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    'X' -> Array(0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    'Y' -> Array(0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    'Z' -> Array(0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    '0' -> Array(0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    '1' -> Array(0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    '2' -> Array(0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    '3' -> Array(0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    '4' -> Array(0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    '5' -> Array(0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    '6' -> Array(0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    '7' -> Array(0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    '8' -> Array(0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    '9' -> Array(0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C))

  /** Glyph cell width in columns (5 ink + 1 spacing). */
  private[graft] val CellW = 6
  /** Line pitch in rows (7 ink + 2 leading). */
  private[graft] val LinePitch = 9

  /** Per-glyph trimmed ink pattern → char. The trimmed pattern is the
    * glyph restricted to its ink-column span (every glyph spans all 7
    * rows), serialized as "w:bits,bits,..." — collision-checked at
    * class-load so a font edit cannot silently make two glyphs
    * ambiguous.
    */
  private val trimmed: Map[String, Char] = {
    val m = Glyphs.toSeq.map { case (c, rows) =>
      // column k (0 = leftmost) carries bit (4 - k); trim to the ink span
      val mask = rows.reduce(_ | _)
      val cols = (0 to 4).filter(k => (mask & (1 << (4 - k))) != 0)
      val w = cols.last - cols.head + 1
      val key = w + ":" + rows.map(r => (r >> (4 - cols.last)) & ((1 << w) - 1)).mkString(",")
      key -> c
    }
    require(m.map(_._1).distinct.size == m.size, "font has ambiguous trimmed glyphs")
    m.toMap
  }

  /** Normalize arbitrary text to the recognizer alphabet: uppercase,
    * anything outside [A-Z0-9] becomes a space, runs collapse, ends
    * trim. Shared by the renderer harness and the ground-truth side so
    * both speak the same language.
    */
  def normalize(text: String): String =
    text.toUpperCase(java.util.Locale.ROOT)
      .map(c => if (Glyphs.contains(c)) c else ' ')
      .replaceAll(" +", " ").trim

  /** Recognize machine-rendered text in a decoded luma image. */
  def recognize(img: PixelDecode.Luma): Option[String] = {
    if (img == null || img.width <= 0 || img.height <= 0) return None
    try run(img) catch { case _: Exception => None }
  }

  private def run(img: PixelDecode.Luma): Option[String] = {
    val w = img.width
    val h = img.height
    def ink(x: Int, y: Int): Boolean = (img.luma(y * w + x) & 0xff) < 128
    def rowHasInk(y: Int): Boolean = { var x = 0; while (x < w) { if (ink(x, y)) return true; x += 1 }; false }
    // line bands: maximal runs of ink rows
    val lines = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // [y0, y1)
    var y = 0
    while (y < h) {
      if (rowHasInk(y)) {
        var y1 = y
        while (y1 < h && rowHasInk(y1)) y1 += 1
        lines += ((y, y1))
        y = y1
      } else y += 1
    }
    if (lines.isEmpty) return Some("")
    val sb = new java.lang.StringBuilder
    var first = true
    lines.foreach { case (y0, y1) =>
      val bandH = y1 - y0
      if (bandH % 7 != 0) return None // every glyph is 7 rows tall
      val s = bandH / 7
      def colHasInk(x: Int): Boolean = { var yy = y0; while (yy < y1) { if (ink(x, yy)) return true; yy += 1 }; false }
      // glyph segments: maximal ink-column runs within the band
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var x = 0
      while (x < w) {
        if (colHasInk(x)) {
          var x1 = x
          while (x1 < w && colHasInk(x1)) x1 += 1
          segs += ((x, x1))
          x = x1
        } else x += 1
      }
      if (!first) sb.append('\n')
      first = false
      var prevEnd = -1
      segs.foreach { case (x0, x1) =>
        val segW = x1 - x0
        if (segW % s != 0) return None
        val wCells = segW / s
        if (wCells < 1 || wCells > 5) return None
        // a gap of at least one whole empty glyph cell is a word space
        if (prevEnd >= 0 && x0 - prevEnd >= CellW * s) sb.append(' ')
        prevEnd = x1
        // downsample the s×s blocks by majority vote
        val key = new java.lang.StringBuilder(wCells + 1 + 7 * 3)
        key.append(wCells).append(':')
        var r = 0
        while (r < 7) {
          var bits = 0
          var c = 0
          while (c < wCells) {
            var dark = 0
            var yy = y0 + r * s
            val yEnd = yy + s
            while (yy < yEnd) {
              var xx = x0 + c * s
              val xEnd = xx + s
              while (xx < xEnd) { if (ink(xx, yy)) dark += 1; xx += 1 }
              yy += 1
            }
            bits = (bits << 1) | (if (dark * 2 > s * s) 1 else 0)
            c += 1
          }
          key.append(bits)
          if (r < 6) key.append(',')
          r += 1
        }
        trimmed.get(key.toString) match {
          case Some(ch) => sb.append(ch)
          case None     => return None // unknown pattern: refuse, don't guess
        }
      }
    }
    Some(sb.toString)
  }
}
