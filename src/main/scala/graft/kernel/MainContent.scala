package graft.kernel

import scala.collection.mutable.ArrayBuffer
import graft.model.Span

/** Main-content selection over a DomArena: trafilatura/boilerpipe-style
  * boilerplate strip using (a) tag blocklists, (b) class/id token
  * blocklists, (c) per-block link-density — emitting extracted text plus
  * character-span offsets per kept block.
  *
  * This is the HTML analogue of the reference's per-unit extract
  * (ocr_service.py:114-156): where tesseract turns one page image into a
  * text string, this turns one HTML payload into the page's main text.
  * The A3 preprocess analogue (charset/entity/whitespace normalization —
  * ocr_service.py:85-112's "fall back to raw on error" contract) is the
  * normalization pass here, total by construction.
  */
object MainContent {

  /** elements whose entire subtree is never content */
  private val prunedTags = Set(
    "script", "style", "noscript", "template", "head", "title",
    "nav", "header", "footer", "aside", "form", "iframe", "svg",
    "button", "select", "option", "object", "textarea")

  /** class/id tokens that mark chrome/boilerplate subtrees */
  private val blockedClassTokens = Set(
    "nav", "navbar", "menu", "sidebar", "footer", "header", "banner",
    "ad", "ads", "advert", "advertisement", "adsense", "cookie",
    "breadcrumb", "breadcrumbs", "share", "social", "comment", "comments",
    "related", "widget", "promo", "sponsor", "sponsored", "popup",
    "modal", "subscribe", "newsletter", "pagination", "masthead", "toolbar")

  /** inline (phrasing) elements — everything else is a block boundary */
  private val inlineTags = Set(
    "a", "b", "i", "em", "strong", "span", "u", "s", "small", "big",
    "code", "sub", "sup", "abbr", "cite", "q", "time", "mark", "label",
    "br", "img", "wbr", "kbd", "samp", "var", "bdi", "bdo", "data",
    "dfn", "ins", "del", "ruby", "rt", "rp", "tt", "font", "#text")

  private val headingTags = Set("h1", "h2", "h3", "h4", "h5", "h6")

  /** boilerpipe-style cut: a block more than half of whose characters are
    * anchor text is navigation, not content */
  private val MaxLinkDensity = 0.5

  private def classBlocked(classId: String): Boolean = {
    if (classId.isEmpty) return false
    var i = 0
    val n = classId.length
    while (i < n) {
      while (i < n && !isTokChar(classId.charAt(i))) i += 1
      val s = i
      while (i < n && isTokChar(classId.charAt(i))) i += 1
      if (i > s && blockedClassTokens.contains(classId.substring(s, i))) return true
    }
    false
  }
  private def isTokChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** collapse whitespace runs to single spaces and trim */
  def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == '\u00a0') pendingSpace = true
      else {
        if (pendingSpace && sb.length() > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** `normalize(s).length` without allocating the string (hot path:
    * link-density counting runs once per text node).
    */
  private def normLen(s: String): Int = {
    var i = 0
    var len = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == '\u00a0') pendingSpace = true
      else {
        if (pendingSpace && len > 0) len += 1
        pendingSpace = false
        len += 1
      }
      i += 1
    }
    len
  }

  final case class Result(text: String, spans: Seq[Span])

  def extract(html: String): Result = extract(html, new DomArena())

  /** Reusable-arena variant (one arena per partition in the kernel). */
  def extract(html: String, reuse: DomArena): Result =
    finish(DomArena.buildInto(reuse, html))

  /** Byte-path variant: no full-document UTF-16 decode (the kernel's hot
    * path; equivalence with the string path is scalacheck-asserted).
    */
  def extractBytes(bytes: Array[Byte], reuse: DomArena): Result =
    finish(DomArena.buildIntoBytes(reuse, bytes))

  def extractBytes(bytes: Array[Byte]): Result = extractBytes(bytes, new DomArena())

  private def finish(arena: DomArena): Result = {
    val flags = computeFlags(arena)
    if (arena.heapBacked) finishBytes(arena, flags) else finishChars(arena, flags)
  }

  private final class Flags(val pruned: Array[Boolean], val inLink: Array[Boolean],
      val nearestBlock: Array[Int])

  /** Inherited per-node flags; node order == document (pre)order. Shared
    * by the char and byte output paths (representation-independent).
    */
  private def computeFlags(arena: DomArena): Flags = {
    val n = arena.size
    val pruned = new Array[Boolean](n)
    val inLink = new Array[Boolean](n)
    val nearestBlock = new Array[Int](n)
    var i = 0
    while (i < n) {
      val p = arena.parent(i)
      val t = arena.tag(i)
      if (p < 0) { pruned(i) = false; inLink(i) = false; nearestBlock(i) = i }
      else {
        pruned(i) = pruned(p) || prunedTags.contains(t) || classBlocked(arena.classId(i))
        inLink(i) = inLink(p) || t == "a"
        nearestBlock(i) = if (inlineTags.contains(t)) nearestBlock(p) else i
      }
      i += 1
    }
    new Flags(pruned, inLink, nearestBlock)
  }

  private def finishChars(arena: DomArena, flags: Flags): Result = {
    val n = arena.size
    val pruned = flags.pruned
    val inLink = flags.inLink
    val nearestBlock = flags.nearestBlock

    // Segment text nodes by nearest block ancestor (document order), then
    // stream selected segments straight into the output builder — the
    // text bytes are copied exactly once (token string → outText) instead
    // of token → seg buffer → normalized copy → outText. Semantics are
    // identical to normalize(concat of segment texts): the pendingSpace
    // state carries across node boundaries, leading/trailing whitespace
    // of a segment never emits.
    val outText = new java.lang.StringBuilder(256)
    val spans = new ArrayBuffer[Span](16)
    var i = 0
    while (i < n) {
      if (arena.isText(i) && !pruned(i)) {
        val blk = nearestBlock(i)
        // find the segment: run of visible text nodes with this block
        var end = i // exclusive end, advanced below
        var totalChars = 0
        var linkChars = 0
        var j = i
        var done = false
        while (j < n && !done) {
          if (arena.isText(j) && !pruned(j)) {
            if (nearestBlock(j) != blk) done = true
            else {
              val nl = normLen(arena.text(j))
              if (nl > 0) {
                totalChars += nl
                if (inLink(j)) linkChars += nl
              }
              end = j + 1
            }
          }
          if (!done) j += 1
        }
        if (totalChars > 0) { // normalize(concat) nonempty ⟺ some node visible
          val kind = arena.tag(blk)
          val heading = headingTags.contains(kind)
          val density = linkChars.toDouble / totalChars
          if (heading || density <= MaxLinkDensity) {
            if (outText.length() > 0) outText.append("\n\n")
            val start = outText.length().toLong
            val segStart = outText.length()
            var pendingSpace = false
            var k = i
            while (k < end) {
              if (arena.isText(k) && !pruned(k)) {
                val s = arena.text(k)
                var ci = 0
                while (ci < s.length) {
                  val c = s.charAt(ci)
                  if (Character.isWhitespace(c) || c == '\u00a0') pendingSpace = true
                  else {
                    if (pendingSpace && outText.length() > segStart) outText.append(' ')
                    pendingSpace = false
                    outText.append(c)
                  }
                  ci += 1
                }
              }
              k += 1
            }
            spans += Span(start, outText.length().toLong, kind)
          }
        }
        i = end
      } else i += 1
    }
    Result(outText.toString, spans.toSeq)
  }

  // ====================================================================
  // Byte-level output path — for heap-backed arenas (valid-UTF-8 input):
  // text nodes are UTF-8 slices, the output is assembled as UTF-8 bytes,
  // and the document's kept text is decoded to a String exactly ONCE at
  // the end. Per 43 KB Common-Crawl-sized page this removes every
  // per-text-node String allocation and the two UTF-16 copies of the
  // (mostly discarded) chrome text. Spans are UTF-16 offsets, tracked
  // incrementally while appending (cp > 0xFFFF counts 2 units) — byte/
  // char path equality is scalacheck- and fuzz-asserted.
  // ====================================================================

  /** code point at arr(i) — input pre-validated UTF-8, lead byte >= 0x80 */
  private def cpAt(arr: Array[Byte], i: Int): Int = {
    val c = arr(i) & 0xff
    if (c < 0xe0) ((c & 0x1f) << 6) | (arr(i + 1) & 0x3f)
    else if (c < 0xf0)
      ((c & 0x0f) << 12) | ((arr(i + 1) & 0x3f) << 6) | (arr(i + 2) & 0x3f)
    else
      ((c & 0x07) << 18) | ((arr(i + 1) & 0x3f) << 12) |
        ((arr(i + 2) & 0x3f) << 6) | (arr(i + 3) & 0x3f)
  }
  private def seqLen(lead: Int): Int =
    if (lead < 0x80) 1 else if (lead < 0xe0) 2 else if (lead < 0xf0) 3 else 4

  private def isWsAscii(c: Int): Boolean =
    c == ' ' || (c >= 0x09 && c <= 0x0d) || (c >= 0x1c && c <= 0x1f)

  /** `normLen` over a UTF-8 slice: normalized length in UTF-16 units —
    * exact byte mirror of the char version (Character.isWhitespace on
    * decoded code points, U+00A0 counted as whitespace).
    */
  private def normLen16(arr: Array[Byte], off: Int, len: Int): Int = {
    var i = off
    val end = off + len
    var out = 0
    var pendingSpace = false
    while (i < end) {
      val c = arr(i) & 0xff
      if (c < 0x80) {
        if (isWsAscii(c)) { pendingSpace = true; i += 1 }
        else {
          // run of plain ASCII: one length add per run instead of one
          // state-machine step per byte (no whitespace inside the run by
          // construction — identical count)
          var run = i + 1
          while (run < end && {
            val d = arr(run) & 0xff; d < 0x80 && !isWsAscii(d)
          }) run += 1
          if (pendingSpace && out > 0) out += 1
          pendingSpace = false
          out += run - i
          i = run
        }
      } else {
        val cp = cpAt(arr, i)
        if (Character.isWhitespace(cp) || cp == 0xa0) pendingSpace = true
        else {
          if (pendingSpace && out > 0) out += 1
          pendingSpace = false
          out += (if (cp > 0xffff) 2 else 1)
        }
        i += seqLen(c)
      }
    }
    out
  }

  private def finishBytes(arena: DomArena, flags: Flags): Result = {
    val n = arena.size
    val pruned = flags.pruned
    val inLink = flags.inLink
    val nearestBlock = flags.nearestBlock
    val heap = arena.heap.arr

    val out = new HtmlTokenizer.ByteBuf(512)
    var out16 = 0 // UTF-16 length of out's content (span offsets)
    val spans = new ArrayBuffer[Span](16)
    var i = 0
    while (i < n) {
      if (arena.isText(i) && !pruned(i)) {
        val blk = nearestBlock(i)
        var end = i
        var totalChars = 0
        var linkChars = 0
        var j = i
        var done = false
        while (j < n && !done) {
          if (arena.isText(j) && !pruned(j)) {
            if (nearestBlock(j) != blk) done = true
            else {
              val nl = normLen16(heap, arena.textOff(j), arena.textLen(j))
              if (nl > 0) {
                totalChars += nl
                if (inLink(j)) linkChars += nl
              }
              end = j + 1
            }
          }
          if (!done) j += 1
        }
        if (totalChars > 0) {
          val kind = arena.tag(blk)
          val heading = headingTags.contains(kind)
          val density = linkChars.toDouble / totalChars
          if (heading || density <= MaxLinkDensity) {
            if (out16 > 0) {
              out.appendByte('\n'); out.appendByte('\n'); out16 += 2
            }
            val start16 = out16
            var pendingSpace = false
            var k = i
            while (k < end) {
              if (arena.isText(k) && !pruned(k)) {
                var ci = arena.textOff(k)
                val cEnd = ci + arena.textLen(k)
                while (ci < cEnd) {
                  val c = heap(ci) & 0xff
                  if (c < 0x80) {
                    if (isWsAscii(c)) { pendingSpace = true; ci += 1 }
                    else {
                      // bulk-copy the run of plain non-ws ASCII (the
                      // dominant byte class) — one arraycopy per run
                      // instead of one appendByte per byte
                      var run = ci + 1
                      while (run < cEnd && {
                        val d = heap(run) & 0xff; d < 0x80 && !isWsAscii(d)
                      }) run += 1
                      if (pendingSpace && out16 > start16) { out.appendByte(' '); out16 += 1 }
                      pendingSpace = false
                      out.append(heap, ci, run - ci)
                      out16 += run - ci
                      ci = run
                    }
                  } else {
                    val cp = cpAt(heap, ci)
                    val sl = seqLen(c)
                    if (Character.isWhitespace(cp) || cp == 0xa0) pendingSpace = true
                    else {
                      if (pendingSpace && out16 > start16) { out.appendByte(' '); out16 += 1 }
                      pendingSpace = false
                      out.append(heap, ci, sl)
                      out16 += (if (cp > 0xffff) 2 else 1)
                    }
                    ci += sl
                  }
                }
              }
              k += 1
            }
            spans += Span(start16.toLong, out16.toLong, kind)
          }
        }
        i = end
      } else i += 1
    }
    Result(new String(out.arr, 0, out.len,
      java.nio.charset.StandardCharsets.UTF_8), spans.toSeq)
  }
}
