package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Streaming HTML tokenizer: one forward pass, no regex, no backtracking,
  * total (never throws on any input — scalacheck-verified).
  *
  * Replaces the raster front half of the reference's per-unit extract
  * (ocr_service.py:114-156 image→tesseract): our "OCR" of an HTML payload
  * is tokenize → DOM arena → boilerplate strip (see MainContent).
  *
  * Scope: the HTML5 subset that matters for text extraction — tags with
  * class/id attributes, text with entity decoding, comments, doctypes,
  * rawtext elements (script/style/title/textarea), void elements. Tree
  * construction fixes (implied end tags) live in DomArena.
  */
object HtmlTokenizer {

  sealed trait Tok
  /** name is lower-cased; classId = lower-cased "class id" attr values. */
  final case class StartTag(name: String, classId: String, selfClosing: Boolean) extends Tok
  final case class EndTag(name: String) extends Tok
  /** Decoded text (entities resolved). */
  final case class Text(s: String) extends Tok
  /** Text as UTF-8 bytes [off, off+len) in the heap passed to
    * `tokenizeBytesHeap` — entities already decoded INTO the heap. The
    * zero-String-per-node form the kernel's byte output path consumes;
    * decoding the slice yields exactly the corresponding `Text` token.
    */
  final case class TextSlice(off: Int, len: Int) extends Tok

  private val rawTextTags = Set("script", "style", "textarea", "title", "noscript")

  /** Known tag names grouped by first letter — tag-name extraction interns
    * against these without allocating (substring+toLowerCase per tag was a
    * top kernel allocation at 32 threads).
    */
  private val internByFirst: Array[Array[String]] = {
    val names = Array(
      "a", "abbr", "article", "aside", "audio", "b", "bdi", "bdo", "big",
      "blockquote", "body", "br", "button", "canvas", "caption", "cite",
      "code", "col", "colgroup", "data", "dd", "del", "dfn", "div", "dl",
      "dt", "em", "embed", "fieldset", "figcaption", "figure", "font",
      "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "head",
      "header", "hr", "html", "i", "iframe", "img", "input", "ins", "kbd",
      "label", "legend", "li", "link", "main", "mark", "menu", "meta",
      "nav", "noscript", "object", "ol", "option", "p", "param", "pre",
      "q", "rp", "rt", "ruby", "s", "samp", "script", "section", "select",
      "small", "source", "span", "strong", "style", "sub", "sup", "svg",
      "table", "tbody", "td", "template", "textarea", "tfoot", "th",
      "thead", "time", "title", "tr", "track", "tt", "u", "ul", "var",
      "video", "wbr")
    val out = Array.fill(26)(Array.empty[String])
    names.groupBy(_.charAt(0) - 'a').foreach { case (b, ns) => out(b) = ns }
    out
  }

  private def lowerRegionEquals(html: String, s: Int, e: Int, t: String): Boolean = {
    if (e - s != t.length) return false
    var k = 0
    while (k < t.length) {
      val c = html.charAt(s + k)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != t.charAt(k)) return false
      k += 1
    }
    true
  }

  /** lower-cased tag name for html[s, e) — interned (zero-alloc) for every
    * standard HTML element, allocates only for unknown names.
    */
  private def tagName(html: String, s: Int, e: Int): String = {
    if (e > s) {
      val c0 = html.charAt(s)
      val lc0 = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if (lc0 >= 'a' && lc0 <= 'z') {
        val cands = internByFirst(lc0 - 'a')
        var ci = 0
        while (ci < cands.length) {
          if (lowerRegionEquals(html, s, e, cands(ci))) return cands(ci)
          ci += 1
        }
      }
    }
    html.substring(s, e).toLowerCase(java.util.Locale.ROOT)
  }

  def tokenize(html: String): ArrayBuffer[Tok] = {
    val out = new ArrayBuffer[Tok](64)
    val n = html.length
    var i = 0
    val text = new java.lang.StringBuilder(256)

    def flushText(): Unit = {
      if (text.length() > 0) { out += Text(text.toString); text.setLength(0) }
    }

    def isNameStart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def isNameChar(c: Char): Boolean =
      isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'

    // decode one entity starting at html(start) == '&'; returns (decoded, next index)
    def entity(start: Int): (String, Int) = {
      var j = start + 1
      if (j < n && html.charAt(j) == '#') {
        j += 1
        var hex = false
        if (j < n && (html.charAt(j) == 'x' || html.charAt(j) == 'X')) { hex = true; j += 1 }
        var v = 0L
        val digits0 = j
        while (j < n && v <= 0x10FFFF && {
          val c = html.charAt(j)
          if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
          else c >= '0' && c <= '9'
        }) {
          val c = html.charAt(j)
          val d = if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
          v = v * (if (hex) 16 else 10) + d
          j += 1
        }
        if (j == digits0 || v <= 0 || v > 0x10FFFF ||
            (v >= 0xD800 && v <= 0xDFFF)) ("&", start + 1)
        else {
          val end = if (j < n && html.charAt(j) == ';') j + 1 else j
          (new String(Character.toChars(v.toInt)), end)
        }
      } else {
        val nameEnd0 = {
          var k = j
          while (k < n && k - j < 10 && isNameChar(html.charAt(k))) k += 1
          k
        }
        val name = html.substring(j, nameEnd0)
        val semi = nameEnd0 < n && html.charAt(nameEnd0) == ';'
        val dec = name match {
          case "amp"  => "&"
          case "lt"   => "<"
          case "gt"   => ">"
          case "quot" => "\""
          case "apos" => "'"
          case "nbsp" => "\u00a0"
          case _      => null
        }
        if (dec != null && semi) (dec, nameEnd0 + 1)
        else ("&", start + 1)
      }
    }

    // Whitespace in TAG SYNTAX is the ASCII set only — identical to the
    // byte path's isWsB. (HTML5 tag/attribute whitespace is ASCII; using
    // Character.isWhitespace here made the two public tokenize() paths
    // disagree on inputs with U+2028/U+2000-200A etc. adjacent to attr
    // names/values — the "identical tokens on EVERY input" contract.)
    def isWsS(c: Char): Boolean =
      c == ' ' || (c >= 0x09 && c <= 0x0d) || (c >= 0x1c && c <= 0x1f)

    // parse attributes from i until '>' (or EOF); returns (classId, selfClosing, nextIndex)
    def attrs(from: Int): (String, Boolean, Int) = {
      var j = from
      var classId = ""
      var self = false
      while (j < n && html.charAt(j) != '>') {
        val c = html.charAt(j)
        if (c == '/') { self = true; j += 1 }
        else if (isWsS(c)) j += 1
        else if (isNameStart(c)) {
          val a0 = j
          while (j < n && isNameChar(html.charAt(j))) j += 1
          // only class/id attributes matter — compare in place, no substring
          val wanted = lowerRegionEquals(html, a0, j, "class") ||
            lowerRegionEquals(html, a0, j, "id")
          while (j < n && isWsS(html.charAt(j))) j += 1
          var value = ""
          if (j < n && html.charAt(j) == '=') {
            j += 1
            while (j < n && isWsS(html.charAt(j))) j += 1
            if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
              val q = html.charAt(j); j += 1
              val v0 = j
              while (j < n && html.charAt(j) != q) j += 1
              if (wanted) value = html.substring(v0, j)
              if (j < n) j += 1
            } else {
              val v0 = j
              while (j < n && !isWsS(html.charAt(j)) && html.charAt(j) != '>') j += 1
              if (wanted) value = html.substring(v0, j)
            }
          }
          if (wanted)
            classId = if (classId.isEmpty) value.toLowerCase(java.util.Locale.ROOT)
                      else classId + " " + value.toLowerCase(java.util.Locale.ROOT)
        } else j += 1
      }
      (classId, self, if (j < n) j + 1 else j)
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (i + 1 < n && html.charAt(i + 1) == '!') {
          flushText()
          if (i + 3 < n && html.charAt(i + 2) == '-' && html.charAt(i + 3) == '-') {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (i + 1 < n && html.charAt(i + 1) == '?') {
          flushText()
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n && html.charAt(i + 1) == '/') {
          var j = i + 2
          if (j < n && isNameStart(html.charAt(j))) {
            flushText()
            val t0 = j
            while (j < n && isNameChar(html.charAt(j))) j += 1
            val name = tagName(html, t0, j)
            while (j < n && html.charAt(j) != '>') j += 1
            out += EndTag(name)
            i = if (j < n) j + 1 else j
          } else { text.append(c); i += 1 } // "</3" — literal text
        } else if (i + 1 < n && isNameStart(html.charAt(i + 1))) {
          flushText()
          var j = i + 1
          val t0 = j
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val name = tagName(html, t0, j)
          val (classId, self, next) = attrs(j)
          out += StartTag(name, classId, self)
          i = next
          // rawtext: consume verbatim until the matching close tag
          if (!self && rawTextTags.contains(name)) {
            val close = "</" + name
            val k = ciIndexOf(html, close, i)
            val end = if (k < 0) n else k
            if (end > i) out += Text(html.substring(i, end)) // raw, no entity decode
            if (k < 0) i = n
            else {
              val gt = html.indexOf('>', k)
              out += EndTag(name)
              i = if (gt < 0) n else gt + 1
            }
          }
        } else { text.append(c); i += 1 } // bare '<'
      } else if (c == '&') {
        val (dec, next) = entity(i)
        text.append(dec)
        i = next
      } else {
        text.append(c)
        i += 1
      }
    }
    flushText()
    out
  }

  /** Case-insensitive indexOf for ASCII needles. */
  private def ciIndexOf(hay: String, needle: String, from: Int): Int = {
    val nl = needle.length
    var i = math.max(from, 0)
    val last = hay.length - nl
    while (i <= last) {
      var k = 0
      while (k < nl && ((hay.charAt(i + k) | 0x20) == (needle.charAt(k) | 0x20))) k += 1
      if (k == nl) return i
      i += 1
    }
    -1
  }

  // ====================================================================
  // Byte-level tokenizer — identical tokens to
  // `tokenize(new String(b, UTF_8))`, without ever materializing the
  // full document as a UTF-16 string. Structural scanning happens on the
  // raw UTF-8 bytes (all HTML structure is ASCII, and UTF-8 continuation
  // bytes are ≥ 0x80, so no multi-byte character can alias a structural
  // byte); only text content is decoded, per run. This halves the
  // kernel's dominant memory traffic (the full-doc decode) — measured in
  // BENCH.md. Inputs containing invalid UTF-8 fall back to the string
  // path so the two tokenizers agree byte-for-byte on EVERY input
  // (scalacheck-asserted in PropertiesSpec).
  // ====================================================================

  private val UTF8 = java.nio.charset.StandardCharsets.UTF_8

  /** strict UTF-8 validity scan (RFC 3629: no surrogates, no overlongs) */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      // ASCII fast path: signed byte >= 0 ⇔ ASCII — a dedicated skip
      // loop (one compare per byte, unroll-friendly) instead of
      // re-entering the full sequence dispatch per ASCII byte
      while (i < n && b(i) >= 0) i += 1
      if (i >= n) return true
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation byte or overlong lead
      else if (c < 0xe0) {            // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) {          // 3-byte
        if (i + 2 >= n || (b(i + 1) & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80) return false
        val c1 = b(i + 1) & 0xff
        if (c == 0xe0 && c1 < 0xa0) return false           // overlong
        if (c == 0xed && c1 >= 0xa0) return false          // surrogate
        i += 3
      } else if (c < 0xf5) {          // 4-byte
        if (i + 3 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        val c1 = b(i + 1) & 0xff
        if (c == 0xf0 && c1 < 0x90) return false           // overlong
        if (c == 0xf4 && c1 >= 0x90) return false          // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }

  /** growable byte accumulator for text runs / document text heaps */
  private[kernel] final class ByteBuf(initial: Int) {
    var arr = new Array[Byte](initial)
    var len = 0
    def append(b: Array[Byte], from: Int, n: Int): Unit = {
      if (len + n > arr.length)
        arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, len + n))
      System.arraycopy(b, from, arr, len, n)
      len += n
    }
    def appendByte(v: Byte): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(len) = v
      len += 1
    }
    def clear(): Unit = len = 0
  }

  def tokenizeBytes(b: Array[Byte]): ArrayBuffer[Tok] =
    if (isValidUtf8(b)) {
      // public token API: slices decode to the same Text tokens the
      // string path emits (the kernel path consumes the slices directly)
      val heap = new ByteBuf(256)
      val toks = tokenizeBytesHeap(b, heap)
      var ti = 0
      while (ti < toks.length) {
        toks(ti) match {
          case TextSlice(o, l) => toks(ti) = Text(new String(heap.arr, o, l, UTF8))
          case _ => ()
        }
        ti += 1
      }
      toks
    } else tokenize(new String(b, UTF8)) // exact-equivalence fallback

  /** Byte tokenizer emitting TextSlice tokens into `heap` — the
    * zero-String-per-text-node form. REQUIRES pre-validated UTF-8
    * (`isValidUtf8`); callers handle the fallback.
    */
  private[kernel] def tokenizeBytesHeap(b: Array[Byte], heap: ByteBuf): ArrayBuffer[Tok] = {
    val out = new ArrayBuffer[Tok](64)
    val n = b.length
    var i = 0
    val text = heap
    var textStart = heap.len

    def at(k: Int): Int = if (k < n) b(k) & 0xff else -1
    def flushText(): Unit = {
      if (text.len > textStart) {
        out += TextSlice(textStart, text.len - textStart)
        textStart = text.len
      }
    }
    def isNameStart(c: Int): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def isNameChar(c: Int): Boolean =
      isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'
    def isWsB(c: Int): Boolean = // Character.isWhitespace for the ASCII range
      c == ' ' || (c >= 0x09 && c <= 0x0d) || c == 0x1c || c == 0x1d || c == 0x1e || c == 0x1f

    def indexOfByte(target: Int, from: Int): Int = {
      var k = from
      while (k < n && (b(k) & 0xff) != target) k += 1
      if (k < n) k else -1
    }
    def indexOfSeq(s: String, from: Int): Int = {
      val sl = s.length
      var k = math.max(from, 0)
      val last = n - sl
      while (k <= last) {
        var m = 0
        while (m < sl && (b(k + m) & 0xff) == s.charAt(m)) m += 1
        if (m == sl) return k
        k += 1
      }
      -1
    }
    def ciIndexOfSeq(s: String, from: Int): Int = {
      val sl = s.length
      var k = math.max(from, 0)
      val last = n - sl
      while (k <= last) {
        var m = 0
        while (m < sl && ((b(k + m) & 0xff) | 0x20) == (s.charAt(m) | 0x20)) m += 1
        if (m == sl) return k
        k += 1
      }
      -1
    }
    def tagNameB(s: Int, e: Int): String = {
      if (e > s) {
        val c0 = b(s) & 0xff
        val lc0 = if (c0 >= 'A' && c0 <= 'Z') c0 + 32 else c0
        if (lc0 >= 'a' && lc0 <= 'z') {
          val cands = internByFirst(lc0 - 'a')
          var ci = 0
          while (ci < cands.length) {
            val t = cands(ci)
            if (e - s == t.length) {
              var m = 0
              var ok = true
              while (ok && m < t.length) {
                val c = b(s + m) & 0xff
                val lc = if (c >= 'A' && c <= 'Z') c + 32 else c
                if (lc != t.charAt(m)) ok = false else m += 1
              }
              if (ok) return t
            }
            ci += 1
          }
        }
      }
      new String(b, s, e - s, UTF8).toLowerCase(java.util.Locale.ROOT)
    }
    def regionEqCi(s: Int, e: Int, t: String): Boolean = {
      if (e - s != t.length) return false
      var m = 0
      while (m < t.length) {
        val c = b(s + m) & 0xff
        val lc = if (c >= 'A' && c <= 'Z') c + 32 else c
        if (lc != t.charAt(m)) return false
        m += 1
      }
      true
    }

    // decode one entity at b(start) == '&'; appends decoded bytes to text,
    // returns next index — byte transliteration of `entity`
    def entityB(start: Int): Int = {
      var j = start + 1
      if (at(j) == '#') {
        j += 1
        var hex = false
        if (at(j) == 'x' || at(j) == 'X') { hex = true; j += 1 }
        var v = 0L
        val digits0 = j
        var going = true
        while (going && j < n && v <= 0x10FFFF) {
          val c = at(j)
          val ok =
            if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
            else c >= '0' && c <= '9'
          if (ok) {
            val d = if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
            v = v * (if (hex) 16 else 10) + d
            j += 1
          } else going = false
        }
        if (j == digits0 || v <= 0 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) {
          text.appendByte('&')
          start + 1
        } else {
          val enc = new String(Character.toChars(v.toInt)).getBytes(UTF8)
          text.append(enc, 0, enc.length)
          if (at(j) == ';') j + 1 else j
        }
      } else {
        var k = j
        while (k < n && k - j < 10 && isNameChar(at(k))) k += 1
        val semi = at(k) == ';'
        // case-sensitive exact names, matching the string path's
        // `name match { case "amp" => ... }` semantics
        def eq3(x: Char, y: Char, z: Char) =
          k - j == 3 && b(j) == x && b(j + 1) == y && b(j + 2) == z
        def eq2(x: Char, y: Char) = k - j == 2 && b(j) == x && b(j + 1) == y
        def eq4(x: Char, y: Char, z: Char, w: Char) =
          k - j == 4 && b(j) == x && b(j + 1) == y && b(j + 2) == z && b(j + 3) == w
        val dec: Array[Byte] =
          if (eq3('a', 'm', 'p')) Array('&'.toByte)
          else if (eq2('l', 't')) Array('<'.toByte)
          else if (eq2('g', 't')) Array('>'.toByte)
          else if (eq4('q', 'u', 'o', 't')) Array('"'.toByte)
          else if (eq4('a', 'p', 'o', 's')) Array('\''.toByte)
          else if (eq4('n', 'b', 's', 'p')) Array(0xc2.toByte, 0xa0.toByte)
          else null
        if (dec != null && semi) {
          text.append(dec, 0, dec.length)
          k + 1
        } else {
          text.appendByte('&')
          start + 1
        }
      }
    }

    // attributes: returns (classId, selfClosing, nextIndex)
    def attrsB(from: Int): (String, Boolean, Int) = {
      var j = from
      var classId = ""
      var self = false
      while (j < n && at(j) != '>') {
        val c = at(j)
        if (c == '/') { self = true; j += 1 }
        else if (isWsB(c)) j += 1
        else if (isNameStart(c)) {
          val a0 = j
          while (j < n && isNameChar(at(j))) j += 1
          val wanted = regionEqCi(a0, j, "class") || regionEqCi(a0, j, "id")
          while (j < n && isWsB(at(j))) j += 1
          var value = ""
          if (at(j) == '=') {
            j += 1
            while (j < n && isWsB(at(j))) j += 1
            if (at(j) == '"' || at(j) == '\'') {
              val q = at(j); j += 1
              val v0 = j
              while (j < n && at(j) != q) j += 1
              if (wanted) value = new String(b, v0, j - v0, UTF8)
              if (j < n) j += 1
            } else {
              val v0 = j
              while (j < n && !isWsB(at(j)) && at(j) != '>') j += 1
              if (wanted) value = new String(b, v0, j - v0, UTF8)
            }
          }
          if (wanted)
            classId = if (classId.isEmpty) value.toLowerCase(java.util.Locale.ROOT)
                      else classId + " " + value.toLowerCase(java.util.Locale.ROOT)
        } else j += 1
      }
      (classId, self, if (j < n) j + 1 else j)
    }

    while (i < n) {
      val c = at(i)
      if (c == '<') {
        if (at(i + 1) == '!') {
          flushText()
          if (at(i + 2) == '-' && at(i + 3) == '-') {
            val end = indexOfSeq("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = indexOfByte('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (at(i + 1) == '?') {
          flushText()
          val end = indexOfByte('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (at(i + 1) == '/') {
          var j = i + 2
          if (j < n && isNameStart(at(j))) {
            flushText()
            val t0 = j
            while (j < n && isNameChar(at(j))) j += 1
            val name = tagNameB(t0, j)
            while (j < n && at(j) != '>') j += 1
            out += EndTag(name)
            i = if (j < n) j + 1 else j
          } else { text.appendByte('<'); i += 1 }
        } else if (i + 1 < n && isNameStart(at(i + 1))) {
          flushText()
          var j = i + 1
          val t0 = j
          while (j < n && isNameChar(at(j))) j += 1
          val name = tagNameB(t0, j)
          val (classId, self, next) = attrsB(j)
          out += StartTag(name, classId, self)
          i = next
          if (!self && rawTextTags.contains(name)) {
            val k = ciIndexOfSeq("</" + name, i)
            val end = if (k < 0) n else k
            if (end > i) { // raw, no entity decode — straight into the heap
              text.append(b, i, end - i)
              flushText()
            }
            if (k < 0) i = n
            else {
              val gt = indexOfByte('>', k)
              out += EndTag(name)
              i = if (gt < 0) n else gt + 1
            }
          }
        } else { text.appendByte('<'); i += 1 }
      } else if (c == '&') {
        i = entityB(i)
      } else {
        // bulk-copy the run up to the next markup/entity byte — the
        // branch every ordinary text byte takes (was one appendByte per
        // byte; same bytes, one arraycopy per run)
        var run = i + 1
        while (run < n && { val d = b(run); d != '<' && d != '&' }) run += 1
        text.append(b, i, run - i)
        i = run
      }
    }
    flushText()
    out
  }
}
