package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Growable primitive int buffer — ArrayBuffer[Int] boxes every element
  * (measured as the kernel's top allocation source at 32 threads), this
  * doesn't.
  */
final class IntBuf(initial: Int = 64) {
  private var arr = new Array[Int](initial)
  private var len = 0
  def length: Int = len
  def apply(i: Int): Int = arr(i)
  def update(i: Int, v: Int): Unit = arr(i) = v
  def +=(v: Int): Unit = {
    if (len == arr.length) arr = java.util.Arrays.copyOf(arr, len * 2)
    arr(len) = v
    len += 1
  }
  def last: Int = arr(len - 1)
  /** drop elements from the end until length == newLen (stack pop) */
  def trim(newLen: Int): Unit = len = newLen
  def clear(): Unit = len = 0
}

/** Lightweight DOM arena: a flat node array with parent / firstChild /
  * nextSibling indices (no object graph, cache-friendly, zero GC churn
  * per node beyond the backing buffers).
  *
  * Built from HtmlTokenizer tokens with a minimal subset of the HTML5
  * tree-construction fixes that matter for text extraction:
  *   - void elements never open a scope,
  *   - implied end tags: a new <p>/<li>/<td>/<tr>/<option> closes an open
  *     element of the same kind,
  *   - stray end tags are ignored; unclosed elements are closed at EOF.
  *
  * Node 0 is a synthetic #root element.
  */
final class DomArena private[kernel] () {
  // parallel arrays — one entry per node
  val tag = new ArrayBuffer[String](64)        // "#text" for text nodes
  val classId = new ArrayBuffer[String](64)    // "" for text nodes
  val parent = new IntBuf(64)
  val firstChild = new IntBuf(64)
  val nextSibling = new IntBuf(64)
  // text-node payload, one of two representations (uniform per build):
  //  - string-built arena: textStr(i) holds the decoded String
  //  - byte-built arena:   textOff/textLen slice the UTF-8 `heap`
  //    (zero String per node — the kernel's byte output path)
  private[kernel] val textStr = new ArrayBuffer[String](64) // null for elements/slices
  private[kernel] val textOff = new IntBuf(64)              // -1 for elements/strings
  private[kernel] val textLen = new IntBuf(64)
  private[kernel] val heap = new HtmlTokenizer.ByteBuf(4096)
  /** true iff the last build stored text as heap slices */
  private[kernel] var heapBacked = false

  private val lastChild = new IntBuf(64)

  def size: Int = tag.length
  def isText(i: Int): Boolean = tag(i) == "#text"

  /** Decoded text of node i (on-demand decode for byte-built arenas). */
  def text(i: Int): String =
    if (textOff(i) >= 0)
      new String(heap.arr, textOff(i), textLen(i), java.nio.charset.StandardCharsets.UTF_8)
    else textStr(i)

  private[kernel] def reset(): Unit = {
    tag.clear(); classId.clear(); textStr.clear()
    parent.clear(); firstChild.clear(); nextSibling.clear(); lastChild.clear()
    textOff.clear(); textLen.clear()
    // NOTE: heap is NOT cleared here — tokenizeBytesHeap fills it before
    // buildFromTokens resets the node arrays; buildIntoBytes clears it
  }

  private[kernel] def addNode(t: String, cls: String, p: Int, txt: String): Int = {
    val id = tag.length
    tag += t; classId += cls; parent += p
    firstChild += -1; nextSibling += -1; lastChild += -1
    textStr += txt; textOff += -1; textLen += 0
    link(p, id)
    id
  }

  private[kernel] def addTextSlice(p: Int, off: Int, len: Int): Int = {
    val id = tag.length
    tag += "#text"; classId += ""; parent += p
    firstChild += -1; nextSibling += -1; lastChild += -1
    textStr += null; textOff += off; textLen += len
    link(p, id)
    id
  }

  private def link(p: Int, id: Int): Unit =
    if (p >= 0) {
      if (firstChild(p) < 0) firstChild(p) = id
      else nextSibling(lastChild(p)) = id
      lastChild(p) = id
    }
}

object DomArena {
  private val voidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  /** tags whose open instance is implicitly closed by a same-group sibling */
  private val impliedClose: Map[String, Set[String]] = Map(
    "p" -> Set("p"),
    "li" -> Set("li"),
    "td" -> Set("td", "th"), "th" -> Set("td", "th"),
    "tr" -> Set("tr"),
    "option" -> Set("option"),
    "dd" -> Set("dd", "dt"), "dt" -> Set("dd", "dt")
  )

  def build(html: String): DomArena = buildInto(new DomArena(), html)

  /** Reusable-arena variant: one arena per partition amortizes buffer
    * growth across documents (the kernel's mapPartitions path).
    */
  def buildInto(arena: DomArena, html: String): DomArena =
    buildFromTokens(arena, HtmlTokenizer.tokenize(html))

  /** Byte-path variant: tokenize raw UTF-8 without a full-doc decode.
    * Valid UTF-8 builds a HEAP-BACKED arena (text nodes are byte slices;
    * MainContent's byte output path then never materializes per-node
    * Strings); invalid input falls back to the string path for exact
    * equivalence.
    */
  def buildIntoBytes(arena: DomArena, bytes: Array[Byte]): DomArena =
    if (HtmlTokenizer.isValidUtf8(bytes)) {
      arena.heap.clear()
      val toks = HtmlTokenizer.tokenizeBytesHeap(bytes, arena.heap)
      val built = buildFromTokens(arena, toks)
      built.heapBacked = true
      built
    } else buildInto(arena, new String(bytes, java.nio.charset.StandardCharsets.UTF_8))

  def buildFromTokens(
      arena: DomArena,
      toks: scala.collection.mutable.ArrayBuffer[HtmlTokenizer.Tok]): DomArena = {
    arena.reset()
    arena.heapBacked = false
    val root = arena.addNode("#root", "", -1, null)
    var cur = root
    val open = new IntBuf(16) // stack of open element node ids
    open += root

    var ti = 0
    while (ti < toks.length) {
      toks(ti) match {
        case HtmlTokenizer.Text(s) =>
          arena.addNode("#text", "", cur, s)
        case HtmlTokenizer.TextSlice(off, len) =>
          arena.addTextSlice(cur, off, len)
        case HtmlTokenizer.StartTag(name, cls, self) =>
          impliedClose.get(name).foreach { closers =>
            // close the innermost open element of the same group, if any,
            // but never across a structural boundary deeper in the stack
            if (open.length > 1 && closers.contains(arena.tag(open.last))) {
              open.trim(open.length - 1)
              cur = open.last
            }
          }
          val id = arena.addNode(name, cls, cur, null)
          if (!self && !voidTags.contains(name)) {
            open += id
            cur = id
          }
        case HtmlTokenizer.EndTag(name) =>
          // pop to the nearest matching open element; ignore if none
          var k = open.length - 1
          while (k > 0 && arena.tag(open(k)) != name) k -= 1
          if (k > 0) {
            open.trim(k)
            cur = open.last
          }
      }
      ti += 1
    }
    arena
  }
}
