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
  val text = new ArrayBuffer[String](64)       // null for elements

  private val lastChild = new IntBuf(64)

  def size: Int = tag.length
  def isText(i: Int): Boolean = tag(i) == "#text"

  private[kernel] def reset(): Unit = {
    tag.clear(); classId.clear(); text.clear()
    parent.clear(); firstChild.clear(); nextSibling.clear(); lastChild.clear()
  }

  private[kernel] def addNode(t: String, cls: String, p: Int, txt: String): Int = {
    val id = tag.length
    tag += t; classId += cls; parent += p
    firstChild += -1; nextSibling += -1; lastChild += -1; text += txt
    if (p >= 0) {
      if (firstChild(p) < 0) firstChild(p) = id
      else nextSibling(lastChild(p)) = id
      lastChild(p) = id
    }
    id
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

  /** Byte-path variant: tokenize raw UTF-8 without a full-doc decode. */
  def buildIntoBytes(arena: DomArena, bytes: Array[Byte]): DomArena =
    buildFromTokens(arena, HtmlTokenizer.tokenizeBytes(bytes))

  def buildFromTokens(
      arena: DomArena,
      toks: scala.collection.mutable.ArrayBuffer[HtmlTokenizer.Tok]): DomArena = {
    arena.reset()
    val root = arena.addNode("#root", "", -1, null)
    var cur = root
    val open = new IntBuf(16) // stack of open element node ids
    open += root

    var ti = 0
    while (ti < toks.length) {
      toks(ti) match {
        case HtmlTokenizer.Text(s) =>
          arena.addNode("#text", "", cur, s)
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
