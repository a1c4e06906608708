package graft.kernel

import scala.collection.mutable.ArrayBuffer

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
final class DomArena private () {
  // parallel arrays — one entry per node
  val tag = new ArrayBuffer[String](64)        // "#text" for text nodes
  val classId = new ArrayBuffer[String](64)    // "" for text nodes
  val parent = new ArrayBuffer[Int](64)
  val firstChild = new ArrayBuffer[Int](64)
  val nextSibling = new ArrayBuffer[Int](64)
  val text = new ArrayBuffer[String](64)       // null for elements

  private val lastChild = new ArrayBuffer[Int](64)

  def size: Int = tag.length
  def isText(i: Int): Boolean = tag(i) == "#text"

  private def addNode(t: String, cls: String, p: Int, txt: String): Int = {
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

  def build(html: String): DomArena = {
    val arena = new DomArena()
    val root = arena.addNode("#root", "", -1, null)
    var cur = root
    val open = new ArrayBuffer[Int](16) // stack of open element node ids
    open += root

    val toks = HtmlTokenizer.tokenize(html)
    var ti = 0
    while (ti < toks.length) {
      toks(ti) match {
        case HtmlTokenizer.Text(s) =>
          arena.addNode("#text", "", cur, s)
        case HtmlTokenizer.StartTag(name, cls, self) =>
          impliedClose.get(name).foreach { closers =>
            // close the innermost open element of the same group, if any,
            // but never across a structural boundary deeper in the stack
            val top = open.last
            if (open.length > 1 && closers.contains(arena.tag(top))) {
              open.remove(open.length - 1)
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
            while (open.length > k) open.remove(open.length - 1)
            cur = open.last
          }
      }
      ti += 1
    }
    arena
  }
}
