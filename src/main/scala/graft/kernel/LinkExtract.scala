package graft.kernel

/** Outlink (href) extraction from HTML — the crawl-frontier stage of a
  * web pipeline (Common-Crawl processing extracts the link graph
  * alongside the text). A dedicated scanner, NOT a tokenizer change:
  * the extraction kernel's tokenizer deliberately keeps only class/id
  * (its byte contract is golden-pinned), and links are a separate
  * product with separate consumers.
  *
  * Lexical rules mirror the tokenizer's: `<a`/`<A` followed by a
  * non-name char opens an anchor; attributes parse with single/double/
  * unquoted values; the FIRST href wins per tag (duplicate attributes
  * are browser-ignored); values are returned RAW (no entity decode) in
  * document order. Total on any bytes — malformed markup yields the
  * links that do parse.
  */
object LinkExtract {

  def hrefsBytes(b: Array[Byte]): Vector[String] =
    if (b == null || b.isEmpty) Vector.empty
    else hrefs(new String(b, java.nio.charset.StandardCharsets.UTF_8))

  def hrefs(html: String): Vector[String] = {
    if (html == null || html.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    val n = html.length
    def isWs(c: Char): Boolean = c == ' ' || (c >= 0x09 && c <= 0x0d)
    def isNameChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'
    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<' && i + 1 < n &&
        (html.charAt(i + 1) == 'a' || html.charAt(i + 1) == 'A') &&
        (i + 2 >= n || !isNameChar(html.charAt(i + 2)))) {
        // inside an <a ...> tag: walk attributes to '>'
        var j = i + 2
        var href: String = null
        while (j < n && html.charAt(j) != '>') {
          val c = html.charAt(j)
          if (isWs(c) || c == '/') j += 1
          else if (isNameChar(c)) {
            val a0 = j
            while (j < n && isNameChar(html.charAt(j))) j += 1
            val isHref = j - a0 == 4 &&
              html.substring(a0, j).equalsIgnoreCase("href")
            while (j < n && isWs(html.charAt(j))) j += 1
            if (j < n && html.charAt(j) == '=') {
              j += 1
              while (j < n && isWs(html.charAt(j))) j += 1
              if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                val q = html.charAt(j); j += 1
                val v0 = j
                while (j < n && html.charAt(j) != q) j += 1
                // a quote that never closes (truncated markup) is not a
                // value — matches the raw-markup regex semantics
                if (isHref && href == null && j < n) href = html.substring(v0, j)
                if (j < n) j += 1
              } else {
                val v0 = j
                while (j < n && !isWs(html.charAt(j)) && html.charAt(j) != '>') j += 1
                if (isHref && href == null) href = html.substring(v0, j)
              }
            }
          } else j += 1
        }
        if (href != null) out += href
        i = if (j < n) j + 1 else j
      } else i += 1
    }
    out.result()
  }
}
