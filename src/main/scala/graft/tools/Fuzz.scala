package graft.tools

import graft.kernel.{HtmlTokenizer, MainContent, PdfParser}

/** High-volume deterministic fuzz of the kernel invariants — the same
  * properties PropertiesSpec checks at scalacheck's default 100 cases,
  * driven to N×100k cases (seeded, reproducible). Run before shipping a
  * kernel change:
  *
  *   sbt "runMain graft.tools.Fuzz [cases]"
  *
  * Checks per case: (1) byte-path tokenize == string-path tokenize on
  * arbitrary bytes, (2) MainContent extraction is total and its spans
  * reassemble the text, (3) PdfParser.contentText is total.
  */
object Fuzz {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val rnd = new java.util.Random(42)
    var i = 0
    var tokenizerChecked = 0L
    var spanChecked = 0L
    while (i < n) {
      val len = rnd.nextInt(600)
      val b = new Array[Byte](len)
      // mix: pure random bytes, tag-soup ascii, utf-8-ish
      rnd.nextInt(3) match {
        case 0 => rnd.nextBytes(b)
        case 1 =>
          val soup = "<>/=\"' abcdePZ&#;\n\u0000"
          var k = 0
          while (k < len) { b(k) = soup.charAt(rnd.nextInt(soup.length)).toByte; k += 1 }
        case 2 =>
          var k = 0
          while (k < len) {
            val r = rnd.nextInt(100)
            b(k) = (if (r < 60) (0x20 + rnd.nextInt(0x5f)) else rnd.nextInt(256)).toByte
            k += 1
          }
      }
      // 1. tokenizer parity
      val s = new String(b, "UTF-8")
      val viaBytes = HtmlTokenizer.tokenizeBytes(b)
      val viaString = HtmlTokenizer.tokenize(s)
      if (viaBytes != viaString) {
        System.err.println(s"TOKENIZER DIVERGENCE at case $i: ${b.mkString(",")}")
        sys.exit(1)
      }
      tokenizerChecked += 1
      // 2. extraction totality + span reassembly + BYTE/CHAR OUTPUT PARITY
      // (the byte-level output path must equal the char path exactly)
      val res = MainContent.extract(s)
      res.spans.foreach { sp =>
        val ok = sp.start >= 0 && sp.end <= res.text.length && sp.start <= sp.end
        if (!ok) { System.err.println(s"BAD SPAN at case $i: $sp"); sys.exit(1) }
      }
      val resB = MainContent.extractBytes(b)
      if (res.text != resB.text || res.spans != resB.spans) {
        System.err.println(s"EXTRACT BYTE/CHAR DIVERGENCE at case $i: ${b.mkString(",")}")
        sys.exit(1)
      }
      spanChecked += res.spans.length
      // 3. pdf content scanner totality
      PdfParser.contentText(b)
      i += 1
    }
    println(s"[fuzz] OK: $n cases, $tokenizerChecked tokenizer-parity checks, " +
      s"$spanChecked spans validated, 0 divergences")
  }
}
