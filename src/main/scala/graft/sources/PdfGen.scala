package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

/** Deterministic minimal-PDF writer for fixtures — the counterpart of
  * graft.kernel.PdfParser's supported subset. Spec-valid output: object
  * table, page tree, FlateDecode content streams, xref, trailer.
  *
  * Stands in for the reference's PDF inputs (the uploads that hit the
  * pdf branch at ocr_service.py:275): one page per logical page text,
  * one text line per Td/Tj pair. Pages listed in `corruptPages` get a
  * stream that declares /FlateDecode but holds non-zlib bytes — the
  * per-page failure fixture (FIXTURES.md §1; exercises operator A9).
  */
object PdfGen {

  def build(pageTexts: Seq[String], corruptPages: Set[Int] = Set.empty): Array[Byte] = {
    val out = new ByteArrayOutputStream(4096)
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def beginObj(): Unit = offsets += out.size()

    val nPages = pageTexts.length
    // object numbering: 1 catalog, 2 pages, 3 font, then (4+2i) page / (5+2i) content
    val pageObj = (i: Int) => 4 + 2 * i
    val contObj = (i: Int) => 5 + 2 * i

    w("%PDF-1.4\n%\u00e2\u00e3\u00cf\u00d3\n")

    beginObj()
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")

    beginObj()
    val kids = (0 until nPages).map(i => s"${pageObj(i)} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")

    beginObj()
    w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")

    for (i <- 0 until nPages) {
      beginObj()
      w(s"${pageObj(i)} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${contObj(i)} 0 R " +
        s"/Resources << /Font << /F1 3 0 R >> >> >>\nendobj\n")

      beginObj()
      val body: Array[Byte] =
        if (corruptPages.contains(i))
          s"NOT-A-ZLIB-STREAM page=$i deadbeef".getBytes("ISO-8859-1")
        else deflate(contentStream(pageTexts(i)))
      w(s"${contObj(i)} 0 obj\n<< /Length ${body.length} /Filter /FlateDecode >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }

    // xref + trailer
    val xrefAt = out.size()
    val nObjs = offsets.length + 1
    w(s"xref\n0 $nObjs\n0000000000 65535 f \n")
    offsets.foreach(off => w(f"$off%010d 00000 n \n"))
    w(s"trailer\n<< /Size $nObjs /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** One BT/ET block; each line positioned with Td and painted with Tj. */
  private def contentStream(pageText: String): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("BT\n/F1 12 Tf\n")
    val lines = pageText.split("\n", -1)
    var first = true
    lines.foreach { line =>
      if (first) { sb.append("72 720 Td\n"); first = false }
      else sb.append("0 -14 Td\n")
      sb.append(pdfString(line)).append(" Tj\n")
    }
    sb.append("ET\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  /** ASCII-safe lines become literal strings; anything else becomes a
    * BOM-prefixed UTF-16BE hex string (see PdfParser.decodeString).
    */
  def pdfString(line: String): String = {
    val asciiSafe = line.forall(c => c >= ' ' && c <= '~')
    if (asciiSafe) {
      val sb = new StringBuilder(line.length + 2)
      sb.append('(')
      line.foreach {
        case '('  => sb.append("\\(")
        case ')'  => sb.append("\\)")
        case '\\' => sb.append("\\\\")
        case c    => sb.append(c)
      }
      sb.append(')')
      sb.toString
    } else {
      val sb = new StringBuilder(line.length * 4 + 6)
      sb.append("<FEFF")
      line.foreach { c => sb.append(f"${c.toInt}%04X") }
      sb.append('>')
      sb.toString
    }
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(data)
      d.finish()
      val out = new ByteArrayOutputStream(math.max(64, data.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val k = d.deflate(buf)
        out.write(buf, 0, k)
      }
      out.toByteArray
    } finally d.end()
  }
}
