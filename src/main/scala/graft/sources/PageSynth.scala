package graft.sources

import graft.kernel.MergeSpec
import graft.model.Page
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic synthesizer: driver testdata `documents.parquet`
  * (doc_id, text, lang, source, n_chars) → the `input_hint` pages table
  * (url, warc_ts, html:binary, text, lang), plus the golden expected
  * output per url computed from the same deterministic decomposition
  * (FIXTURES.md §1-2). Seedless: everything is a pure function of doc_id,
  * so synth and golden agree byte-for-byte by construction and any
  * partition/order of execution yields identical rows.
  *
  * Payload kinds by doc_id (all deterministic, FIXTURES.md edge cases):
  *   - doc_id % 101 == 13 → empty payload         (routes.py:93-95 analogue)
  *   - doc_id % 101 == 29 → ZIP magic             (ocr_service.py:280 analogue)
  *   - doc_id % 101 == 47 → PDF with a corrupt middle page (A9 fixture)
  *   - doc_id % 10  == 7  → well-formed PDF
  *   - otherwise          → HTML page wrapped in boilerplate chrome
  *
  * URL host distribution is Zipf-ish (60% of docs on 3 hot hosts) to
  * exercise the skew handling the north rule demands.
  */
object PageSynth {

  final case class Doc(doc_id: Long, text: String, lang: String, source: String)

  sealed trait Kind
  case object KHtml extends Kind
  case object KPdf extends Kind
  case object KCorruptPdf extends Kind
  case object KEmpty extends Kind
  case object KUnsupported extends Kind
  case object KOversize extends Kind
  case object KImage extends Kind
  case object KImageOversizedRes extends Kind

  /** exactly one oversize doc per corpus (10 MB cap + 1, config.py:15) —
    * a single fixed id so synthesis cost stays O(10 MB) at every SF
    */
  val OversizeDocId = 61L

  /** one raster image claiming > 4096x4096 (the API.md:473 resolution-cap
    * fixture); header-only payload, so any id is cheap
    */
  val OversizeResDocId = 83L
  val OversizeResDims: (Int, Int) = (5000, 4200)

  def kindOf(id: Long): Kind =
    if (id == OversizeDocId) KOversize
    else if (id == OversizeResDocId) KImageOversizedRes
    else if (id % 101 == 13) KEmpty
    else if (id % 101 == 29) KUnsupported
    else if (id % 101 == 59) KImage
    else if (id % 101 == 47) KCorruptPdf
    else if (id % 10 == 7) KPdf
    else KHtml

  /** image fixture format cycles through the reference-accepted rasters
    * (config.py:17: png, jpg/jpeg, tiff); dims are deterministic in the id
    * and always within the 4096 cap
    */
  def imageSpecFor(id: Long): (String, Int, Int) = {
    val fmt = (id % 3) match { case 0 => "png"; case 1 => "jpg"; case _ => "tiff" }
    (fmt, 40 + (id % 1000).toInt, 30 + (id % 640).toInt)
  }

  def urlFor(d: Doc): String = {
    val h = if (d.doc_id % 10 < 6) d.doc_id % 3 else d.doc_id % 97
    s"https://host$h.example/${d.source}/doc${d.doc_id}"
  }

  /** epoch 2025-01-01T00:00:00Z + doc_id minutes */
  def tsFor(id: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1735689600000L + id * 60000L)

  def titleFor(d: Doc): String = s"Doc ${d.doc_id}: ${d.source} notes"

  /** Deterministic paragraph split: chunks of (7 + id%9) words; zh docs get
    * a CJK prefix per paragraph (the chi_sim+eng mixed-script fixture,
    * config.py:41 analogue).
    */
  def paragraphsOf(d: Doc): Seq[String] = {
    val words = d.text.split(" ").filter(_.nonEmpty)
    val k = 7 + (d.doc_id % 9).toInt
    val chunks = words.grouped(k).map(_.mkString(" ")).toSeq
    val base = if (chunks.isEmpty) Seq(d.text.trim).filter(_.nonEmpty) else chunks
    if (d.lang == "zh")
      base.zipWithIndex.map { case (t, i) => s"中文段落${i + 1}：$t" }
    else base
  }

  /** PDF page text = paragraph wrapped at 12 words per line. */
  def wrapLines(paragraph: String, wordsPerLine: Int = 12): String =
    paragraph.split(" ").filter(_.nonEmpty)
      .grouped(wordsPerLine).map(_.mkString(" ")).mkString("\n")

  def pdfPageTexts(d: Doc): Seq[String] = paragraphsOf(d).map(wrapLines(_))

  def corruptPageIndex(nPages: Int): Int = if (nPages >= 2) 1 else 0

  // ------------------------------------------------------------------
  // HTML chrome
  // ------------------------------------------------------------------

  def escapeHtml(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  /** The article's content-block structure — the single source of truth
    * shared by the HTML renderer and the golden generator, so structural
    * variety (section headings, list blocks) stays golden-by-construction.
    */
  sealed trait Block
  final case class BPara(text: String, idx: Int) extends Block
  final case class BHeading(text: String) extends Block
  final case class BList(items: Seq[String]) extends Block

  def articleBlocks(d: Doc): Seq[Block] = {
    val id = d.doc_id
    val paras = paragraphsOf(d)
    val out = Seq.newBuilder[Block]
    paras.zipWithIndex.foreach { case (p, i) =>
      // every 7th doc gets h2 section headings between paragraph groups
      if (id % 7 == 3 && i > 0 && i % 3 == 0) out += BHeading(s"Part ${i / 3}")
      val isLast = i == paras.length - 1
      if (id % 11 == 6 && isLast && paras.length >= 2) {
        // every 11th doc renders its last paragraph as a <ul> — each <li>
        // is its own block in the extracted text
        val words = p.split(" ").filter(_.nonEmpty)
        out += BList(words.grouped(5).map(_.mkString(" ")).toSeq)
      } else out += BPara(p, i)
    }
    out.result()
  }

  /** golden extracted text for an HTML page = title + blocks, "\n\n"-joined */
  def htmlGoldenText(d: Doc): String =
    (titleFor(d) +: articleBlocks(d).flatMap {
      case BPara(t, _)  => Seq(t)
      case BHeading(t)  => Seq(t)
      case BList(items) => items
    }).mkString("\n\n")

  /** Wrap the doc in realistic boilerplate. All chrome is strippable by
    * MainContent's heuristics (tag blocklist / class blocklist /
    * link-density); doc_id varies the template and injects malformed
    * markup *inside pruned regions only* (FIXTURES.md: tokenizer
    * robustness without changing the extracted text).
    */
  def htmlFor(d: Doc): String = {
    val id = d.doc_id
    val title = escapeHtml(titleFor(d))
    val sb = new StringBuilder(2048)
    sb.append("<!DOCTYPE html>\n<html lang=\"").append(d.lang).append("\">\n<head>\n")
    sb.append("<meta charset=\"utf-8\">\n<title>").append(title).append("</title>\n")
    sb.append("<style>body{margin:0;font:16px serif}.ads{color:red}</style>\n")
    sb.append("<script>var t0=Date.now();function track(){/* <p>not text</p> */}</script>\n")
    sb.append("</head>\n<body>\n")
    sb.append("<header class=\"site-header\"><a href=\"/\">host home</a>")
    sb.append("<a href=\"/about\">about</a><a href=\"/contact\">contact</a></header>\n")
    sb.append("<nav id=\"mainnav\"><ul><li><a href=\"/s/a\">Section A</a></li>")
    sb.append("<li><a href=\"/s/b\">Section B</a></li><li><a href=\"/s/c\">Section C</a></li></ul></nav>\n")
    if (id % 3 != 1) {
      sb.append("<div class=\"breadcrumbs\"><a href=\"/\">Home</a> &gt; <a href=\"/s\">")
        .append(escapeHtml(d.source)).append("</a></div>\n")
    }
    sb.append("<div class=\"sidebar\"><h3>Popular</h3><ul>")
    if (id % 17 == 5) sb.append("<b>unclosed <i>nested &unknown; < stray")
    sb.append("<li><a href=\"/p/1\">Post one</a></li><li><a href=\"/p/2\">Post two</a></li>")
    sb.append("<li><a href=\"/p/3\">Post three</a></li></ul></div>\n")
    sb.append("<main><article>\n<h1>").append(title).append("</h1>\n")
    articleBlocks(d).foreach {
      case BHeading(t) =>
        sb.append("<h2>").append(escapeHtml(t)).append("</h2>\n")
      case BList(items) =>
        sb.append("<ul class=\"content-list\">\n")
        items.foreach(it => sb.append("  <li>").append(escapeHtml(it)).append("</li>\n"))
        sb.append("</ul>\n")
      case BPara(ptext, i) =>
        val esc = escapeHtml(ptext)
        if (i == 0 && id % 4 == 0 && ptext.length > 20) {
          // inline link mid-paragraph: same text, nonzero link density
          val cut1 = esc.length / 3
          val cut2 = esc.length / 2
          // cut on char boundaries of the escaped string is safe only if we
          // avoid splitting an entity — fall back to no link if a cut lands
          // inside one
          val safe = !esc.substring(0, cut1).reverse.takeWhile(_ != ';').contains('&') &&
            !esc.substring(0, cut2).reverse.takeWhile(_ != ';').contains('&')
          if (safe) {
            sb.append("<p>").append(esc.substring(0, cut1))
              .append("<a href=\"/ref\">").append(esc.substring(cut1, cut2)).append("</a>")
              .append(esc.substring(cut2)).append("</p>\n")
          } else sb.append("<p>").append(esc).append("</p>\n")
        } else if (i % 5 == 4) {
          sb.append("<p>").append(esc.replaceFirst(" ", "&nbsp;")).append("</p>\n")
        } else if (id % 5 == 2 && esc.indexOf(' ') >= 0) {
          // inline emphasis on the second word: <em> is a phrasing element,
          // so the extracted text is unchanged
          val words = esc.split(" ")
          val emWords =
            if (words.length >= 2) words.updated(1, "<em>" + words(1) + "</em>")
            else words
          sb.append("<p>").append(emWords.mkString(" ")).append("</p>\n")
        } else {
          sb.append("<p>").append(esc).append("</p>\n")
        }
    }
    sb.append("</article></main>\n")
    sb.append("<div class=\"linkfarm-x\"><a href=\"/l/1\">more</a> <a href=\"/l/2\">links</a> ")
    sb.append("<a href=\"/l/3\">here</a></div>\n")
    if (id % 3 != 2)
      sb.append("<div class=\"ads banner\">Buy now! Limited time offer. Click here.</div>\n")
    sb.append("<div class=\"related\"><h3>Related posts</h3><a href=\"/r/1\">Related one</a>")
    sb.append("<a href=\"/r/2\">Related two</a></div>\n")
    sb.append("<footer><p>(c) 2025 ").append(escapeHtml(urlHost(d)))
    sb.append("</p><a href=\"/privacy\">Privacy</a><a href=\"/terms\">Terms</a></footer>\n")
    sb.append("</body>\n</html>\n")
    sb.toString
  }

  private def urlHost(d: Doc): String = {
    val u = urlFor(d)
    u.stripPrefix("https://").takeWhile(_ != '/')
  }

  def payloadFor(d: Doc): Array[Byte] = kindOf(d.doc_id) match {
    case KOversize =>
      // > MAX_CONTENT_LENGTH: dispatch rejects on size BEFORE content,
      // so the body is a cheap constant fill behind an HTML prefix
      val b = new Array[Byte](graft.kernel.MergeSpec.MaxContentLength + 1)
      java.util.Arrays.fill(b, 'x'.toByte)
      b(0) = '<'
      b
    case KEmpty => Array.emptyByteArray
    case KUnsupported =>
      val filler = s"unsupported payload for doc ${d.doc_id}".getBytes("UTF-8")
      "PK".getBytes("UTF-8") ++ Array[Byte](3, 4) ++ filler
    case KImage =>
      val (fmt, w, h) = imageSpecFor(d.doc_id)
      fmt match {
        case "png" => ImageGen.png(w, h)
        case "jpg" => ImageGen.jpeg(w, h)
        case _     => ImageGen.tiff(w, h)
      }
    case KImageOversizedRes =>
      ImageGen.png(OversizeResDims._1, OversizeResDims._2)
    case KPdf => PdfGen.build(pdfPageTexts(d))
    case KCorruptPdf =>
      val pages = pdfPageTexts(d)
      PdfGen.build(pages, Set(corruptPageIndex(pages.length)))
    case KHtml => htmlFor(d).getBytes("UTF-8")
  }

  def pageFor(d: Doc): Page =
    Page(urlFor(d), tsFor(d.doc_id), payloadFor(d), d.text, d.lang)

  // ------------------------------------------------------------------
  // Golden expected output (the executable spec of A1-A9)
  // ------------------------------------------------------------------

  final case class Golden(url: String, expected_status: String,
                          expected_text: String, expected_error: String,
                          expected_n_pages: Int, expected_n_failed: Int)

  def goldenFor(d: Doc): Golden = kindOf(d.doc_id) match {
    case KOversize =>
      Golden(urlFor(d), "failed", "", MergeSpec.FileTooLarge, 0, 0)
    case KEmpty =>
      Golden(urlFor(d), "failed", "", MergeSpec.EmptyFile, 0, 0)
    case KUnsupported =>
      Golden(urlFor(d), "failed", "", MergeSpec.unsupportedType(".zip"), 0, 0)
    case KImage =>
      // within-cap raster: unsupported-by-design in this engine (no OCR
      // codec) — the A1 dispatch labels it with the sniffed extension
      val (fmt, _, _) = imageSpecFor(d.doc_id)
      Golden(urlFor(d), "failed", "", MergeSpec.unsupportedType(s".$fmt"), 0, 0)
    case KImageOversizedRes =>
      Golden(urlFor(d), "failed", "",
        MergeSpec.resolutionTooLarge(OversizeResDims._1, OversizeResDims._2), 0, 0)
    case KPdf =>
      val (txt, nf) = MergeSpec.mergePages(pdfPageTexts(d).map(Right(_)))
      Golden(urlFor(d), "completed", txt, "", pdfPageTexts(d).length, nf)
    case KCorruptPdf =>
      val pages = pdfPageTexts(d)
      val bad = corruptPageIndex(pages.length)
      val outcomes = pages.zipWithIndex.map { case (t, i) =>
        if (i == bad) Left("corrupt") else Right(t)
      }
      val (txt, nf) = MergeSpec.mergePages(outcomes)
      Golden(urlFor(d), "completed", txt, "", pages.length, nf)
    case KHtml =>
      Golden(urlFor(d), "completed", htmlGoldenText(d), "", 1, 0)
  }

  // ------------------------------------------------------------------
  // Spark-level table builders (distributed map; no driver-side loops)
  // ------------------------------------------------------------------

  def docs(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source").as[Doc]
  }

  def pages(spark: SparkSession, sfDir: String): Dataset[Page] = {
    import spark.implicits._
    docs(spark, sfDir).map(pageFor)
  }

  def golden(spark: SparkSession, sfDir: String): Dataset[Golden] = {
    import spark.implicits._
    docs(spark, sfDir).map(goldenFor)
  }
}
