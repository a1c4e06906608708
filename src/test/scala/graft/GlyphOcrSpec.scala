package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.{GlyphOcr, PixelDecode}
import graft.sources.ImageGen

/** From-scratch glyph OCR: render → decode → recognize must round-trip
  * EXACTLY for the font alphabet at any integer scale, refuse (None)
  * rather than misread on corruption, and drive the mm_ocr operator to
  * zero mismatches over the smoke corpus.
  */
class GlyphOcrSpec extends AnyFunSuite {

  private def roundTrip(lines: Seq[String], scale: Int): Option[String] =
    PixelDecode.decodeLuma(ImageGen.textImageReal(lines, scale))
      .flatMap(GlyphOcr.recognize)

  test("round-trip: full alphabet, words, multi-line, scales 1-4") {
    val cases = Seq(
      Seq("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "0123456789"),
      Seq("THE QUICK BROWN FOX JUMPS", "OVER THE LAZY DOG 42"),
      Seq("A"),
      Seq("I1I1 0O0O 8B8B"), // the classic confusable pairs stay distinct
      Seq(""))
    for (lines <- cases; scale <- 1 to 4) {
      val want = lines.map(_.trim).mkString("\n").trim
      assert(roundTrip(lines, scale).contains(want), s"scale=$scale lines=$lines")
    }
  }

  test("normalize: case fold, out-of-alphabet to single spaces, trim") {
    assert(GlyphOcr.normalize("Hello, World! 42") == "HELLO WORLD 42")
    assert(GlyphOcr.normalize("  a\t\nb  ") == "A B")
    assert(GlyphOcr.normalize("中文 mixed 中文 text") == "MIXED TEXT")
    assert(GlyphOcr.normalize("") == "")
    assert(GlyphOcr.normalize("!!!") == "")
  }

  test("pipeline text round-trips through normalize + render + recognize") {
    val texts = Seq(
      "Best practices for data pipelines, part 7.",
      "QUOTA: 95 percent (cap 4096)",
      "the 13-gram rule")
    for (t <- texts) {
      val norm = GlyphOcr.normalize(t)
      assert(roundTrip(Seq(norm), 2).contains(norm), t)
    }
  }

  test("corruption refuses rather than misreads") {
    val want = "REFUSE DONT GUESS"
    val png = ImageGen.textImageReal(Seq(want), 2)
    val img = PixelDecode.decodeLuma(png).get
    // flip every pixel in a horizontal stripe: segmentation or matching
    // must fail closed — the result is None or the exact original, never
    // a DIFFERENT string
    for (row <- Seq(0, img.height / 2, img.height - 1)) {
      val mut = PixelDecode.Luma(img.width, img.height, img.luma.clone())
      for (x <- 0 until img.width)
        mut.luma(row * img.width + x) = (255 - (mut.luma(row * img.width + x) & 0xff)).toByte
      val got = GlyphOcr.recognize(mut)
      assert(got.isEmpty || got.contains(want), s"row=$row got=$got")
    }
    // random pixel noise: total, never throws
    val rnd = new java.util.Random(7)
    val noisy = PixelDecode.Luma(img.width, img.height,
      Array.fill(img.width * img.height)(rnd.nextInt(256).toByte))
    GlyphOcr.recognize(noisy) // no throw
  }

  test("mm_ocr: zero mismatches over the smoke corpus, oracle-shaped summary") {
    import TestSpark.{sf0001, spark}
    import spark.implicits._
    val row = SparkEntry.queries("mm_ocr")(spark, sf0001)
      .as[(Long, Long, Long, Long)].head()
    val (nImages, nExact, nMismatched, payloadBytes) = row
    assert(nImages == 500L)
    assert(nExact == 500L)
    assert(nMismatched == 0L)
    assert(payloadBytes > 0L)
  }
}
