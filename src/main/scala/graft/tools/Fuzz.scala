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
      // 4. pixel decoders: corrupt a valid raster payload (mutations +
      // truncation) — decodeLuma must stay total on every format
      if (i % 4 == 0) {
        val base = pixelBases(rnd.nextInt(pixelBases.length))
        val mut = java.util.Arrays.copyOf(base, 1 + rnd.nextInt(base.length))
        var m = 0
        val nMut = 1 + rnd.nextInt(12)
        while (m < nMut) {
          mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
          m += 1
        }
        // throwing is the failure, for the decoder AND the OCR chain
        // running on whatever (possibly garbage) pixels it produced
        graft.kernel.PixelDecode.decodeLuma(mut)
          .foreach(graft.kernel.GlyphOcr.recognize)
        pixelChecked += 1
      }
      // 5. WAV + MP4 parser totality under the same corruption scheme
      if (i % 8 == 0) {
        val base = if (i % 16 == 0) wavBase else mp4Base
        val mut = java.util.Arrays.copyOf(base, 1 + rnd.nextInt(base.length))
        var m = 0
        val nMut = 1 + rnd.nextInt(12)
        while (m < nMut) {
          mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
          m += 1
        }
        graft.kernel.WavParse.parse(mut)
        graft.kernel.Mp4Parse.parse(mut)
        wavChecked += 1
      }
      i += 1
    }
    println(s"[fuzz] OK: $n cases, $tokenizerChecked tokenizer-parity checks, " +
      s"$spanChecked spans validated, $pixelChecked pixel corruptions decoded-or-rejected, " +
      s"$wavChecked wav+mp4 corruptions parsed-or-rejected, 0 divergences")
  }

  private var pixelChecked = 0L
  private var wavChecked = 0L

  private lazy val wavBase: Array[Byte] =
    graft.sources.ImageGen.wavReal(256, 8000, channels = 2,
      withListChunk = true)(i => ((i * 13) % 200 - 100) * 50)

  private lazy val mp4Base: Array[Byte] =
    graft.sources.ImageGen.mp4(1600, 48000, Seq("vide", "soun"), mvhdV1 = true)

  /** One valid real-pixel payload per raster format (corruption seeds). */
  private lazy val pixelBases: Array[Array[Byte]] = {
    import graft.sources.ImageGen
    def px(x: Int, y: Int) = ((x * 9) & 0xff, (y * 7) & 0xff, 50)
    Array(
      ImageGen.pngReal(23, 17)(px),
      ImageGen.bmpReal(23, 17)(px),
      ImageGen.gifReal(23, 17, (0 until 8).map(i => (i * 30, i * 20, i * 10)))((x, y) => (x + y) % 8),
      ImageGen.tiffReal(23, 17)(px),
      ImageGen.tiffLzwReal(23, 17, predictor = 2)(px),
      ImageGen.jpegReal(23, 17, color = true)((x, y) => (x * 9 + y * 7) & 0xff),
      ImageGen.jpegProgressive(23, 17, color = true)((x, y) => (x * 9 + y * 7) & 0xff))
  }
}
