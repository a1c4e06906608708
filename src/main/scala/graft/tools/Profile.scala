package graft.tools

import graft.kernel.ExtractKernel
import graft.sources.PageSynth

/** Throwaway micro-profiler: times the pure kernel (no Spark) on
  * bench-shaped docs, single-threaded and multi-threaded, to separate
  * kernel cost from data-plane cost. Not part of the library surface.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val inflate = 8
    val docsPerKind = 2000
    // bench-shaped docs: ~10 KB text
    val baseText = (1 to 110).map(i => s"word$i token sample content piece").mkString(" ")
    val bigText = Array.fill(inflate)(baseText).mkString(" ")
    val htmlDocs = (0 until docsPerKind).map { i =>
      PageSynth.Doc(i * 10 + 1, bigText, "en", s"src$i") // %10==1 → html
    }
    val pdfDocs = (0 until docsPerKind / 10).map { i =>
      PageSynth.Doc(i * 10 + 7, bigText, "en", s"src$i") // %10==7 → pdf
    }
    def pagesOf(ds: Seq[PageSynth.Doc]) = ds.map(PageSynth.pageFor).toArray

    val htmlPages = pagesOf(htmlDocs)
    val pdfPages = pagesOf(pdfDocs)
    println(s"html payload bytes: ${htmlPages.map(_.html.length.toLong).sum}")
    println(s"pdf  payload bytes: ${pdfPages.map(_.html.length.toLong).sum}")

    def time(label: String, n: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $dt%8.3f s  ${n / dt}%10.0f docs/s  (sink=$r)")
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      time("html 1-thread", htmlPages.length) {
        htmlPages.map(p => ExtractKernel.extractOne(p, 0).text.length.toLong).sum
      }
      time("pdf  1-thread", pdfPages.length) {
        pdfPages.map(p => ExtractKernel.extractOne(p, 0).text.length.toLong).sum
      }
      def parRun(label: String, pages: Array[graft.model.Page], nDocs: Long): Unit =
        time(label, nDocs) {
          val par = 32
          val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
          val futs = (0 until par).map { t =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long = {
                var acc = 0L
                var i = t % 8 // stride 8 × 32 threads → corpus covered 4×
                while (i < pages.length) { acc += ExtractKernel.extractOne(pages(i), 0).text.length; i += 8 }
                acc
              }
            })
          }
          val r = futs.map(_.get()).sum
          pool.shutdown()
          r
        }
      parRun("html 32-thread", htmlPages, htmlPages.length * 4L)
      parRun("pdf  32-thread", pdfPages, pdfPages.length * 4L)
    }
  }
}
