package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ExtractJob
import graft.sources.PageSynth

/** Poor-man's sampling profiler for the extract kernel (guide §1: measure
  * first; no async-profiler in the sandbox). Replicates the Bench
  * headline input (inflated + replicated pages), runs the kernel, and
  * samples all executor task threads from a daemon thread, tallying the
  * top frames by self time. Diagnostic only — not part of the driver
  * contract.
  */
object ExtractProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "32").toInt
    val inflate = sys.env.getOrElse("SPARK_GRAFT_INFLATE", "8").toInt
    val s = graft.operators.GraftConf(SparkSession.builder()
      .master(s"local[$hi]").appName("graft-prof")
      .config("spark.sql.shuffle.partitions", hi.toString)
      .config("spark.ui.enabled", "false")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_prof").toString
    val pagesDir = s"$base/pages"
    val docs = PageSynth.docs(s, sfDir)
    docs.flatMap { d =>
      val bigText = if (inflate <= 1) d.text else Array.fill(inflate)(d.text).mkString(" ")
      (0 until repl).iterator.map(r => d.copy(doc_id = d.doc_id * repl + r, text = bigText))
    }.map(PageSynth.pageFor)
      .repartition(hi * 4)
      .write.mode("overwrite").parquet(pagesDir)

    def run(): Long = {
      val pages = s.read.parquet(pagesDir).as[graft.model.Page]
      ExtractJob.extract(s, pages, buckets = 256).toDF()
        .select(xxhash64(col("url"), col("text")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0).getLong(0)
    }
    run() // warm

    val tally = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val stacks = Thread.getAllStackTraces
        stacks.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            // find the deepest graft.* frame (self-ish attribution), else
            // the top frame's class
            val g = st.find(f => f.getClassName.startsWith("graft."))
            val key = g match {
              case Some(f) => s"${f.getClassName}.${f.getMethodName}"
              case None =>
                val f = st.head
                s"[non-graft] ${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}"
            }
            tally.computeIfAbsent(key, _ => new java.util.concurrent.atomic.LongAdder()).increment()
          }
        }
        Thread.sleep(7)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt
    (1 to reps).foreach(_ => run())
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    println(f"extract wall for $reps reps: $wall%.2f s")
    val rows = new java.util.ArrayList[(String, Long)]()
    tally.forEach((k, v) => { rows.add((k, v.sum())); () })
    val sorted = rows.toArray(Array.empty[(String, Long)]).sortBy(-_._2)
    val total = sorted.map(_._2).sum.toDouble
    println(f"total samples: ${total.toLong}")
    sorted.take(40).foreach { case (k, v) =>
      println(f"${v / total * 100}%6.2f%% $v%8d  $k")
    }
    s.stop()
  }
}
