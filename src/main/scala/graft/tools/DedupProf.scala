package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, ExtractJob}
import graft.sources.PageSynth

/** Sampling profile of the extraction-scale MinHash-LSH leg (the Bench
  * dedup_scale block, guide §1: measure first). Diagnostic only.
  */
object DedupProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "32").toInt
    val s = graft.operators.GraftConf(SparkSession.builder()
      .master(s"local[$hi]").appName("graft-dedup-prof")
      .config("spark.sql.shuffle.partitions", hi.toString)
      .config("spark.ui.enabled", "false")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    // same corpus construction as the Bench dedup-scale block
    val distinctPages = PageSynth.docs(s, sfDir).flatMap { d =>
      (0 until repl).iterator.map { r =>
        val marker = s"zrep${r}z"
        val toks = d.text.split(' ')
        val sb = new java.lang.StringBuilder(d.text.length * 2)
        var i = 0
        while (i < toks.length) {
          sb.append(toks(i)).append(' ')
          if (i % 2 == 1) sb.append(marker).append(' ')
          i += 1
        }
        d.copy(doc_id = d.doc_id * repl + r, text = sb.toString.trim)
      }
    }.map(PageSynth.pageFor).repartition(hi * 4)
    val extracted = ExtractJob.extract(s, distinctPages, buckets = 256).toDF()
      .filter(col("status") === "completed" && length(col("text")) > 200)
      .select(col("url"), col("text"))
      .localCheckpoint()
    val origs = extracted.filter(pmod(xxhash64(col("url")), lit(100L)) === 0)
    val planted = origs.select(
      concat(lit("dup://"), col("url")).as("url"),
      expr("concat(substring(text, 1, cast(length(text) * 0.45 AS int)), " +
        "' planted near duplicate marker tokens ', " +
        "substring(text, cast(length(text) * 0.5 AS int), length(text)))").as("text"))
    val ids = extracted.unionAll(planted)
      .select(xxhash64(col("url")).as("doc_id"), col("text"))

    def timedRun(): Long = {
      val got = Dedup.minhashLshPairsFrom(s, ids).localCheckpoint()
      got.count()
    }
    timedRun() // warm

    val tally = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        Thread.getAllStackTraces.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
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
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "2").toInt
    (1 to reps).foreach { _ =>
      val t = System.nanoTime()
      timedRun()
      println(f"rep: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    println(f"dedup-scale wall for $reps reps: $wall%.2f s")
    val rows = new java.util.ArrayList[(String, Long)]()
    tally.forEach((k, v) => { rows.add((k, v.sum())); () })
    val sorted = rows.toArray(Array.empty[(String, Long)]).sortBy(-_._2)
    val total = sorted.map(_._2).sum.toDouble
    println(f"total samples: ${total.toLong}")
    sorted.take(30).foreach { case (k, v) =>
      println(f"${v / total * 100}%6.2f%% $v%8d  $k")
    }
    s.stop()
  }
}
