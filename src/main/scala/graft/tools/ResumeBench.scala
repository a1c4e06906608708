package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.ExtractRunner
import graft.sources.PageSynth

/** Measures what resume actually costs on a done table: the classic path
  * (anti-join over the full pages scan) vs the bucketed-ingest path
  * (partition-pruned scan of not-done buckets only). The number that
  * matters at 100 TB is the NO-OP resume — rerunning over a mostly-done
  * table should cost proportional to the remaining work.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ResumeBench"
  */
object ResumeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "32").toInt
    val inflate = sys.env.getOrElse("SPARK_GRAFT_INFLATE", "8").toInt
    val buckets = 256
    val spark = graft.operators.GraftConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-resume-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_resume_bench").toString
    val docs = PageSynth.docs(spark, sfDir)
    docs.flatMap { d =>
      val bigText = if (inflate <= 1) d.text else Array.fill(inflate)(d.text).mkString(" ")
      (0 until repl).iterator.map(r => d.copy(doc_id = d.doc_id * repl + r, text = bigText))
    }.map(PageSynth.pageFor)
      .repartition(cpus * 4)
      .write.mode("overwrite").parquet(s"$base/pages")
    val nDocs = spark.read.parquet(s"$base/pages").count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // classic path
    val tRun = timed { ExtractRunner.run(spark, s"$base/pages", s"$base/classic", buckets) }
    val tNoop = timed { ExtractRunner.run(spark, s"$base/pages", s"$base/classic", buckets) }

    // bucketed path
    val tIngest = timed { ExtractRunner.ingest(spark, s"$base/pages", s"$base/bucketed", buckets) }
    val tRunB = timed { ExtractRunner.runBucketed(spark, s"$base/bucketed", buckets) }
    val tNoopB = timed { ExtractRunner.runBucketed(spark, s"$base/bucketed", buckets) }

    println(f"[resume-bench] docs=$nDocs classic: run=$tRun%.1fs noop_resume=$tNoop%.1fs | " +
      f"bucketed: ingest=$tIngest%.1fs run=$tRunB%.1fs noop_resume=$tNoopB%.1fs")
    spark.stop()
  }
}
