package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.PageSynth

/** Generate a replicated/inflated pages corpus to a directory (the same
  * shape graft.Bench materializes) — input generator for end-to-end
  * ExtractRunner runs: `runMain graft.tools.GenPages <sfDir> <outDir>
  * [repl] [inflate]`.
  */
object GenPages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val repl = if (args.length > 2) args(2).toInt else 32
    val inflate = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    PageSynth.docs(spark, sfDir)
      .flatMap { d =>
        val bigText = if (inflate <= 1) d.text
          else Array.fill(inflate)(d.text).mkString(" ")
        (0 until repl).iterator.map(r => d.copy(doc_id = d.doc_id * repl + r, text = bigText))
      }
      .map(PageSynth.pageFor)
      .repartition(128)
      .write.mode("overwrite").parquet(outDir)
    println(s"[gen-pages] wrote ${spark.read.parquet(outDir).count()} pages to $outDir")
    spark.stop()
  }
}
