package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.ExtractJob
import graft.sources.PageSynth

/** Dump the physical plans of the flagship pipeline (plan-shape audit:
  * ReadSchema pruning, absence of exchanges before the kernel).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_explain").toString
    PageSynth.pages(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$tmp/pages")
    import spark.implicits._
    val pages = spark.read.parquet(s"$tmp/pages").as[graft.model.Page]
    println("==== extract plan ====")
    ExtractJob.extract(spark, pages, 64).explain("formatted")
    println("==== lineage plan ====")
    ExtractJob.lineage(ExtractJob.extract(spark, pages, 64), 1L).explain("formatted")
    spark.stop()
  }
}
