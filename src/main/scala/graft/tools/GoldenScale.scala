package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ExtractJob
import graft.sources.PageSynth

/** Golden byte-identity at bench scale: replicate the sf corpus the same
  * way Bench does (inflated text, distinct doc ids), extract, and compare
  * EVERY document's text/status/error against the golden-by-construction
  * expectation. Texts are md5-compressed per side before the join so the
  * compare shuffles digests, not payloads.
  *
  *   SPARK_GRAFT_REPL=200 sbt "runMain graft.tools.GoldenScale"   # 1M docs
  */
object GoldenScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "32").toInt
    val inflate = sys.env.getOrElse("SPARK_GRAFT_INFLATE", "8").toInt
    val spark = graft.operators.GraftConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-golden-scale")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = PageSynth.docs(spark, sfDir).flatMap { d =>
      val bigText = if (inflate <= 1) d.text else Array.fill(inflate)(d.text).mkString(" ")
      (0 until repl).iterator.map(r => d.copy(doc_id = d.doc_id * repl + r, text = bigText))
    }.localCheckpoint() // consumed by both sides below

    val actual = ExtractJob.extract(spark, docs.map(PageSynth.pageFor), buckets = 256)
      .toDF()
      .select(col("url"), md5(col("text")).as("h"), col("status"), col("error"))
    val expected = docs.map { d =>
      val g = PageSynth.goldenFor(d)
      (g.url, g.expected_text, g.expected_status, g.expected_error)
    }.toDF("url", "etext", "estatus", "eerror")
      .select(col("url"), md5(col("etext")).as("eh"), col("estatus"), col("eerror"))

    val row = actual.join(expected, Seq("url"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("h") === col("eh") && col("status") === col("estatus") &&
          col("error") === col("eerror"), 1L).otherwise(0L)).as("identical"))
      .collect()(0)
    println(s"[golden-scale] docs=${row.getLong(0)} byte_identical=${row.getLong(1)} " +
      s"mismatched=${row.getLong(0) - row.getLong(1)}")
    spark.stop()
  }
}
