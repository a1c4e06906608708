package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernel.ExtractKernel
import graft.operators.ExtractJob
import graft.sources.PageSynth

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator (SURVEY.md §2);
  * `oracleSql` carries the DuckDB-equivalent SQL for every relational
  * operator (the driver's correctness gate). Extraction queries are
  * non-SQL-expressible (rows-only check) — their byte contract is
  * enforced by GoldenSpec / `sbt -batch test` instead.
  */
object SparkEntry {

  /** Flagship: full extraction pipeline on sf0.001 — synthesized
    * Common-Crawl-style pages → extract kernel → per-(lang,status) doc
    * counts joined back against the input langs.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val pages = PageSynth.pages(spark, sfDir)
    val extracted = ExtractJob.extract(spark, pages, buckets = 16)
    extracted.toDF()
      .join(pages.toDF().select(col("url"), col("lang")), Seq("url"))
      .groupBy(col("lang"), col("status"))
      .agg(count(lit(1)).as("docs"),
        sum(length(col("text")).cast("long")).as("chars"))
      .orderBy(col("lang"), col("status"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction pipeline (A1-A11; byte contract via GoldenSpec) ----
    "extract_main" -> ((s, dir) => {
      val extracted = ExtractJob.extract(s, PageSynth.pages(s, dir), buckets = 32)
      extracted.toDF().select("url", "status", "text", "error",
        "n_pages", "n_failed_pages", "engine", "bucket")
    }),
    "extract_spans" -> ((s, dir) => {
      val extracted = ExtractJob.extract(s, PageSynth.pages(s, dir), buckets = 32)
      extracted.toDF()
        .select(col("url"), explode(col("spans")).as("span"))
        .select(col("url"), col("span.start").as("start"),
          col("span.end").as("end"), col("span.kind").as("kind"))
    }),
    "extract_lineage" -> ((s, dir) => {
      val extracted = ExtractJob.extract(s, PageSynth.pages(s, dir), buckets = 32)
      ExtractJob.lineage(extracted, snapshotId = 1L)
    }),
    "extract_by_host" -> ((s, dir) => {
      val extracted = ExtractJob.extract(s, PageSynth.pages(s, dir), buckets = 32)
      ExtractJob.metricsByHost(extracted)
    }),
    "extract_golden_diff" -> ((s, dir) => {
      // regression diff: urls whose extracted bytes mismatch golden (must be empty)
      val extracted = ExtractJob.extract(s, PageSynth.pages(s, dir), buckets = 32).toDF()
      val golden = PageSynth.golden(s, dir).toDF()
      extracted.join(golden, Seq("url"))
        .filter(col("text") =!= col("expected_text") ||
          col("status") =!= col("expected_status") ||
          col("error") =!= col("expected_error"))
        .select("url", "status", "expected_status")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map()
}
