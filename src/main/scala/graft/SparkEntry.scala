package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, ExtractJob, Multimodal, Relational, Similarity, TextAnalysis}
import graft.sources.PageSynth
import graft.streaming.StreamingExtract

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator (SURVEY.md §2);
  * `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible operator (the driver's correctness gate). Extraction,
  * LSH-sketch, and kernel-heuristic queries are non-SQL-expressible
  * (rows-only check) — their byte/semantic contracts are enforced by the
  * ScalaTest specs (`sbt -batch test`) instead.
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

  /** The extraction-family queries all consume the same extracted table;
    * materialize it once per (jvm, input dir) so a Verify run doesn't pay
    * the kernel once per query. Same rows either way — the kernel is
    * deterministic (asserted across parallelism levels).
    */
  private val extractCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def cachedExtract(s: SparkSession, dir: String): DataFrame = {
    val path = extractCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_extract_cache")
        .resolve("extracted").toString
      ExtractJob.extract(s, PageSynth.pages(s, dir), buckets = 32)
        .write.parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val extraction: Map[String, (SparkSession, String) => DataFrame] = Map(
      // ---- extraction pipeline (A1-A11; byte contract via KernelSpec golden tests) ----
      "extract_main" -> ((s, dir) =>
        cachedExtract(s, dir).select("url", "status", "text", "error",
          "n_pages", "n_failed_pages", "engine", "bucket")),
      "extract_spans" -> ((s, dir) =>
        cachedExtract(s, dir)
          .select(col("url"), explode(col("spans")).as("span"))
          .select(col("url"), col("span.start").as("start"),
            col("span.end").as("end"), col("span.kind").as("kind"))),
      "extract_lineage" -> ((s, dir) => {
        import s.implicits._
        // failure_samples is an array in the lineage table; serialize it
        // for the driver compare (pandas cannot sort/hash array cells)
        ExtractJob.lineage(cachedExtract(s, dir).as[graft.model.Extracted], snapshotId = 1L)
          .withColumn("failure_samples", array_join(col("failure_samples"), "|"))
      }),
      "extract_by_host" -> ((s, dir) => {
        import s.implicits._
        ExtractJob.metricsByHost(cachedExtract(s, dir).as[graft.model.Extracted])
      }),
      "extract_golden_check" -> ((s, dir) => {
        // byte-identity summary vs golden-by-construction fixtures:
        // n_mismatched MUST be 0 (also asserted per-url in KernelSpec)
        val extracted = cachedExtract(s, dir)
        val golden = PageSynth.golden(s, dir).toDF()
        extracted.join(golden, Seq("url"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("text") === col("expected_text") &&
              col("status") === col("expected_status") &&
              col("error") === col("expected_error"), 1L).otherwise(0L)).as("n_byte_identical"),
            sum(when(col("text") =!= col("expected_text") ||
              col("status") =!= col("expected_status") ||
              col("error") =!= col("expected_error"), 1L).otherwise(0L)).as("n_mismatched"))
      }),
      "stream_extract_counts" -> ((s, dir) => {
        // same kernel via Structured Streaming (Trigger.AvailableNow)
        val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
        PageSynth.pages(s, dir).write.mode("overwrite").parquet(s"$base/pages")
        StreamingExtract.runAvailableNow(s, s"$base/pages", "stream_extract")
        s.table("stream_extract")
          .groupBy(col("status")).agg(count(lit(1)).as("n"),
            sum(col("n_pages").cast("long")).as("total_pages"))
          .orderBy(col("status"))
      }),
      "extract_profiles" -> ((s, dir) => {
        // the reference's three engines as deterministic kernel profiles
        // (A4/A5/A7) + the ollama output_format serializers
        import graft.kernel.ExtractKernel.Profile
        val pages = PageSynth.pages(s, dir)
        Seq(
          ("standard", Profile("standard")),
          ("llm", Profile("llm")),
          ("llm_faulty", Profile("llm", "faulty")), // A6 envelope-fault slice
          ("ollama_plain_text", Profile("ollama", "plain_text")),
          ("ollama_markdown", Profile("ollama", "markdown")),
          ("ollama_json", Profile("ollama", "json")),
          ("ollama_structured", Profile("ollama", "structured")),
          ("ollama_key_value", Profile("ollama", "key_value"))
        ).map { case (name, prof) =>
          ExtractJob.extract(s, pages, buckets = 32, profile = prof).toDF()
            .agg(count(lit(1)).as("n_docs"),
              sum(when(col("status") === "completed", 1L).otherwise(0L)).as("n_completed"),
              sum(length(col("text")).cast("long")).as("total_chars"))
            .withColumn("profile", lit(name))
        }.reduce(_.unionAll(_)).select("profile", "n_docs", "n_completed", "total_chars")
          .orderBy(col("profile"))
      }),
      // ---- end-to-end training-corpus pipeline ----
      "pipeline_corpus" -> ((s, dir) =>
        graft.operators.CorpusPipeline.corpus(s, dir)
          .select("url", "is_exact_dup", "is_near_dup", "quality", "lang_pred", "keep")
          .orderBy(col("url"))),
      "pipeline_funnel" -> ((s, dir) => graft.operators.CorpusPipeline.funnel(s, dir)),
      // ---- multimodal binary-column plumbing ----
      "mm_media_meta" -> ((s, dir) =>
        Multimodal.mediaMeta(s, dir).toDF()
          .select("url", "media_type", "n_bytes", "content_hash", "entropy_m",
            "width", "height", "decode_ok")),
      "mm_triage" -> ((s, dir) => Multimodal.mediaTriage(s, dir)),
      // ---- dedup family ----
      "dedup_exact" -> ((s, dir) => Dedup.dedupExact(s, dir)),
      "dedup_ngram_jaccard" -> ((s, dir) => Dedup.dedupNgramJaccard(s, dir)),
      "dedup_minhash_lsh" -> ((s, dir) => Dedup.dedupMinhashLsh(s, dir)),
      "dedup_simhash" -> ((s, dir) => Dedup.dedupSimhash(s, dir)),
      "dedup_embedding" -> ((s, dir) => Dedup.dedupEmbedding(s, dir)),
      "dedup_clusters" -> ((s, dir) => Dedup.dedupClusters(s, dir)),
      // ---- similarity search ----
      "ann_bruteforce" -> ((s, dir) => Similarity.annBruteForce(s, dir)),
      "ann_lsh" -> ((s, dir) => Similarity.annLsh(s, dir)),
      "ann_ivf" -> ((s, dir) => Similarity.annIvf(s, dir)),
      "emb_quantize_stats" -> ((s, dir) => graft.operators.Quantize.quantizeStats(s, dir)),
      // ---- text analysis ----
      "text_stats" -> ((s, dir) => TextAnalysis.textStats(s, dir)),
      "text_quality" -> ((s, dir) => TextAnalysis.textQuality(s, dir)),
      "text_top_tokens" -> ((s, dir) => TextAnalysis.textTopTokens(s, dir)),
      "text_langid" -> ((s, dir) => TextAnalysis.textLangid(s, dir)),
      "text_fingerprint" -> ((s, dir) => TextAnalysis.textFingerprint(s, dir)),
      "corpus_split" -> ((s, dir) => TextAnalysis.corpusSplit(s, dir))
    )
    val relational = Relational.all.map { case (name, fn, _) =>
      name -> fn
    }.toMap
    extraction ++ relational
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (extraction kernel, LSH sketches, heuristic kernels) → driver
    * records a rows-only check; their contracts are covered by specs.
    */
  def oracleSql: Map[String, String] =
    Relational.all.map { case (name, _, sql) => name -> sql }.toMap ++ Map(
      "dedup_exact" -> Dedup.dedupExactSql,
      "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
      "dedup_embedding" -> Dedup.dedupEmbeddingSql,
      "dedup_clusters" -> Dedup.dedupClustersSql,
      "ann_bruteforce" -> Similarity.annBruteForceSql,
      "text_stats" -> TextAnalysis.textStatsSql,
      "text_quality" -> TextAnalysis.textQualitySql,
      "text_top_tokens" -> TextAnalysis.textTopTokensSql,
      "corpus_split" -> TextAnalysis.corpusSplitSql
    )
}
