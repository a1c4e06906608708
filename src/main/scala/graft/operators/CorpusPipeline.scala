package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.PageSynth

/** The end-to-end training-corpus pipeline — what this engine exists to
  * run at 100 TB: pages → main-content extraction → paragraph scrub →
  * exact + near dedup → repetition + quality filters → language ID →
  * training-ready corpus.
  *
  * Stage order is deliberate:
  *   1. extract           narrow kernel, no shuffle
  *   1.5 paragraph scrub  CCNet order: cross-document boilerplate out
  *                        BEFORE dedup — shared chrome otherwise inflates
  *                        both md5 collisions missed and shingle Jaccard
  *                        (one df shuffle + broadcast-set narrow map)
  *   2. exact dedup       one shuffle on md5(text) — kills byte-copies
  *                        before the costlier shingle pass
  *   3. near dedup        MinHash-LSH candidates verified by Jaccard;
  *                        keep the lowest url per duplicate cluster
  *   4. repetition filter Gopher dup-line/top-2gram flag on scrubbed text
  *   5. quality filter    C4-style score over extracted text, no shuffle
  *   6. language ID       kernel heuristic, no shuffle
  *
  * `funnel` reports per-stage survivor counts — the number every corpus
  * job publishes next to its output.
  */
object CorpusPipeline {

  val QualityThreshold = 0.5

  private def qualityCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = size(regexp_extract_all(text, lit("\\S+"), lit(0)))
    val stops = size(regexp_extract_all(lower(text),
      lit("\\b(the|and|of|to|in|is|that|a)\\b"), lit(0)))
    val punct = length(text) - length(regexp_replace(text, "[.,;:!?]", ""))
    val stopRatio = stops.cast("double") / greatest(toks, lit(1))
    val punctRatio = punct.cast("double") / greatest(length(text), lit(1))
    lit(0.4) * least(stopRatio * 5.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) +
      lit(0.3) * least(toks.cast("double") / 100.0, lit(1.0))
  }

  /** Extracted docs annotated with every pipeline signal + keep flags. */
  def corpus(s: SparkSession, dir: String, buckets: Int = 32): DataFrame = {
    import s.implicits._
    val extracted0 = ExtractJob.extract(s, PageSynth.pages(s, dir), buckets)
      .toDF()
      .filter(col("status") === "completed" && length(col("text")) > 0)

    // 1.5 paragraph scrub: remove cross-document boilerplate paragraphs
    // before any dedup sees the text (the CCNet stage order)
    val extracted = ParagraphDedup.paragraphScrubFrom(s,
        extracted0.select(col("url"), lit("completed").as("status"), col("text")))
      .select(col("url"), col("clean_text").as("text"),
        col("n_dropped").as("n_paras_dropped"))
      .filter(length(col("text")) > 0)

    // 4. repetition flag on the scrubbed text (joined back at the end)
    val repetition = TextAnalysis.textRepetition(
        extracted.select(col("url"), lit("completed").as("status"), col("text")))
      .select(col("url"), col("repetition_flagged"))

    // 2. exact dedup: keep min url per identical text
    val withHash = extracted.withColumn("h", md5(col("text")))
    val keepExact = withHash.groupBy(col("h")).agg(min(col("url")).as("keep_url"))
    val exactKept = withHash
      .join(keepExact, Seq("h"))
      .withColumn("is_exact_dup", col("url") =!= col("keep_url"))

    // 3. near dedup on the exact-kept set: LSH candidate pairs verified by
    //    Jaccard; drop the lexicographically larger url of each pair.
    //    Signatures are a narrow in-kernel map (no shingle shuffle);
    //    shingles explode only for candidate docs.
    val docsForLsh = exactKept.filter(!col("is_exact_dup"))
      .select(col("url"), col("text"))
    val bands = docsForLsh
      .as[(String, String)]
      .flatMap { case (u, text) =>
        val sig = Dedup.minhashSignature(Dedup.shinglesOf(text))
        (0 until Dedup.Bands).map(b => (u, b, Dedup.bandHash(sig, b)))
      }
      .toDF("url", "band", "bucket_h")
    val cand = bands.groupBy(col("band"), col("bucket_h"))
      .agg(sort_array(collect_list(col("url"))).as("us"))
      .filter(size(col("us")).between(2, 64))
      .select(explode(expr(
        "flatten(transform(us, (x, i) -> transform(slice(us, i + 2, size(us)), y -> struct(x AS url_a, y AS url_b))))"))
        .as("p"))
      .select(col("p.url_a"), col("p.url_b"))
      .distinct()
      .localCheckpoint() // consumed by the gate and the verify join
    // no .distinct(): left-semi broadcast build side — duplicates are
    // semantics-free, the distinct was a pure extra exchange
    val candUrls = cand.select(col("url_a").as("url"))
      .unionAll(cand.select(col("url_b").as("url")))
    // per-url shingle SETS as arrays (same set-intersect verify shape as
    // Dedup.minhashLshFromBands — no shingle explode, no per-pair agg)
    val shSets = docsForLsh
      .join(broadcast(candUrls), Seq("url"), "left_semi")
      .select(col("url"), array_distinct(
        graft.functions.TokenGrams.tokenGrams(s, col("text"), 3)).as("sh"))
    val nearDupUrls = cand
      .join(shSets.select(col("url").as("url_a"), col("sh").as("sha"),
        size(col("sh")).as("na")), Seq("url_a"))
      .join(shSets.select(col("url").as("url_b"), col("sh").as("shb"),
        size(col("sh")).as("nb")), Seq("url_b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .filter(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")) >= Dedup.JaccardThreshold)
      .select(col("url_b").as("url")) // keep the smaller url of each pair
      .distinct()

    // 5+6. quality + language over the survivors
    import s.implicits._
    val langOf = (t: String) => TextAnalysis.langIdOf(TextAnalysis.stripMergeChrome(t))
    val survivors = exactKept
      .join(nearDupUrls.withColumn("is_near_dup", lit(true)), Seq("url"), "left")
      .withColumn("is_near_dup", coalesce(col("is_near_dup"), lit(false)))
      .withColumn("quality", round(qualityCol(col("text")), 3))
    val withLang = survivors
      .select(col("url"), col("text"), col("n_paras_dropped"),
        col("is_exact_dup"), col("is_near_dup"), col("quality"))
      .as[(String, String, Int, Boolean, Boolean, Double)]
      .map { case (url, text, np, ed, nd, q) => (url, text, np, ed, nd, q, langOf(text)) }
      .toDF("url", "text", "n_paras_dropped", "is_exact_dup", "is_near_dup",
        "quality", "lang_pred")
    withLang
      .join(repetition, Seq("url"))
      .withColumn("keep",
        !col("is_exact_dup") && !col("is_near_dup") && !col("repetition_flagged") &&
          col("quality") >= QualityThreshold)
  }

  /** Per-stage funnel counts — the pipeline's publishable summary. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir).cache()
    try funnelFrom(s, c) finally { c.unpersist(): Unit }
  }

  /** Funnel counts from an already-computed (or materialized) corpus frame. */
  def funnelFrom(s: SparkSession, c: DataFrame): DataFrame = {
    val total = c.count()
    val afterExact = c.filter(!col("is_exact_dup")).count()
    val afterNear = c.filter(!col("is_exact_dup") && !col("is_near_dup")).count()
    val afterRep = c.filter(!col("is_exact_dup") && !col("is_near_dup") &&
      !col("repetition_flagged")).count()
    val kept = c.filter(col("keep")).count()
    import s.implicits._
    Seq(
      ("1_extracted_ok", total),
      ("2_after_exact_dedup", afterExact),
      ("3_after_near_dedup", afterNear),
      ("4_after_repetition_filter", afterRep),
      ("5_after_quality_filter", kept)
    ).toDF("stage", "n_docs").orderBy(col("stage"))
  }
}
