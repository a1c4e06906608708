package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * quality/filtering layer of a training-data pipeline (what you run on
  * extracted text before it enters a training mix).
  *
  * All of these are narrow projections + one aggregation at most: they
  * scan linearly, never shuffle more than the final groupBy, and the
  * scalar work stays inside codegen'd built-ins wherever SQL can express
  * it (regexp_extract_all / length / least). Only language-ID and the
  * rolling-hash fingerprint drop to typed Scala (kernel-style map).
  */
object TextAnalysis {

  // ------------------------------------------------------------------
  // Token / quality statistics (oracle-checked)
  // ------------------------------------------------------------------

  /** GPT-2-style pre-tokenizer pattern (simplified, lookahead-free so it
    * runs identically under java.util.regex and RE2): contraction tails,
    * space-prefixed letter runs, digit runs, punctuation runs. The match
    * count is the "BPE-ish" token estimate every training-mix budget uses.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** Per-document token statistics: char count, whitespace-token count,
    * alnum-token count, BPE-ish token count, punctuation count, average
    * token length.
    */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Relational.table(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("n_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("n_alnum_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe_tokens"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))).as("n_punct"),
        round(length(regexp_replace(col("text"), "\\s", "")).cast("double") /
          greatest(size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))), lit(1)), 3)
          .as("avg_token_len"))
      .orderBy(col("doc_id"))

  val textStatsSql: String =
    """SELECT doc_id, length(text) AS n_chars,
      | len(regexp_extract_all(text, '\S+')) AS n_tokens,
      | len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_alnum_tokens,
      | len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS n_bpe_tokens,
      | length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
      | round(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) /
      |   greatest(len(regexp_extract_all(text, '\S+')), 1), 3) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality score in [0,1]: stopword presence + low punctuation noise +
    * length saturation (the heuristics-trio every webtext filter uses —
    * C4/Gopher-style rules, expressed as one arithmetic column).
    * Reported per language (groupBy agg).
    */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
    val stops = size(regexp_extract_all(lower(col("text")),
      lit("\\b(the|and|of|to|in|is|that|a)\\b"), lit(0)))
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
    val stopRatio = stops.cast("double") / greatest(toks, lit(1))
    val punctRatio = punct.cast("double") / greatest(length(col("text")), lit(1))
    val score =
      lit(0.4) * least(stopRatio * 5.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) +
        lit(0.3) * least(toks.cast("double") / 100.0, lit(1.0))
    Relational.table(s, dir, "documents")
      .withColumn("q", score)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("q")), 3).as("avg_quality"),
        round(min(col("q")), 3).as("min_quality"),
        round(max(col("q")), 3).as("max_quality"))
      .orderBy(col("lang"))
  }

  val textQualitySql: String =
    """WITH scored AS (
      | SELECT lang,
      |  0.4 * least(CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|a)\b')) AS DOUBLE)
      |        / greatest(len(regexp_extract_all(text, '\S+')), 1) * 5.0, 1.0)
      |  + 0.3 * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
      |        / greatest(length(text), 1) * 10.0, 1.0))
      |  + 0.3 * least(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 100.0, 1.0) AS q
      | FROM documents)
      |SELECT lang, count(*) AS n_docs, round(avg(q), 3) AS avg_quality,
      | round(min(q), 3) AS min_quality, round(max(q), 3) AS max_quality
      |FROM scored GROUP BY lang ORDER BY lang""".stripMargin

  /** Corpus-level token frequency: top 20 alpha tokens. */
  def textTopTokens(s: SparkSession, dir: String): DataFrame =
    Relational.table(s, dir, "documents")
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)

  val textTopTokensSql: String =
    """SELECT tok, count(*) AS n FROM (
      | SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok FROM documents) t
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin

  /** Deterministic train/val/test split assignment — every corpus needs
    * one, and it must be a pure function of a stable key (NOT random:
    * reruns, resumes, and incremental appends must land each doc in the
    * same split). Knuth multiplicative hashing on doc_id keeps the
    * assignment integer-exact across engines (oracle-checked). doc_id is
    * reduced mod a prime (1000003) BEFORE the multiply so the product
    * stays < 2^63 for any doc_id — at 10^12-doc scale a raw
    * doc_id * 2654435761 overflows Long (Spark wraps silently, DuckDB
    * raises), which would break cross-engine determinism exactly where
    * it matters.
    *
    * This is split_v2. The pre-modulus formula (v1) assigned DIFFERENT
    * memberships — splits persisted under v1 must be re-derived, not
    * mixed with v2 output (MIGRATION.md "Corpus-split function
    * versioning"); the stability contract above holds within a version.
    */
  def corpusSplit(s: SparkSession, dir: String): DataFrame = {
    val h = ((col("doc_id") % 1000003L) * lit(2654435761L)) % 1000
    val split = when(h < 850, "train").when(h < 925, "validation").otherwise("test")
    Relational.table(s, dir, "documents")
      .withColumn("split", split)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("lang"), col("split"))
  }

  val corpusSplitSql: String =
    """SELECT lang,
      | CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 850 THEN 'train'
      |      WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 925 THEN 'validation'
      |      ELSE 'test' END AS split,
      | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
      |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  // ------------------------------------------------------------------
  // Language ID (heuristic kernel; rows-only check + spec)
  // ------------------------------------------------------------------

  private val StopwordLangs: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "this"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "von", "auf"),
    "es" -> Set("el", "los", "las", "que", "y", "un", "una", "es", "por", "como", "para", "del"),
    "fr" -> Set("le", "les", "des", "et", "est", "une", "dans", "pour", "qui", "sur", "au", "pas")
  )

  /** Strip the extraction pipeline's merge chrome (the reference's page
    * headers / summary footer, which are Chinese literals — MergeSpec)
    * so language-ID sees only document content. Without this, every
    * multi-page PDF would lean zh from its markers alone.
    */
  def stripMergeChrome(text: String): String =
    text.linesIterator.filterNot { l =>
      l.startsWith("--- 第") || l.startsWith("--- 处理摘要") ||
        l.startsWith("总页数:") || l.startsWith("成功页数:") ||
        l.startsWith("失败页数:") || l.startsWith("失败页码:") ||
        l == "所有页面处理成功"
    }.mkString("\n")

  /** N-gram/stopword language heuristic: script detection first (CJK →
    * zh), then Latin-language stopword voting with a deterministic
    * priority tiebreak. Returns "und" (undetermined) when nothing hits —
    * the synthetic corpus shares an English-ish vocabulary across its
    * de/es/fr labels, so only script + en detection is *assertable* here;
    * the de/es/fr stopword tables are real and take effect on real text.
    */
  def langIdOf(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var letters = 0
    var i = 0
    val n = math.min(text.length, 4000) // bounded scan: id stabilizes early
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val b = Character.UnicodeScript.of(c)
        if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
          b == Character.UnicodeScript.KATAKANA || b == Character.UnicodeScript.HANGUL) cjk += 1
      }
      i += 1
    }
    if (letters > 0 && cjk.toDouble / letters > 0.05) return "zh"
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9\\p{L}]+").iterator.filter(_.nonEmpty).take(800)
    val counts = new Array[Int](StopwordLangs.length)
    var total = 0
    toks.foreach { t =>
      total += 1
      var j = 0
      while (j < StopwordLangs.length) {
        if (StopwordLangs(j)._2.contains(t)) counts(j) += 1
        j += 1
      }
    }
    if (total == 0) return "und"
    val best = counts.indices.maxBy(i => counts(i)) // first max wins: en priority
    if (counts(best) > 0) StopwordLangs(best)._1
    // Latin letters but zero stopword hits: fall back to the corpus prior
    // (en) — the standard langid behavior of returning the best guess
    // rather than abstaining when script alone is informative.
    else if (letters > 0) "en"
    else "und"
  }

  /** Confusion matrix of heuristic language-ID vs the labeled lang column.
    * Runs on the *extracted* text (PageSynth golden = the pipeline's output
    * text), which is where langid sits in a real crawl pipeline — after
    * extraction, before quality filtering. The synthetic corpus only
    * encodes script-level signal (zh) + English vocabulary, so zh and en
    * are the assertable rows (see TextAnalysisSpec).
    */
  /** (lang, pred_lang) rows — the narrow kernel stage, exposed separately
    * so the harness can materialize it and oracle-check the confusion agg.
    */
  def langidPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.PageSynth.docs(s, dir)
      .map { d =>
        val extractedText = graft.sources.PageSynth.goldenFor(d).expected_text
        (d.lang, langIdOf(stripMergeChrome(extractedText)))
      }
      .toDF("lang", "pred_lang")
  }

  /** Confusion-matrix agg over (lang, pred_lang) pairs. */
  def langidConfusion(pairs: DataFrame): DataFrame =
    pairs
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))

  def textLangid(s: SparkSession, dir: String): DataFrame =
    langidConfusion(langidPairs(s, dir))

  // ------------------------------------------------------------------
  // Document fingerprint (rolling hash; rows-only check + spec)
  // ------------------------------------------------------------------

  /** 64-bit polynomial rolling hash (Rabin–Karp, base 1099511628211) over
    * whitespace-normalized text — an order-sensitive complement to the
    * order-insensitive MinHash/SimHash family: same tokens reordered give
    * a different fingerprint.
    */
  def fingerprintOf(text: String): Long = {
    val Seed = -3750763034362895579L // FNV-64 offset basis (signed)
    var h = Seed
    var prevSpace = true
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val isSpace = Character.isWhitespace(c)
      if (!isSpace) {
        if (prevSpace && h != Seed) h = h * 1099511628211L + ' '.toLong
        h = h * 1099511628211L + c.toLong
      }
      prevSpace = isSpace
      i += 1
    }
    h
  }

  /** (doc_id, fp) rows — the narrow kernel stage. */
  def fingerprintPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Relational.table(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, fingerprintOf(text)) }
      .toDF("doc_id", "fp")
  }

  /** Duplicate-group agg over fingerprints (the join shape of an
    * exact-dedup pass keyed by fingerprint instead of md5).
    */
  def fingerprintGroups(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .orderBy(col("keep_id"))

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    fingerprintGroups(fingerprintPairs(s, dir))
}
