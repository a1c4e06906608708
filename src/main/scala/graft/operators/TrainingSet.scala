package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-set assembly operators — the last stages between a deduped
  * corpus and a tokenizer:
  *
  *   - decontaminate: benchmark n-gram overlap detection (the GPT-3 /
  *     PaLM decontamination rule: a training doc is contaminated if it
  *     shares any 13-gram with an eval benchmark). The benchmark side is
  *     tiny (eval suites are ≤10^6 items) → its n-gram set broadcasts;
  *     the corpus side explodes token windows into a broadcast-hash join
  *     and only matching windows reach the per-doc count shuffle — the
  *     corpus never shuffles its text.
  *   - substringDedup: window-level exact dedup (Lee et al. 2022,
  *     "Deduplicating Training Data Makes Language Models Better" —
  *     repeated SPANS, not whole-doc dups): fixed-width token windows
  *     grouped corpus-wide; a window seen in ≥2 distinct docs marks both.
  *     One shuffle on the window key (at 100 TB the key is a 128-bit
  *     hash, not the string — string form here keeps the DuckDB oracle
  *     byte-comparable), map-side partial agg collapses per-partition
  *     repeats first.
  *   - corpusMix: temperature-based sampling weights per language
  *     (multinomial p_l ∝ n_l^α, α = 0.3 — the mT5/XLM-R upsampling
  *     rule): rare languages get boosted, dominant ones damped. One tiny
  *     agg — the per-doc sampling decision it parameterizes is a narrow
  *     hash-threshold map.
  *
  * Tokenization is the shared lowercase-[a-z0-9]+ runs (Dedup.tokensCol)
  * so both engines agree byte-for-byte.
  */
object TrainingSet {

  // ---- decontamination ----

  val NGram = 13
  /** Donor snippet: tokens[SnipStart, SnipStart+SnipLen) of every 50th doc
    * play the "benchmark item" role (deterministic, oracle-replicable).
    */
  val SnipStart = 4
  val SnipLen = 21

  /** documents ∪ planted contaminated docs: each benchmark donor's snippet
    * re-appears inside an otherwise-unrelated doc (doc_id + 2000000) — the
    * ground truth the oracle re-derives.
    */
  private def contamCorpus(docs: DataFrame): (DataFrame, DataFrame) = {
    // donor-id filter BEFORE tokenization (only 1/50 docs tokenize), and
    // the tiny donor frame is checkpointed once — it feeds three
    // consumers (planted docs, the anti-join, the benchmark gram set),
    // which round 5 recomputed as three separate subtrees
    val toks = graft.functions.TokenGrams.tokenGrams(docs.sparkSession, col("text"), 1)
    val donors = Dedup.truncate(docs
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= SnipStart + SnipLen)
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), SnipStart + 1, SnipLen)).as("snippet")))
    val planted = donors.select(
      (col("doc_id") + 2000000L).as("doc_id"),
      concat(lit("completely unrelated preamble words here "),
        col("snippet"), lit(" and some trailing filler content")).as("text"))
    (donors, planted)
  }

  /** Contaminated training docs: any shared 13-gram with a benchmark
    * snippet (donors themselves excluded — they're the benchmark, not
    * the training set). Output: (doc_id, n_hits = distinct matching
    * 13-grams).
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.table(s, dir, "documents").select(col("doc_id"), col("text"))
    val (donors, planted) = contamCorpus(docs)
    val corpus = docs.unionAll(planted)
      .join(donors.select(col("doc_id")), Seq("doc_id"), "left_anti")
      // fixture-parallelism restore ONLY (the smoke documents table is one
      // parquet file → one scan partition; see Dedup.corpus). At scale the
      // input arrives as thousands of splittable files and this repartition
      // is dropped — the gram-match path itself never needs a text shuffle.
      .repartition(s.sparkContext.defaultParallelism)
    // fused native 13-gram pass on both sides (TokenGramsSpec pins
    // equality with gramsExpr∘tokensCol)
    val benchGrams = donors
      .select(explode(graft.functions.TokenGrams.tokenGrams(s, col("snippet"), NGram)).as("gram"))
      .distinct()
    corpus
      .select(col("doc_id"),
        explode(graft.functions.TokenGrams.tokenGrams(s, col("text"), NGram)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  /** n-gram string windows over a token array (empty below n tokens).
    * Pure higher-order-function expression (codegen'd, no UDF); slice is
    * 1-based, window starts 0-based.
    */
  private[graft] def gramsExpr(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  def decontaminateSql: String =
    s"""WITH base AS (
       | SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
       |donors AS (
       | SELECT doc_id,
       |  array_to_string(list_slice(toks, ${SnipStart + 1}, ${SnipStart + SnipLen}), ' ') AS snippet
       | FROM base WHERE doc_id % 50 = 0 AND len(toks) >= ${SnipStart + SnipLen}),
       |planted AS (
       | SELECT doc_id + 2000000 AS doc_id,
       |  'completely unrelated preamble words here ' || snippet ||
       |  ' and some trailing filler content' AS text
       | FROM donors),
       |corpus AS (
       | SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id, text FROM planted)
       | WHERE doc_id NOT IN (SELECT doc_id FROM donors)),
       |bench_grams AS (
       | SELECT DISTINCT array_to_string(list_slice(t.toks, g.i, g.i + ${NGram - 1}), ' ') AS gram
       | FROM (SELECT regexp_extract_all(lower(snippet), '[a-z0-9]+') AS toks FROM donors) t,
       |      LATERAL (SELECT unnest(generate_series(1, len(t.toks) - ${NGram - 1})) AS i) g
       | WHERE len(t.toks) >= $NGram),
       |corpus_grams AS (
       | SELECT c.doc_id, array_to_string(list_slice(c.toks, g.i, g.i + ${NGram - 1}), ' ') AS gram
       | FROM corpus c,
       |      LATERAL (SELECT unnest(generate_series(1, len(c.toks) - ${NGram - 1})) AS i) g
       | WHERE len(c.toks) >= $NGram)
       |SELECT cg.doc_id, CAST(count(DISTINCT cg.gram) AS BIGINT) AS n_hits
       |FROM corpus_grams cg JOIN bench_grams b ON b.gram = cg.gram
       |GROUP BY cg.doc_id ORDER BY cg.doc_id""".stripMargin

  // ---- substring-level dedup ----

  /** Window width (tokens) for span-level dedup. */
  val SpanWindow = 16

  /** The (doc_id, wkey, c) window frame, COLLAPSED to per-(key, doc)
    * occurrence counts inside the checkpoint, and cut with Dedup.truncate
    * so both consumers below (the dup-key agg and the flagging join) read
    * the materialized blocks. Round 5 checkpointed the RAW exploded
    * positions and re-collapsed them twice (once inside countDistinct,
    * once through the join) — folding the (wkey, doc_id) aggregation into
    * the checkpoint job shuffles each window string once instead of
    * twice and materializes the collapsed rows, not every position.
    */
  private def windowFrame(s: SparkSession, dir: String, keyed: Column => Column): DataFrame =
    Dedup.truncate(
      Dedup.corpus(s, dir)
        .select(col("doc_id"),
          explode(graft.functions.TokenGrams.tokenGrams(s, col("text"), SpanWindow)).as("w"))
        // second projection: a generator can't nest inside xxhash64(...)
        .select(col("doc_id"), keyed(col("w")).as("wkey"))
        .groupBy(col("wkey"), col("doc_id")).agg(count(lit(1)).as("c")))

  /** Shared tail: flag keys appearing in ≥2 distinct docs (row count per
    * key — the frame is already per-(key, doc)), then count total AND
    * duplicated window POSITIONS per doc in a single agg by summing the
    * collapsed occurrence counts (left join against the dup-key set).
    */
  private def substringDedupFrom(windows: DataFrame): DataFrame = {
    val dupKeys = windows
      .groupBy(col("wkey"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("wkey"), lit(1).as("is_dup"))
    windows
      .join(dupKeys, Seq("wkey"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_windows"),
        coalesce(sum(when(col("is_dup").isNotNull, col("c"))), lit(0L)).as("n_dup_windows"))
      .filter(col("n_dup_windows") > 0)
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        round(col("n_dup_windows").cast("double") / col("n_windows"), 3).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Docs carrying windows that appear (verbatim) in ≥2 distinct docs of
    * the dedup corpus. Output per flagged doc: total windows, duplicated
    * windows, duplicated fraction. This is the ORACLE-TRANSPARENT form —
    * the shuffle key is the window string itself, byte-comparable by
    * DuckDB; substringDedupHashed is the shape to run at scale.
    */
  def substringDedup(s: SparkSession, dir: String): DataFrame =
    substringDedupFrom(windowFrame(s, dir, identity))

  /** The scale twin: identical semantics, but the window key that
    * shuffles is xxhash64(window) — 8 bytes instead of ~100 bytes of
    * text per token position, so the dup-key shuffle is ~12× lighter
    * and independent of window width. A 64-bit collision would need two
    * DIFFERENT windows hashing equal within one corpus (P ≈ n²/2⁶⁵ —
    * ~10⁻⁷ even at 10^9 windows), and the failure mode is one
    * over-counted dup window, not a wrong pipeline. The oracle is the
    * STRING-KEYED computation (substringDedupSql): both must produce
    * identical rows, which IS the collision-freedom check.
    */
  def substringDedupHashed(s: SparkSession, dir: String): DataFrame =
    substringDedupFrom(windowFrame(s, dir, xxhash64(_)))

  def substringDedupSql: String =
    s"""WITH all_docs AS (${Dedup.corpusSql}),
       |toks AS (
       | SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM all_docs),
       |w AS (
       | SELECT t.doc_id,
       |  array_to_string(list_slice(t.toks, g.i, g.i + ${SpanWindow - 1}), ' ') AS gram
       | FROM toks t,
       |      LATERAL (SELECT unnest(generate_series(1, len(t.toks) - ${SpanWindow - 1})) AS i) g
       | WHERE len(t.toks) >= $SpanWindow),
       |dup AS (SELECT gram FROM w GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
       |per_doc AS (SELECT doc_id, count(*) AS n_windows FROM w GROUP BY doc_id),
       |hits AS (
       | SELECT w.doc_id, count(*) AS n_dup_windows
       | FROM w JOIN dup ON dup.gram = w.gram GROUP BY w.doc_id)
       |SELECT h.doc_id, CAST(p.n_windows AS BIGINT) AS n_windows,
       | CAST(h.n_dup_windows AS BIGINT) AS n_dup_windows,
       | round(h.n_dup_windows * 1.0 / p.n_windows, 3) AS dup_frac
       |FROM hits h JOIN per_doc p ON p.doc_id = h.doc_id
       |ORDER BY h.doc_id""".stripMargin

  // ---- sequence packing ----

  /** Token budget per packed training sequence. */
  val PackBudget = 256
  /** Target docs per pack group — the bucket count grows with the corpus
    * so parallelism is corpus-proportional, not a constant.
    */
  val PackGroupDocs = 4096L
  /** Bucket-count floor: keeps small/test corpora at the historical
    * 32-group layout (and a healthy minimum fanout).
    */
  val PackMinBuckets = 32L

  /** Pack-group count for an n-doc corpus: ~n/PackGroupDocs groups,
    * floored at PackMinBuckets. Derived from CORPUS SIZE only (never
    * cluster size), so the packing output is identical at any
    * parallelism — at 10^9 docs this is ~244k groups of ~4096 docs,
    * where round 4's fixed 32 groups meant 3×10^7 docs sorted inside
    * one task.
    */
  def packBucketsFor(n: Long): Long =
    math.max(PackMinBuckets, (n + PackGroupDocs - 1) / PackGroupDocs)

  /** Greedy sequence packing — the step that turns a deduped corpus into
    * fixed-length pretraining examples: docs are assigned to
    * `packBucketsFor(n)` hash groups, and WITHIN each group packed
    * greedily in doc_id order into sequences of at most `PackBudget`
    * tokens (docs longer than the budget are truncated to it; no doc
    * splits across sequences). Per-group determinism makes the packing
    * reproducible at any cluster size AND lets the DuckDB oracle replay
    * it exactly with a recursive CTE — a global greedy pack would depend
    * on partition layout.
    *
    * Shape at scale: one shuffle on the pack bucket, then a STREAMING
    * fold over each task's (bucket, doc_id)-sorted iterator — O(1) task
    * memory regardless of group size (round 4 buffered+sorted each group
    * in memory); sequences never materialize doc text, only counts.
    * Output: one row per packed sequence.
    */
  def corpusPack(s: SparkSession, dir: String): DataFrame =
    corpusPackFrom(s,
      Relational.table(s, dir, "documents")
        .select(col("doc_id"),
          least(size(graft.functions.TokenGrams.tokenGrams(s, col("text"), 1)),
            lit(PackBudget)).as("n_tok")))

  /** Packing core over a (doc_id, n_tok) frame; `bucketsOverride` exists
    * for the determinism spec (same output at any partitioning / any
    * parallelism for a fixed bucket count).
    */
  def corpusPackFrom(s: SparkSession, toks: DataFrame,
      bucketsOverride: Option[Long] = None): DataFrame = {
    import s.implicits._
    val buckets = bucketsOverride.getOrElse(packBucketsFor(toks.count()))
    // shuffle partition count: capped fanout at test scale, grows with
    // the cluster; several buckets may share a partition — the fold below
    // resets at each bucket boundary, so the grouping is correctness-
    // neutral (output depends only on the per-bucket doc_id order)
    val parts = math.max(1L, math.min(buckets,
      s.sparkContext.defaultParallelism.toLong * 4)).toInt
    toks
      .select(pmod(col("doc_id"), lit(buckets)).as("bucket"),
        col("doc_id"), col("n_tok"))
      .repartition(parts, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // streaming greedy fold: emit a row per closed sequence, close on
        // bucket change and at end-of-partition; never buffers a group
        var started = false
        var bkt = 0L
        var seq = 0L
        var fill = 0L
        var nDocs = 0L
        def closed: (Long, Long, Long, Long) = (bkt, seq, nDocs, fill)
        val body = it.flatMap { case (bucket, _, tok) =>
          val out =
            if (!started) { started = true; bkt = bucket; Iterator.empty }
            else if (bucket != bkt) {
              val r = if (nDocs > 0) Iterator.single(closed) else Iterator.empty
              bkt = bucket; seq = 0L; fill = 0L; nDocs = 0L
              r
            } else if (nDocs > 0 && fill + tok > PackBudget) {
              val r = Iterator.single(closed)
              seq += 1; fill = 0L; nDocs = 0L
              r
            } else Iterator.empty
          fill += tok; nDocs += 1
          out
        }
        // ++ is by-name: the flush tuple reads the fold state only after
        // `body` is exhausted
        body ++ (if (started && nDocs > 0) Iterator.single(closed) else Iterator.empty)
      }
      .toDF("bucket", "seq_no", "n_docs", "n_tokens")
      .withColumn("fill_frac", round(col("n_tokens") / lit(PackBudget.toDouble), 3))
      .orderBy(col("bucket"), col("seq_no"))
  }

  /** DuckDB replay: linear recursion over row_number per bucket with a
    * capacity-reset fold — the same greedy rule (bucket count re-derived
    * from the same corpus-size formula), then sequences re-aggregated
    * from the per-doc assignment.
    */
  def corpusPackSql: String =
    s"""WITH nb AS (
       | SELECT greatest($PackMinBuckets,
       |   CAST(ceil(count(*) / ${PackGroupDocs}.0) AS BIGINT)) AS b FROM documents),
       |toks AS (
       | SELECT doc_id, doc_id % (SELECT b FROM nb) AS bucket,
       |  least(len(regexp_extract_all(lower(text), '[a-z0-9]+')), $PackBudget) AS n_tok
       | FROM documents),
       |ordered AS (
       | SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
       | FROM toks),
       |rec AS (
       | WITH RECURSIVE walk(bucket, rn, seq_no, fill, n_tok) AS (
       |   SELECT bucket, rn, 0::BIGINT, n_tok::BIGINT, n_tok FROM ordered WHERE rn = 1
       |   UNION ALL
       |   SELECT o.bucket, o.rn,
       |    CASE WHEN w.fill + o.n_tok > $PackBudget THEN w.seq_no + 1 ELSE w.seq_no END,
       |    CASE WHEN w.fill + o.n_tok > $PackBudget THEN o.n_tok::BIGINT
       |         ELSE w.fill + o.n_tok END,
       |    o.n_tok
       |   FROM walk w JOIN ordered o ON o.bucket = w.bucket AND o.rn = w.rn + 1
       | )
       | SELECT * FROM walk)
       |SELECT CAST(bucket AS BIGINT) AS bucket, seq_no,
       | CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       | round(sum(n_tok) / ${PackBudget.toDouble}, 3) AS fill_frac
       |FROM rec GROUP BY bucket, seq_no ORDER BY bucket, seq_no""".stripMargin

  // ---- temperature-based corpus mixing ----

  /** Sampling temperature (mT5/XLM-R-style α). */
  val MixAlpha = 0.3

  /** Per-language multinomial sampling weights p_l ∝ n_l^α: rare
    * languages upsampled, dominant ones damped.
    */
  def corpusMix(s: SparkSession, dir: String): DataFrame = {
    val counts = Relational.table(s, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum(col("n_docs")).as("tot"),
      sum(pow(col("n_docs").cast("double"), lit(MixAlpha))).as("ptot"))
    counts.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        round(col("n_docs").cast("double") / col("tot"), 4).as("natural_frac"),
        round(pow(col("n_docs").cast("double"), lit(MixAlpha)) / col("ptot"), 4).as("mix_frac"),
        round(pow(col("n_docs").cast("double"), lit(MixAlpha)) / col("ptot") /
          (col("n_docs").cast("double") / col("tot")), 3).as("boost"))
      .orderBy(col("lang"))
  }

  def corpusMixSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       |t AS (SELECT sum(n_docs) AS tot, sum(pow(n_docs, $MixAlpha)) AS ptot FROM c)
       |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       | round(n_docs / tot, 4) AS natural_frac,
       | round(pow(n_docs, $MixAlpha) / ptot, 4) AS mix_frac,
       | round(pow(n_docs, $MixAlpha) / ptot / (n_docs / tot), 3) AS boost
       |FROM c, t ORDER BY lang""".stripMargin

  /** Deterministic temperature RESAMPLING — materializes the mix that
    * corpusMix only plans. Each document's language boost becomes a
    * repeat factor: floor(boost) guaranteed copies plus one extra copy
    * iff a Knuth multiplicative hash of doc_id lands under the boost's
    * fractional part (boost < 1 → probabilistic downsampling of the
    * dominant language; boost > 1 → epoch expansion of rare ones — the
    * mT5/XLM-R upsampling recipe, derandomized). NOT random by design:
    * reruns, resumes, and incremental appends must duplicate/drop
    * exactly the same documents (the corpusSplit stability argument).
    *
    * All threshold arithmetic is INTEGER on the 3-decimal-rounded boost
    * (fm = round(boost·1000)) so both engines decide every doc
    * identically — comparing raw double thresholds cross-engine would
    * hinge on pow() ULPs. The hash prime (999983) differs from
    * corpusSplit's (1000003) so sampling never correlates with split
    * membership. Scale shape: one broadcast of the per-lang mix + one
    * narrow projection + one agg; doc text never moves (a materializing
    * variant is a narrow flatMap emitting `copies` rows per doc).
    */
  def corpusMixSample(s: SparkSession, dir: String): DataFrame = {
    val mix = corpusMix(s, dir).select(col("lang"), col("boost"))
    val perLang = Relational.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .join(broadcast(mix), Seq("lang"))
      .withColumn("fm", round(col("boost") * 1000).cast("long"))
      .withColumn("h", ((col("doc_id") % 999983L) * lit(2654435761L)) % 1000L)
      .withColumn("copies",
        expr("fm div 1000") +
          when(col("h") < pmod(col("fm"), lit(1000L)), 1L).otherwise(0L))
      .groupBy(col("lang"), col("boost"))
      .agg(count(lit(1)).as("n_docs"), sum(col("copies")).as("n_sampled"))
    val tot = perLang.agg(sum(col("n_sampled")).as("tot_sampled"))
    perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("boost"), col("n_sampled"),
        round(col("n_sampled").cast("double") / col("n_docs"), 3).as("realized_boost"),
        round(col("n_sampled").cast("double") / col("tot_sampled"), 4).as("realized_frac"))
      .orderBy(col("lang"))
  }

  def corpusMixSampleSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       |t AS (SELECT sum(n_docs) AS tot, sum(pow(n_docs, $MixAlpha)) AS ptot FROM c),
       |mix AS (SELECT lang,
       |  round(pow(n_docs, $MixAlpha) / ptot / (n_docs / tot), 3) AS boost FROM c, t),
       |d AS (
       | SELECT doc.lang, m.boost,
       |  CAST(round(m.boost * 1000) AS BIGINT) AS fm,
       |  ((doc.doc_id % 999983) * 2654435761) % 1000 AS h
       | FROM documents doc JOIN mix m USING (lang)),
       |s AS (
       | SELECT lang, boost, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(fm // 1000 + CASE WHEN h < fm % 1000 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_sampled
       | FROM d GROUP BY lang, boost),
       |tt AS (SELECT CAST(sum(n_sampled) AS BIGINT) AS tot_sampled FROM s)
       |SELECT lang, n_docs, boost, n_sampled,
       | round(CAST(n_sampled AS DOUBLE) / n_docs, 3) AS realized_boost,
       | round(CAST(n_sampled AS DOUBLE) / tot_sampled, 4) AS realized_frac
       |FROM s, tt ORDER BY lang""".stripMargin
}
