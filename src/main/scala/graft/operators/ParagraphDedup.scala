package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paragraph-level deduplication over the *extracted* corpus — the
  * CCNet/RefinedWeb boilerplate-scrub stage that sits between extraction
  * and document-level dedup in a training-data pipeline. Document-level
  * dedup (graft.operators.Dedup) removes whole near-copies; this stage
  * removes the paragraphs that repeat ACROSS documents (navigation
  * chrome, shared headers/footers, the merge summary blocks) while
  * keeping each document's unique prose.
  *
  * Scale shape (the 100 TB argument):
  *   1. Paragraph doc-frequency is ONE shuffle whose keys are distinct
  *      (url, paragraph) pairs — partial aggregation collapses
  *      within-partition repeats map-side, so high-frequency boilerplate
  *      contributes one record per map partition, not one per occurrence.
  *   2. The drop set is bounded by construction (`MaxBoilerplate`, taken
  *      by descending doc-frequency with a total-order tiebreak), so the
  *      driver collect is O(cap) no matter the corpus size.
  *   3. The scrub itself is a NARROW typed map over the broadcast drop
  *      set — documents are never exploded-and-regrouped, so no second
  *      shuffle touches the full text payload.
  *
  * The paragraph separator is the extraction kernel's own block join
  * ("\n\n", MergeSpec) — split and re-join round-trip byte-identically,
  * which the spec pins.
  */
object ParagraphDedup {

  /** Paragraph separator: the kernel's block join (MergeSpec). */
  val Sep = "\n\n"

  /** A paragraph is boilerplate when it appears in at least this many
    * distinct documents.
    */
  val MinDf = 3

  /** Driver-safety bound on the broadcast drop set. At web scale the
    * true boilerplate set is small (high-frequency chrome); capping by
    * descending doc-frequency keeps the worst offenders and degrades
    * gracefully if a corpus somehow has millions of df>=3 paragraphs.
    */
  val MaxBoilerplate = 4096

  /** Cap overflow, the no-silent-caps rule (Dedup.DropCounter's role for
    * the LSH bucket caps): qualifying paragraphs (df >= MinDf) that did
    * NOT fit in the capped drop set on the most recent scrub run in this
    * driver JVM; -1 = no run yet. The count rides an observe() on the
    * qualifying frame, so the drop-set collect itself is the action — no
    * extra job.
    */
  val ScrubOverflow = new java.util.concurrent.atomic.AtomicLong(-1L)

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  final case class ScrubbedDoc(url: String, n_paras: Int, n_dropped: Int, clean_text: String)

  /** Completed documents with their paragraph arrays (split once). */
  private def docs(extracted: DataFrame): DataFrame =
    extracted.filter(col("status") === "completed")
      .select(col("url"), split(col("text"), Sep, -1).as("sp"))

  /** Cross-document paragraph frequency table (df >= 2): the
    * observability face of the stage — what IS the repeated boilerplate,
    * how many docs carry it, how many total occurrences. Two-level agg so
    * both shuffles enjoy partial aggregation; the second is keyed by
    * already-collapsed (paragraph, url) rows.
    */
  def paragraphStats(extracted: DataFrame): DataFrame =
    docs(extracted)
      .select(col("url"), explode(col("sp")).as("para"))
      .groupBy(col("para"), col("url")).agg(count(lit(1)).as("occ"))
      .groupBy(col("para"))
      .agg(count(lit(1)).as("df"), sum(col("occ")).as("n_occurrences"))
      .filter(col("df") >= 2)
      .select(col("para"), col("df"), col("n_occurrences"),
        length(col("para")).as("n_chars"))
      .orderBy(col("df").desc, col("para"))

  /** All qualifying paragraphs (df >= MinDf), uncapped. */
  private def qualifying(extracted: DataFrame): DataFrame =
    docs(extracted)
      .select(col("url"), explode(col("sp")).as("para"))
      .distinct()
      .groupBy(col("para")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= MinDf)

  /** The capped drop set: paragraphs in >= MinDf distinct documents,
    * worst offenders first, deterministic total order at the cap edge.
    */
  def boilerplate(extracted: DataFrame): DataFrame =
    qualifying(extracted)
      .orderBy(col("df").desc, col("para"))
      .limit(MaxBoilerplate)

  /** Scrub: remove every occurrence of a boilerplate paragraph from every
    * document, preserving the order of what remains. The drop set is a
    * driver-side broadcast (bounded by the cap) and the scrub is a narrow
    * typed map — the full text payload never shuffles. Qualifying
    * paragraphs beyond the cap are COUNTED (ScrubOverflow) and warned,
    * never silently truncated; `maxBoilerplate` is overridable so the
    * overflow spec can plant past a small cap.
    */
  def paragraphScrubFrom(s: SparkSession, extracted: DataFrame,
      maxBoilerplate: Int = MaxBoilerplate): DataFrame = {
    import s.implicits._
    // observe rides the qualifying frame feeding the top-k sort: the sort
    // scans every qualifying row even under the limit, so the metric is
    // complete when the collect below finishes
    val obs = org.apache.spark.sql.Observation()
    val dropSet = qualifying(extracted)
      .observe(obs, coalesce(count(lit(1)), lit(0L)).as("n_qualifying"))
      .orderBy(col("df").desc, col("para"))
      .limit(maxBoilerplate)
      .select(col("para")).collect().map(_.getString(0)).toSet
    val overflow = math.max(0L,
      obs.get("n_qualifying").asInstanceOf[Long] - dropSet.size)
    ScrubOverflow.set(overflow)
    if (overflow > 0)
      log.warn(s"[para_scrub] boilerplate cap dropped $overflow qualifying " +
        s"paragraphs beyond the $maxBoilerplate worst (df-descending) offenders")
    val bc = s.sparkContext.broadcast(dropSet)
    docs(extracted)
      .select(col("url"), col("sp"))
      .as[(String, Seq[String])]
      .map { case (url, sp) =>
        val drop = bc.value
        val kept = sp.filterNot(drop.contains)
        ScrubbedDoc(url, sp.length, sp.length - kept.length, kept.mkString(Sep))
      }
      .toDF()
      .orderBy(col("url"))
  }
}
