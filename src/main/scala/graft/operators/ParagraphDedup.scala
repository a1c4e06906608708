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

  /** The capped drop set: paragraphs in >= MinDf distinct documents,
    * worst offenders first, deterministic total order at the cap edge.
    */
  def boilerplate(extracted: DataFrame): DataFrame =
    docs(extracted)
      .select(col("url"), explode(col("sp")).as("para"))
      .distinct()
      .groupBy(col("para")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= MinDf)
      .orderBy(col("df").desc, col("para"))
      .limit(MaxBoilerplate)

  /** Scrub: remove every occurrence of a boilerplate paragraph from every
    * document, preserving the order of what remains. The drop set is a
    * driver-side broadcast (bounded by MaxBoilerplate) and the scrub is a
    * narrow typed map — the full text payload never shuffles.
    */
  def paragraphScrubFrom(s: SparkSession, extracted: DataFrame): DataFrame = {
    import s.implicits._
    val dropSet = boilerplate(extracted)
      .select(col("para")).collect().map(_.getString(0)).toSet
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
