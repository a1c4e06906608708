package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup — the crawl-side twin of content dedup:
  * the same page reached via fragment links, tracking query params, an
  * explicit default port, a trailing slash, or scheme/host case variants
  * must collapse to one canonical key before fetch scheduling and before
  * content dedup ever runs.
  *
  * Canonical form: lowercase scheme and host, the scheme's OWN default
  * port stripped (:80 for http, :443 for https — http://host:443/x is a
  * genuinely non-default port and stays distinct), query string and
  * fragment dropped, trailing slashes
  * trimmed. All pieces are regexp_extract/regexp_replace WITHOUT
  * replacement backrefs, so java.util.regex and DuckDB's RE2 compute the
  * identical canonical string.
  *
  * Scale: canonicalization is a narrow codegen'd projection; the dedup
  * group-by is one shuffle keyed by canonical URL (the same shape as
  * exact content dedup).
  */
object UrlDedup {

  /** Canonical key of a URL (see object doc for the rules). */
  def canonicalCol(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val rawHost = lower(regexp_extract(u, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
      .otherwise(rawHost)
    val path = regexp_replace(
      regexp_extract(u, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    concat(scheme, lit("://"), host, path)
  }

  /** Deterministic variant corpus over the extracted table's URLs: every
    * completed URL re-appears once mutated by a length-keyed rule
    * (fragment / utm query / trailing slash / explicit :443) — ground
    * truth the DuckDB oracle re-derives, so each canonical group must
    * have exactly the original + its variant.
    */
  def variants(extracted: DataFrame): DataFrame = {
    val urls = extracted.filter(col("status") === "completed").select(col("url"))
    urls.unionAll(urls.select(
      when(length(col("url")) % 4 === 0, concat(col("url"), lit("#ref")))
        .when(length(col("url")) % 4 === 1,
          concat(col("url"), lit("?utm_source=feed&utm_medium=rss")))
        .when(length(col("url")) % 4 === 2, concat(col("url"), lit("/")))
        .otherwise(regexp_replace(col("url"), "^https://([^/]+)", "https://$1:443"))
        .as("url")))
  }

  /** Canonical-URL dedup groups over the variant corpus. */
  def urlDedup(extracted: DataFrame): DataFrame =
    variants(extracted)
      .groupBy(canonicalCol(col("url")).as("canonical_url"))
      .agg(count(lit(1)).as("n_variants"), min(col("url")).as("first_url"))
      .orderBy(col("canonical_url"))

  /** DuckDB recompute (rp = read_parquet of the materialized extracted
    * table). RE2 replacement backrefs use \\1 where java uses $1 — the
    * only engine-syntax divergence; results are identical.
    */
  def urlDedupSql(rp: String): String =
    s"""WITH urls AS (SELECT url FROM $rp WHERE status = 'completed'),
       |var AS (
       | SELECT url FROM urls
       | UNION ALL
       | SELECT CASE
       |  WHEN length(url) % 4 = 0 THEN url || '#ref'
       |  WHEN length(url) % 4 = 1 THEN url || '?utm_source=feed&utm_medium=rss'
       |  WHEN length(url) % 4 = 2 THEN url || '/'
       |  ELSE regexp_replace(url, '^https://([^/]+)', 'https://\\1:443')
       | END AS url FROM urls),
       |parts AS (
       | SELECT url,
       |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
       |  lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS rawhost,
       |  regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/+$$', '') AS path
       | FROM var),
       |canon AS (
       | SELECT url,
       |  scheme || '://' ||
       |  CASE WHEN scheme = 'http'  THEN regexp_replace(rawhost, ':80$$', '')
       |       WHEN scheme = 'https' THEN regexp_replace(rawhost, ':443$$', '')
       |       ELSE rawhost END || path
       |  AS canonical_url
       | FROM parts)
       |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_variants, min(url) AS first_url
       |FROM canon GROUP BY 1 ORDER BY canonical_url""".stripMargin
}
