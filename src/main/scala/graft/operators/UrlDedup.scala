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

  // ------------------------------------------------------------------
  // robots.txt policy filter (crawl hygiene)
  // ------------------------------------------------------------------

  /** Deterministic per-host robots.txt TEXT — a real file body (comment
    * lines, User-agent header, Disallow rules, one host-conditional
    * rule) both engines derive from the host name alone, so the PARSE
    * step is genuinely cross-checked, not just the policy application.
    */
  def robotsTxtCol(host: Column): Column =
    concat(
      lit("# synthetic robots fixture\nUser-agent: *\nDisallow: /src1\nDisallow: /contact\n"),
      when(length(host) % 2 === 0, lit("Disallow: /src3/\n")).otherwise(lit("")),
      lit("Crawl-delay: 1\n"))

  /** Robots policy over the corpus URLs: parse each host's robots.txt
    * (split lines, keep `Disallow: ` rules), then block any URL whose
    * path starts with a disallowed prefix — the classic prefix
    * semantics. Per host: rule count, URL count, blocked, allowed.
    *
    * Scale shape: the rules frame is one row per (host, rule) —
    * dimension-sized, broadcast into the block check; URLs never
    * shuffle for the policy join, only for the final per-host agg
    * (which partial-aggregates).
    */
  def robotsFilter(extracted: DataFrame): DataFrame = {
    val urls = extracted.filter(col("status") === "completed")
      .select(col("url"),
        regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]+)", 1).as("host"),
        regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1).as("path"))
    val rules = urls.select(col("host")).distinct()
      .select(col("host"), explode(split(robotsTxtCol(col("host")), "\n")).as("line"))
      .filter(col("line").startsWith("Disallow: "))
      .select(col("host"), expr("substring(line, 11)").as("prefix"))
      .filter(length(col("prefix")) > 0)
    // one dimension-sized broadcast row per host (rule count + prefix
    // list), one pass over the URLs, one final agg. Round 5 ran three
    // separate aggregations over urls (n_urls, n_blocked via a semi
    // join, n_rules) plus two joins and checkpointed two intermediates;
    // the per-URL block decision is the same prefix semantics, applied
    // with `exists` over the broadcast prefix list.
    val hostRules = rules.groupBy(col("host"))
      .agg(count(lit(1)).as("n_rules"), collect_list(col("prefix")).as("prefixes"))
    urls.join(broadcast(hostRules), Seq("host"))
      .select(col("host"), col("n_rules"),
        exists(col("prefixes"), p => col("path").startsWith(p)).as("blocked"))
      .groupBy(col("host"), col("n_rules"))
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"))
      .select(col("host"), col("n_rules"), col("n_urls"), col("n_blocked"),
        (col("n_urls") - col("n_blocked")).as("n_allowed"))
      .orderBy(col("host"))
  }

  /** DuckDB recompute: same robots text derived per host, same line
    * parse, same prefix semantics via starts_with.
    */
  def robotsFilterSql(rp: String): String =
    s"""WITH urls AS (
       | SELECT url,
       |  regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1) AS host,
       |  regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path
       | FROM $rp WHERE status = 'completed'),
       |robots AS (
       | SELECT DISTINCT host,
       |  '# synthetic robots fixture' || chr(10) || 'User-agent: *' || chr(10) ||
       |  'Disallow: /src1' || chr(10) || 'Disallow: /contact' || chr(10) ||
       |  CASE WHEN length(host) % 2 = 0 THEN 'Disallow: /src3/' || chr(10) ELSE '' END ||
       |  'Crawl-delay: 1' || chr(10) AS txt
       | FROM urls),
       |rules AS (
       | SELECT host, substring(line, 11) AS prefix FROM (
       |  SELECT host, unnest(string_split(txt, chr(10))) AS line FROM robots)
       | WHERE starts_with(line, 'Disallow: ') AND length(substring(line, 11)) > 0),
       |blocked AS (
       | SELECT u.host, count(*) AS n_blocked FROM urls u
       | WHERE EXISTS (SELECT 1 FROM rules r
       |   WHERE r.host = u.host AND starts_with(u.path, r.prefix))
       | GROUP BY u.host),
       |rc AS (SELECT host, CAST(count(*) AS BIGINT) AS n_rules FROM rules GROUP BY host),
       |uc AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls FROM urls GROUP BY host)
       |SELECT uc.host, rc.n_rules, uc.n_urls,
       | CAST(coalesce(b.n_blocked, 0) AS BIGINT) AS n_blocked,
       | CAST(uc.n_urls - coalesce(b.n_blocked, 0) AS BIGINT) AS n_allowed
       |FROM uc JOIN rc USING (host) LEFT JOIN blocked b ON b.host = uc.host
       |ORDER BY host""".stripMargin
}
