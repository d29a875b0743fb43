package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** URL curation — the web-corpus stages that run before any text ever
  * reaches dedup/quality: canonicalize crawl URLs so per-page identity
  * is stable, and aggregate per-registrable-domain token shares (the
  * relation domain-level mixing / blocklists / crawl budgets key on).
  *
  * The corpus has no URL column, so each document's URL derives
  * deterministically from its (doc_id, source, lang) — mixed-case
  * scheme and host, www/m subdomains, a default :443 port, doubled
  * path slashes, trailing slashes, utm_* tracking params, and a
  * fragment — every mess the normalizer must fix, constructed
  * identically in both engines so the ORACLE checks the normalizer,
  * not the generator.
  *
  * Normalization (RFC 3986 §6 syntax-based, plus the conventional
  * tracking-param strip): lowercase scheme+host, drop the scheme's
  * default port, strip a leading `www.`, collapse `//+` in the path,
  * drop the trailing slash (non-root), drop utm_* query params
  * PRESERVING the order of the rest, drop the fragment. Registrable
  * domain = last two host labels (the public-suffix-list lookup
  * collapsed to the corpus's single-label TLDs).
  *
  * Scale shape: both entries are embarrassingly parallel string
  * projections — zero shuffles for the normalizer (scan → project →
  * sort for the deterministic dump only), one aggregation keyed by
  * domain (≈100 groups here, bounded by distinct sites in production)
  * for the stats. Nothing here would notice a 1000-executor 100 TB
  * crawl beyond the scan itself. */
object UrlCuration {

  def all: Seq[QueryDef] = Seq(urlNormalize, urlDomainStats, urlDomainManifest)

  /** The deterministic messy-URL column (Spark side). */
  private def rawUrl: Column = {
    val scheme = when(col("doc_id") % 2 === 0, lit("HTTPS"))
      .otherwise(lit("https"))
    val sub = when(col("doc_id") % 3 === 0, lit("WWW."))
      .when(col("doc_id") % 3 === 1, lit("m."))
      .otherwise(lit(""))
    val srcCased = when(col("doc_id") % 7 === 0, upper(col("source")))
      .otherwise(col("source"))
    val tld = when(col("lang") === "en", lit("com"))
      .when(col("lang") === "de", lit("de"))
      .when(col("lang") === "fr", lit("fr"))
      .when(col("lang") === "es", lit("es"))
      .when(col("lang") === "zh", lit("cn"))
      .otherwise(lit("org"))
    val port = when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit(""))
    val path = concat(lit("/docs"),
      when(col("doc_id") % 2 === 0, lit("//")).otherwise(lit("/")),
      col("doc_id").cast("string"),
      when(col("doc_id") % 6 === 0, lit("/")).otherwise(lit("")))
    val query = when(col("doc_id") % 5 === 0, lit(""))
      .when(col("doc_id") % 2 === 0,
        concat(lit("utm_source=feed&page="), (col("doc_id") % 7).cast("string"),
          lit("&utm_medium=x")))
      .otherwise(concat(lit("page="), (col("doc_id") % 7).cast("string")))
    val frag = when(col("doc_id") % 3 === 1, lit("#sec2")).otherwise(lit(""))
    concat(scheme, lit("://"), sub, srcCased, lit("."), tld, port, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)), frag)
  }

  /** The shared SQL spelling of the same column (DuckDB oracle side). */
  private val rawUrlSql = """
      (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
      (CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
            WHEN doc_id % 3 = 1 THEN 'm.' ELSE '' END) ||
      (CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END) || '.' ||
      (CASE lang WHEN 'en' THEN 'com' WHEN 'de' THEN 'de' WHEN 'fr' THEN 'fr'
                 WHEN 'es' THEN 'es' WHEN 'zh' THEN 'cn' ELSE 'org' END) ||
      (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
      '/docs' || (CASE WHEN doc_id % 2 = 0 THEN '//' ELSE '/' END) ||
      CAST(doc_id AS VARCHAR) ||
      (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
      (CASE WHEN doc_id % 5 = 0 THEN ''
            WHEN doc_id % 2 = 0 THEN '?utm_source=feed&page=' ||
              CAST(doc_id % 7 AS VARCHAR) || '&utm_medium=x'
            ELSE '?page=' || CAST(doc_id % 7 AS VARCHAR) END) ||
      (CASE WHEN doc_id % 3 = 1 THEN '#sec2' ELSE '' END)"""

  /** Normalized pieces from a `url` column (Spark side): returns
    * (scheme, host-no-port-no-www, normalized path, filtered query,
    * registrable domain). */
  private def normCols(url: Column)
      : (Column, Column, Column, Column, Column) = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hostPort = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val hostNoPort = regexp_replace(hostPort, ":[0-9]+$", "")
    val hostPortKept = when(
      scheme === "https" && hostPort.endsWith(":443"), hostNoPort)
      .when(scheme === "http" && hostPort.endsWith(":80"), hostNoPort)
      .otherwise(hostPort)
    val host = regexp_replace(hostPortKept, "^www\\.", "")
    val rawPath = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val collapsed = regexp_replace(
      when(rawPath === "", lit("/")).otherwise(rawPath), "/{2,}", "/")
    val path = when(collapsed.endsWith("/") && length(collapsed) > 1,
      collapsed.substr(lit(1), length(collapsed) - 1))
      .otherwise(collapsed)
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val q2 = array_join(
      filter(split(q, "&"), x => !x.startsWith("utm_")), "&")
    val labels = split(regexp_replace(host, ":[0-9]+$", ""), "\\.")
    val domain = array_join(slice(labels, -2, 2), ".")
    (scheme, host, path, q2, domain)
  }

  /** Canonical URL per document plus its registrable domain — the
    * identity key a crawl dedup / revisit policy uses. Pure per-row
    * string work; the ORDER BY exists only for the verifiable dump. */
  val urlNormalize = QueryDef("url_normalize",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"))
        .withColumn("url", rawUrl)
      val (scheme, host, path, q2, domain) = normCols(col("url"))
      docs
        .withColumn("url_norm", concat(scheme, lit("://"), host, path,
          when(q2 === "", lit("")).otherwise(concat(lit("?"), q2))))
        .withColumn("domain", domain)
        .select(col("doc_id"), col("url"), col("url_norm"), col("domain"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH raw AS (SELECT doc_id, ($rawUrlSql) AS url FROM documents),
      parts AS (SELECT doc_id, url,
          lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
          lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport,
          regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS rawpath,
          regexp_extract(url, '\\?([^#]*)', 1) AS q
        FROM raw),
      np AS (SELECT doc_id, url, scheme,
          regexp_replace(
            CASE WHEN (scheme = 'https' AND hostport LIKE '%:443')
                   OR (scheme = 'http' AND hostport LIKE '%:80')
                 THEN regexp_replace(hostport, ':[0-9]+$$', '', 'g')
                 ELSE hostport END,
            '^www\\.', '', 'g') AS host,
          regexp_replace(CASE WHEN rawpath = '' THEN '/' ELSE rawpath END,
            '/{2,}', '/', 'g') AS cpath,
          array_to_string(list_filter(string_split(q, '&'),
            x -> NOT starts_with(x, 'utm_')), '&') AS q2
        FROM parts),
      norm AS (SELECT doc_id, url,
          scheme || '://' || host ||
          (CASE WHEN cpath LIKE '%/' AND length(cpath) > 1
                THEN substring(cpath, 1, length(cpath) - 1)
                ELSE cpath END) ||
          (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END) AS url_norm,
          string_split(regexp_replace(host, ':[0-9]+$$', '', 'g'), '.') AS ls
        FROM np)
      SELECT doc_id, url, url_norm,
        ls[len(ls) - 1] || '.' || ls[len(ls)] AS domain
      FROM norm ORDER BY doc_id"""))

  /** Per-registrable-domain corpus shares, temperature-weighted exactly
    * like [[Mixture.temperatureMix]] (α = 0.5, weight relative to the
    * largest domain) — the domain-keyed twin that feeds a mix manifest
    * when the sampling unit is a site rather than a source label. Exact
    * integer sums; one IEEE sqrt + division per output column. */
  val urlDomainStats = QueryDef("url_domain_stats",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .withColumn("url", rawUrl)
      val (_, _, _, _, domain) = normCols(col("url"))
      val byDom = docs.withColumn("domain", domain)
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      val tot = byDom.agg(
        sum(col("chars")).as("total"), max(col("chars")).as("mx"))
      byDom.crossJoin(broadcast(tot))
        .select(col("domain"), col("n_docs"), col("chars"),
          (col("chars").cast("double") / col("total").cast("double"))
            .as("p_uniform"),
          (sqrt(col("chars").cast("double")) / sqrt(col("mx").cast("double")))
            .as("w_temp"))
        .orderBy(col("domain"))
    },
    Some(s"""WITH raw AS (SELECT doc_id, n_chars, ($rawUrlSql) AS url
          FROM documents),
      parts AS (SELECT doc_id, n_chars,
          lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
          lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport
        FROM raw),
      hosts AS (SELECT doc_id, n_chars,
          string_split(regexp_replace(
            regexp_replace(
              CASE WHEN (scheme = 'https' AND hostport LIKE '%:443')
                     OR (scheme = 'http' AND hostport LIKE '%:80')
                   THEN regexp_replace(hostport, ':[0-9]+$$', '', 'g')
                   ELSE hostport END,
              '^www\\.', '', 'g'),
            ':[0-9]+$$', '', 'g'), '.') AS ls
        FROM parts),
      by_dom AS (SELECT ls[len(ls) - 1] || '.' || ls[len(ls)] AS domain,
          COUNT(*) AS n_docs, SUM(n_chars) AS chars
        FROM hosts GROUP BY 1),
      tot AS (SELECT SUM(chars) AS total, MAX(chars) AS mx FROM by_dom)
      SELECT domain, n_docs, CAST(chars AS BIGINT) AS chars,
        CAST(chars AS DOUBLE) / CAST(total AS DOUBLE) AS p_uniform,
        sqrt(CAST(chars AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE)) AS w_temp
      FROM by_dom CROSS JOIN tot ORDER BY domain"""))

  /** The DOMAIN-keyed train manifest — [[urlDomainStats]]' registrable
    * domains joined into the `pipeline_mix_manifest` machinery as the
    * sampling unit (the crawl-budget view: a SITE is the thing you cap,
    * not a source label): per-domain temperature budget
    * ⌊0.6·√tok_d·√max_tok⌋ (the `mix_temperature` α = 0.5 allocation —
    * caps the largest domain at 60% of its supply, lets low-resource
    * domains keep nearly everything), filled in the manifest's
    * deterministic length-weighted priority order (the
    * Efraimidis–Spirakis key with the portable rolling hash as the
    * draw) via a per-domain running token sum.
    *
    * Numeric discipline is mixManifest's: budgets are ⌊0.6·√a·√b⌋ of
    * exact integers (fixed IEEE tree), the priority is pure integer
    * arithmetic, the fill is an exact BIGINT cumsum — no
    * order-dependent float summation anywhere. The near-dup split is
    * deliberately NOT re-composed here (it is mixManifest's own
    * proven stage); this entry isolates the domain dimension.
    *
    * Scale: per-row URL parse → one domain-keyed aggregate (site-
    * bounded) → broadcast 1-row max → one window per domain partition.
    * The manifest shape a domain-capped 100 TB recipe emits unchanged. */
  val urlDomainManifest = QueryDef("url_domain_manifest",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"),
          col("n_chars"), col("text"))
        .withColumn("url", rawUrl)
      val (_, _, _, _, domain) = normCols(col("url"))
      val pool = docs.withColumn("domain", domain)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("pr", expr(
          "((roll_hash(cast(doc_id as string)) % 2000) * 2000) " +
            "div least(n_chars, cast(2000 as bigint))"))
        .select(col("doc_id"), col("domain"), col("n_tokens"), col("pr"))
      val byDom = pool.groupBy(col("domain"))
        .agg(sum(col("n_tokens")).as("tok"))
      val mx = byDom.agg(max(col("tok")).as("mx"))
      val budgets = byDom.crossJoin(broadcast(mx))
        .select(col("domain"),
          floor(lit(0.6) * sqrt(col("tok").cast("double")) *
            sqrt(col("mx").cast("double"))).as("budget_tokens"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain")).orderBy(col("pr"), col("doc_id"))
      pool
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .join(budgets, "domain")
        .filter(col("cum_tokens") <= col("budget_tokens"))
        .select(col("domain"), col("doc_id"), col("n_tokens"),
          col("cum_tokens"), col("budget_tokens"))
        .orderBy(col("domain"), col("cum_tokens"))
    },
    Some(s"""WITH raw AS (SELECT doc_id, n_chars, text, ($rawUrlSql) AS url
          FROM documents),
      parts AS (SELECT doc_id, n_chars, text,
          lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
          lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport
        FROM raw),
      hosts AS (SELECT doc_id, n_chars, text,
          string_split(regexp_replace(regexp_replace(
            CASE WHEN (scheme = 'https' AND hostport LIKE '%:443')
                   OR (scheme = 'http' AND hostport LIKE '%:80')
                 THEN regexp_replace(hostport, ':[0-9]+$$', '', 'g')
                 ELSE hostport END,
            '^www\\.', '', 'g'), ':[0-9]+$$', '', 'g'), '.') AS ls
        FROM parts),
      pool AS (SELECT doc_id,
          ls[len(ls) - 1] || '.' || ls[len(ls)] AS domain,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          ((list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                c -> CAST(unicode(c) AS BIGINT))),
              (h,c) -> (h*31+c) % 1000000007) % 2000) * 2000)
            // least(n_chars, 2000) AS pr
        FROM hosts),
      by_dom AS (SELECT domain, SUM(n_tokens) AS tok FROM pool GROUP BY 1),
      mx AS (SELECT MAX(tok) AS mx FROM by_dom),
      budgets AS (SELECT domain,
          CAST(floor(0.6 * sqrt(CAST(tok AS DOUBLE)) *
            sqrt(CAST(mx AS DOUBLE))) AS BIGINT) AS budget_tokens
        FROM by_dom CROSS JOIN mx),
      fill AS (SELECT domain, doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY domain
            ORDER BY pr, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tokens
        FROM pool)
      SELECT f.domain, f.doc_id, f.n_tokens, f.cum_tokens, b.budget_tokens
      FROM fill f JOIN budgets b ON f.domain = b.domain
      WHERE f.cum_tokens <= b.budget_tokens
      ORDER BY f.domain, f.cum_tokens"""))
}
