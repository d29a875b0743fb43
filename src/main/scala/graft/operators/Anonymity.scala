package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** k-anonymity release (Sweeney) over the documents table — the privacy
  * gate a dataset release runs before quasi-identifiers ship: every
  * released row must be indistinguishable from ≥ k−1 others on its
  * quasi-identifier tuple. Spelled as LOCAL recoding over a fixed
  * generalization hierarchy: each doc releases the FINEST level whose
  * population group reaches k —
  *
  *   level 0: (lang, source, length-bucket)   — full quasi-id
  *   level 1: (lang, source, *)               — drop the bucket
  *   level 2: (lang, *, *)                    — language only
  *   level 3: (*, *, *)                       — fully suppressed
  *
  * Group sizes at every level are computed over the WHOLE population
  * (global counts + local recoding — the standard simplification; a
  * Mondrian-style partitioner would re-count per cut). Level 3 always
  * satisfies any k ≤ corpus size, so the CASE chain is total.
  *
  * Scale shape: three hash aggregations (each quasi-id-cardinality-
  * sized, map-side combinable) joined back to the scan — the finest
  * relation is the largest and it is (lang × source × bucket)-bounded,
  * never corpus-scaled; everything else is per-row CASE work. At
  * 100 TB this is three broadcast-sized dimension joins riding one
  * scan. */
object Anonymity {

  def all: Seq[QueryDef] = Seq(kAnonymity, lDiversity, tCloseness)

  val K = 8

  /** Distinct-l-diversity floor for [[lDiversity]]. */
  val L = 6

  /** EMD ceiling for [[tCloseness]]: a group fails when its sensitive-
    * attribute distribution sits further than this from the global
    * one. */
  val TClose = 0.2

  /** Core over an arbitrary `(doc_id, lang, source, bkt)` frame — what
    * the spec's suppression fixture drives (the corpus never reaches
    * level 3: every language clears k on its own). */
  def kAnonymityOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val g0 = docs.groupBy(col("lang"), col("source"), col("bkt"))
        .agg(count(lit(1)).as("n0"))
      val g1 = docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n1"))
      val g2 = docs.groupBy(col("lang")).agg(count(lit(1)).as("n2"))
      val tot = docs.agg(count(lit(1)).as("n3"))
      docs
        .join(g0, Seq("lang", "source", "bkt"))
        .join(g1, Seq("lang", "source"))
        .join(g2, Seq("lang"))
        .crossJoin(broadcast(tot))
        .withColumn("lvl",
          when(col("n0") >= K, lit(0)).when(col("n1") >= K, lit(1))
            .when(col("n2") >= K, lit(2)).otherwise(lit(3)))
        .select(col("doc_id"), col("lvl"),
          when(col("lvl") <= 2, col("lang")).otherwise(lit("*"))
            .as("q_lang"),
          when(col("lvl") <= 1, col("source")).otherwise(lit("*"))
            .as("q_source"),
          when(col("lvl") === 0, col("bkt").cast("string")).otherwise(lit("*"))
            .as("q_bkt"),
          when(col("lvl") === 0, col("n0")).when(col("lvl") === 1, col("n1"))
            .when(col("lvl") === 2, col("n2")).otherwise(col("n3"))
            .as("grp_n"))
        .orderBy(col("doc_id"))
  }

  val kAnonymity = QueryDef("curate_k_anonymity",
    (s, d) => kAnonymityOf(Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        (col("n_chars") / 100L).cast("long").as("bkt"))),
    Some(s"""WITH docs AS (SELECT doc_id, lang, source,
          CAST(n_chars // 100 AS BIGINT) AS bkt FROM documents),
      g0 AS (SELECT lang, source, bkt, COUNT(*) AS n0 FROM docs
        GROUP BY 1, 2, 3),
      g1 AS (SELECT lang, source, COUNT(*) AS n1 FROM docs GROUP BY 1, 2),
      g2 AS (SELECT lang, COUNT(*) AS n2 FROM docs GROUP BY 1),
      tot AS (SELECT COUNT(*) AS n3 FROM docs),
      lv AS (SELECT d.doc_id, d.lang, d.source, d.bkt, n0, n1, n2, n3,
          CASE WHEN n0 >= $K THEN 0 WHEN n1 >= $K THEN 1
               WHEN n2 >= $K THEN 2 ELSE 3 END AS lvl
        FROM docs d
        JOIN g0 ON g0.lang = d.lang AND g0.source = d.source
          AND g0.bkt = d.bkt
        JOIN g1 ON g1.lang = d.lang AND g1.source = d.source
        JOIN g2 ON g2.lang = d.lang
        CROSS JOIN tot)
      SELECT doc_id, lvl,
        CASE WHEN lvl <= 2 THEN lang ELSE '*' END AS q_lang,
        CASE WHEN lvl <= 1 THEN source ELSE '*' END AS q_source,
        CASE WHEN lvl = 0 THEN CAST(bkt AS VARCHAR) ELSE '*' END AS q_bkt,
        CAST(CASE WHEN lvl = 0 THEN n0 WHEN lvl = 1 THEN n1
             WHEN lvl = 2 THEN n2 ELSE n3 END AS BIGINT) AS grp_n
      FROM lv ORDER BY doc_id"""))

  /** Distinct l-diversity audit (Machanavajjhala et al.) — the gate
    * k-anonymity alone cannot close: a group can hold k
    * indistinguishable rows that all share ONE sensitive value, so
    * membership still discloses it (the homogeneity attack). Here the
    * quasi-identifier is (lang, length-bucket) and `source` plays the
    * sensitive attribute: a release group is safe only when it is both
    * k-anonymous (n ≥ [[K]]) AND l-diverse (≥ [[L]] DISTINCT sources —
    * the distinct-l criterion; entropy-l would need an order-dependent
    * float sum and buys little at audit granularity).
    *
    * Output is the per-group audit table (the artifact a release
    * review reads): group size, distinct sensitive values, and the two
    * integer pass flags. One hash aggregation with a distinct count —
    * quasi-id-cardinality-bounded output, count-distinct partial-
    * aggregated corpus-side; nothing data-scaled past the scan. */
  val lDiversity = QueryDef("curate_l_diversity",
    (s, d) => Tables.documents(s, d)
      .select(col("lang"), (col("n_chars") / 100L).cast("long").as("bkt"),
        col("source"))
      .groupBy(col("lang"), col("bkt"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("source")).as("n_sensitive"))
      .select(col("lang"), col("bkt"), col("n"), col("n_sensitive"),
        when(col("n") >= K, 1L).otherwise(0L).as("k_ok"),
        when(col("n_sensitive") >= L, 1L).otherwise(0L).as("l_ok"))
      .orderBy(col("lang"), col("bkt")),
    Some(s"""SELECT lang, CAST(n_chars // 100 AS BIGINT) AS bkt,
        COUNT(*) AS n,
        CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sensitive,
        CAST(CASE WHEN COUNT(*) >= $K THEN 1 ELSE 0 END AS BIGINT) AS k_ok,
        CAST(CASE WHEN COUNT(DISTINCT source) >= $L THEN 1 ELSE 0 END
          AS BIGINT) AS l_ok
      FROM documents GROUP BY 1, 2 ORDER BY lang, bkt"""))

  /** Core over an arbitrary `(lang, bkt, source)` frame — what the
    * spec's skewness fixture drives. */
  def tClosenessOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcnt = docs.groupBy(col("lang"), col("bkt"), col("source"))
      .agg(count(lit(1)).as("gc"))
    val gtot = docs.groupBy(col("lang"), col("bkt"))
      .agg(count(lit(1)).as("gn"))
    val gdist = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
    val tot = docs.agg(count(lit(1)).as("n"),
      countDistinct(col("source")).as("m"))
    // global CDF numerators over the ordered value domain — the one
    // unpartitioned window, serial over the ≤|values| relation only
    // (reviewed in CatalogPlanSweepSpec's serial-window list)
    val globCum = gdist
      .withColumn("cglob", sum(col("c")).over(
        Window.orderBy(col("source"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("source"), col("cglob"))
    val grid = gtot.crossJoin(broadcast(globCum))
      .join(gcnt, Seq("lang", "bkt", "source"), "left")
      .withColumn("gc0", coalesce(col("gc"), lit(0L)))
      .withColumn("cg", sum(col("gc0")).over(
        Window.partitionBy(col("lang"), col("bkt")).orderBy(col("source"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    grid.crossJoin(broadcast(tot))
      .withColumn("dterm", abs(
        col("cg").cast("decimal(38,0)") * col("n").cast("decimal(38,0)") -
          col("cglob").cast("decimal(38,0)") *
            col("gn").cast("decimal(38,0)")))
      .groupBy(col("lang"), col("bkt"))
      .agg(min(col("gn")).as("n"), min(col("n")).as("ntot"),
        min(col("m")).as("m"), sum(col("dterm")).as("emd_num"))
      .select(col("lang"), col("bkt"), col("n"),
        when(col("m") <= 1L, lit(0.0)).otherwise(
          col("emd_num").cast("double") /
            ((col("m") - 1L).cast("double") * col("n").cast("double") *
              col("ntot").cast("double"))).as("emd"))
      .withColumn("t_ok", when(col("emd") <= TClose, 1L).otherwise(0L))
      .orderBy(col("lang"), col("bkt"))
  }

  /** t-closeness audit (Li, Li, Venkatasubramanian 2007) — the gate
    * l-diversity cannot close: a group can expose ≥ [[L]] DISTINCT
    * sensitive values yet concentrate 99% of its mass on ONE of them,
    * so membership still shifts an attacker's posterior sharply (the
    * skewness attack — AnonymitySpec pins an l-diverse group that fails
    * here). The criterion bounds the Earth Mover's Distance between
    * each quasi-id group's sensitive-value distribution and the GLOBAL
    * one over the ordered value domain:
    *
    *   EMD = Σᵢ |CDF_group(i) − CDF_global(i)| / (m − 1)
    *
    * (ordered-domain EMD = mean absolute CDF gap; the value order is
    * the lexicographic source ranking, m = |values|). Arithmetic is the
    * KS-statistic discipline: each CDF gap is the exact integer
    * cross-product cum_g·n − cum_glob·gn in DECIMAL(38,0)/HUGEINT
    * (data-scaled² products — a long cannot hold them at 100 TB), the
    * per-group sum is exact, and ONE IEEE division produces the
    * reported emd; the m = 1 degenerate domain is pinned to 0 in both
    * engines.
    *
    * Plan: two quasi-id-bounded aggregations + a ≤|values|-row global
    * relation broadcast onto the group×value grid (quasi-id cardinality
    * × m rows — never corpus-scaled past the scan); the only
    * unpartitioned window is serial over that ≤|values| relation. */
  val tCloseness = QueryDef("curate_t_closeness",
    (s, d) => tClosenessOf(Tables.documents(s, d)
      .select(col("lang"), (col("n_chars") / 100L).cast("long").as("bkt"),
        col("source"))),
    Some(s"""WITH docs AS (SELECT lang, CAST(n_chars // 100 AS BIGINT) AS bkt,
          source FROM documents),
      gcnt AS (SELECT lang, bkt, source, COUNT(*) AS gc FROM docs
        GROUP BY 1, 2, 3),
      gtot AS (SELECT lang, bkt, COUNT(*) AS gn FROM docs GROUP BY 1, 2),
      gdist AS (SELECT source, COUNT(*) AS c FROM docs GROUP BY 1),
      tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT source) AS m FROM docs),
      globcum AS (SELECT source, CAST(SUM(c) OVER (ORDER BY source
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cglob
        FROM gdist),
      grid AS (SELECT g.lang, g.bkt, g.gn, v.source, v.cglob,
          COALESCE(gc.gc, 0) AS gc0
        FROM gtot g CROSS JOIN globcum v
        LEFT JOIN gcnt gc ON gc.lang = g.lang AND gc.bkt = g.bkt
          AND gc.source = v.source),
      cum AS (SELECT lang, bkt, gn, source, cglob,
          CAST(SUM(gc0) OVER (PARTITION BY lang, bkt ORDER BY source
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cg
        FROM grid),
      agg AS (SELECT lang, bkt, ANY_VALUE(gn) AS n,
          CAST(SUM(ABS(CAST(cg AS HUGEINT) * (SELECT n FROM tot)
            - CAST(cglob AS HUGEINT) * gn)) AS HUGEINT) AS emd_num
        FROM cum GROUP BY 1, 2)
      SELECT lang, bkt, n,
        CASE WHEN (SELECT m FROM tot) <= 1 THEN 0.0
          ELSE CAST(emd_num AS DOUBLE) /
            (CAST((SELECT m FROM tot) - 1 AS DOUBLE) * CAST(n AS DOUBLE) *
              CAST((SELECT n FROM tot) AS DOUBLE)) END AS emd,
        CAST(CASE WHEN (CASE WHEN (SELECT m FROM tot) <= 1 THEN 0.0
          ELSE CAST(emd_num AS DOUBLE) /
            (CAST((SELECT m FROM tot) - 1 AS DOUBLE) * CAST(n AS DOUBLE) *
              CAST((SELECT n FROM tot) AS DOUBLE)) END) <= $TClose
          THEN 1 ELSE 0 END AS BIGINT) AS t_ok
      FROM agg ORDER BY lang, bkt"""))
}
