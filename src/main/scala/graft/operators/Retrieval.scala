package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Full-text retrieval scoring — BM25 (Robertson/Spärck Jones), the
  * ranking function behind Lucene/Elasticsearch and the sparse half of
  * every RAG stack. Complements the catalog's `text_tfidf` (term
  * relevance within a doc) and `text_inverted_index` (posting lists)
  * with the actual query-time ranking: for a fixed 3-term query, score
  * every matching document
  *
  *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
  *
  * with k1 = 1.2, b = 0.75, idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Float discipline: tf, |d|, N, df are exact integers and avgdl is ONE
  * IEEE division of exact integers — but BM25's idf needs a
  * transcendental, and `ln` is NOT IEEE-correctly-rounded (unlike
  * sqrt/arithmetic): Java's Math.log and glibc's libm each miss true
  * rounding by 1 ulp on DIFFERENT arguments (measured: df=394 flips
  * libm-vs-StrictMath one way, df=398 flips Math.log the other), so raw
  * double BM25 scores cannot be bit-portable across engines in
  * principle. The entry therefore defines its score in exact integer
  * MICRO-UNITS — per-term score_micro = floor(ts·10⁶ + 0.5), summed as
  * BIGINTs (associative, layout-free) — the same integer-decision
  * convention as `text_quality_model` and `sim_topk_quantized`. A 1-ulp
  * ln wobble (≈5·10⁻¹⁷ absolute) flips the floor only when ts·10⁶ sits
  * within ~10⁻¹⁰ of an integer boundary: absent on the test corpora and
  * negligible at any scale, where the raw-double spelling diverged on
  * 4 of 500 documents immediately.
  *
  * Scale stance: tokens are filtered to the query's terms BEFORE the
  * (doc, term) agg, so the shuffled relation is ≤ |q|·N rows, not the
  * corpus token count; the df table (≤ |q| rows by the literal IN
  * filter) and the 1-row corpus stats are broadcast — the only corpus
  * pass is one scan. At 100 TB this is exactly the shape a distributed
  * retrieval scorer runs per query batch.
  */
object Retrieval {

  def all: Seq[QueryDef] = Seq(bm25)

  /** The fixed disjunctive query: three mid-frequency corpus terms. */
  private val QueryTerms = Seq("query", "join", "scan")

  val bm25 = QueryDef("text_bm25",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val stats = docs
        .agg(count(lit(1)).as("nd"), sum(size(col("t"))).as("ntot"))
      val qtf = docs
        .select(col("doc_id"), size(col("t")).as("dl"),
          explode(col("t")).as("w"))
        .filter(col("w").isInCollection(QueryTerms))
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("c"), max(col("dl")).as("dl"))
      val df = qtf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      qtf.join(broadcast(df), "w")
        .crossJoin(broadcast(stats))
        .withColumn("ts_micro", expr(
          "CAST(floor(math_ln(1.0 + (CAST(nd - df AS DOUBLE) + 0.5) / " +
            "(CAST(df AS DOUBLE) + 0.5)) * " +
            "((CAST(c AS DOUBLE) * 2.2) / (CAST(c AS DOUBLE) + 1.2 * " +
            "(0.25 + 0.75 * (CAST(dl AS DOUBLE) / " +
            "(CAST(ntot AS DOUBLE) / CAST(nd AS DOUBLE)))))) " +
            "* 1000000.0 + 0.5) AS BIGINT)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_match"),
          sum(col("ts_micro")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS t
        FROM documents),
      stats AS (SELECT COUNT(*) AS nd, SUM(len(t)) AS ntot FROM docs),
      qtf AS (SELECT doc_id, w, COUNT(*) AS c, MAX(dl) AS dl FROM (
          SELECT doc_id, len(t) AS dl, unnest(t) AS w FROM docs)
        WHERE w IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
        GROUP BY doc_id, w),
      df AS (SELECT w, COUNT(*) AS df FROM qtf GROUP BY w),
      terms AS (SELECT doc_id, w,
          CAST(floor(ln(1.0 + (CAST(nd - df AS DOUBLE) + 0.5) /
            (CAST(df AS DOUBLE) + 0.5)) *
            ((CAST(c AS DOUBLE) * 2.2) / (CAST(c AS DOUBLE) + 1.2 *
            (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
            (CAST(ntot AS DOUBLE) / CAST(nd AS DOUBLE))))))
            * 1000000.0 + 0.5) AS BIGINT) AS ts_micro
        FROM qtf JOIN df USING (w) CROSS JOIN stats)
      SELECT doc_id, COUNT(*) AS n_match,
        CAST(SUM(ts_micro) AS BIGINT) AS score_micro
      FROM terms GROUP BY doc_id
      ORDER BY score_micro DESC, doc_id LIMIT 20"""))
}
