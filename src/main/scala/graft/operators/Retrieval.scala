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

  def all: Seq[QueryDef] = Seq(bm25, hybridRrf, mmrRerank)

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    * — the diversification pass a RAG stack runs AFTER retrieval so the
    * k passages handed to the model aren't k near-copies of the same
    * content: greedily pick
    *
    *   argmax_d  λ·sim(q, d) − (1−λ)·max_{s ∈ S} sim(d, s)
    *
    * from the top-20 cosine shortlist until |S| = 5, λ = 0.7 (the first
    * pick maximizes pure relevance — the penalty term over the empty S
    * is 0).
    *
    * Scale stance: everything after the one corpus scan (the
    * TakeOrdered top-20 shortlist) runs on bounded relations — ≤ 20
    * candidates, ≤ 380 pairwise sims, 4 unrolled greedy rounds each a
    * ≤20-row aggregate + LIMIT-1 argmax; broadcasts are the 1-row query
    * and the ≤5-row selected set. Greedy MMR is inherently sequential
    * in k; bounding the shortlist is what makes that a non-issue at any
    * corpus size.
    *
    * Float discipline: shortlist and pairwise cosines are the engine's
    * bit-exact dot convention; each MMR score is the fixed tree
    * 0.7·qcos − 0.3·maxSim (true max over doubles — order-free), ties
    * broken by vec_id. The DuckDB oracle unrolls the same 5 selections
    * as MATERIALIZED CTEs. */
  val mmrRerank = QueryDef("retrieval_mmr_rerank",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", expr("sqrt(dot_f64(embedding, embedding))"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val cand = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("qcos",
          expr("dot_f64(q_emb, embedding)") / (col("q_nrm") * col("nrm")))
        .orderBy(col("qcos").desc, col("vec_id"))
        .limit(20)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("qcos"))
        .localCheckpoint(false) // ≤20 rows, consumed by every round
      val pairs = cand
        .select(col("vec_id").as("a"), col("embedding").as("ea"),
          col("nrm").as("na"))
        .join(broadcast(cand.select(col("vec_id").as("b"),
          col("embedding").as("eb"), col("nrm").as("nb"))),
          col("a") =!= col("b"))
        .select(col("a"), col("b"),
          (expr("dot_f64(ea, eb)") / (col("na") * col("nb"))).as("sim"))
        // ≤380 rows, re-joined by all four greedy rounds — one lazy
        // checkpoint computes the pairwise sims once (r16)
        .localCheckpoint(false)
      var sel = cand
        .orderBy(col("qcos").desc, col("vec_id"))
        .limit(1)
        .select(col("vec_id"), lit(1).as("pick_rank"),
          (lit(0.7) * col("qcos")).as("mmr_score"))
      for (i <- 2 to 5) {
        val chosen = sel.select(col("vec_id").as("b"))
        val scored = cand
          .join(sel.select(col("vec_id")), Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("qcos"))
          .join(pairs.withColumnRenamed("a", "vec_id"), "vec_id")
          .join(broadcast(chosen), "b")
          .groupBy(col("vec_id"), col("qcos"))
          .agg(max(col("sim")).as("ms"))
          .withColumn("mmr",
            lit(0.7) * col("qcos") - lit(0.3) * col("ms"))
        sel = sel.unionAll(scored
          .orderBy(col("mmr").desc, col("vec_id"))
          .limit(1)
          .select(col("vec_id"), lit(i).as("pick_rank"),
            col("mmr").as("mmr_score")))
          // the next round references sel THREE times (exclusion
          // anti-join, chosen set, union) — without a cut the analyzed
          // plan TRIPLES per round, 3^4 copies of round 1 by the last
          // pick (r16, guide §7.2 duplicated-subtree audit). A lazy
          // checkpoint of the ≤i-row selection keeps the unrolled greedy
          // loop's plan linear; blocks materialize inside the one action.
          .localCheckpoint(false)
      }
      sel.join(cand.select(col("vec_id"), col("qcos")), "vec_id")
        .select(col("pick_rank").cast("int").as("pick_rank"),
          col("vec_id"), col("mmr_score"), col("qcos"))
        .orderBy(col("pick_rank"))
    },
    Some {
      val rounds = (2 to 5).map { i =>
        s"""r$i AS (SELECT c.vec_id, c.qcos, MAX(p.sim) AS ms
          FROM cand c JOIN pairs p ON p.a = c.vec_id
          JOIN sel${i - 1} s ON p.b = s.vec_id
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
          GROUP BY c.vec_id, c.qcos),
        s$i AS MATERIALIZED (SELECT vec_id, $i AS pick_rank,
            0.7 * qcos - 0.3 * ms AS mmr_score
          FROM r$i ORDER BY (0.7 * qcos - 0.3 * ms) DESC, vec_id LIMIT 1),
        sel$i AS MATERIALIZED (
          SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM s$i)"""
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding,
          sqrt(list_sum(list_transform(embedding,
            v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
          FROM embeddings),
        q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e
          WHERE vec_id = 0),
        cand AS MATERIALIZED (SELECT e.vec_id, e.embedding, e.nrm,
            list_sum(list_transform(range(1, len(q.q_emb)+1),
              i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
              / (q.q_nrm * e.nrm) AS qcos
          FROM e CROSS JOIN q WHERE e.vec_id <> 0
          ORDER BY qcos DESC, vec_id LIMIT 20),
        pairs AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b,
            list_sum(list_transform(range(1, len(a.embedding)+1),
              i -> CAST(a.embedding[i] AS DOUBLE) *
                CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm) AS sim
          FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
        sel1 AS MATERIALIZED (SELECT vec_id, 1 AS pick_rank,
            0.7 * qcos AS mmr_score
          FROM cand ORDER BY qcos DESC, vec_id LIMIT 1),
        $rounds
        SELECT CAST(s.pick_rank AS INT) AS pick_rank, s.vec_id,
          s.mmr_score, c.qcos
        FROM sel5 s JOIN cand c USING (vec_id)
        ORDER BY pick_rank"""
    })

  /** The fixed disjunctive query: three mid-frequency corpus terms. */
  private val QueryTerms = Seq("query", "join", "scan")

  /** The BM25 scoring pipeline up to (doc_id, n_match, score_micro) —
    * shared by [[bm25]] (top-20 ranking) and [[hybridRrf]] (sparse leg). */
  private def bm25Scored(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
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
  }

  val bm25 = QueryDef("text_bm25",
    (s, d) =>
      bm25Scored(s, d)
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(20),
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

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009) —
    * the combiner every modern RAG stack runs between its sparse (BM25)
    * and dense (embedding ANN) legs: fetch top-Nc candidates from each
    * ranker independently, then fuse by
    *
    *   rrf(d) = Σ_lists 1 / (K + rank_list(d)),   K = 60
    *
    * so a document ranked well by EITHER leg surfaces even when the
    * other leg misses it entirely. Sparse leg = [[bm25Scored]] over the
    * fixed 3-term query; dense leg = exact cosine against vec_id 0's
    * embedding (doc_id and vec_id are the same 1:1 id space in the test
    * tables — the production shape is the ANN shortlist feeding the same
    * fusion).
    *
    * Scale stance: each leg is one corpus scan ending in a
    * TakeOrderedAndProject top-50 (per-partition heads, never a full
    * sort); ranks are then assigned by a window over the LIMIT-50-bounded
    * candidate relation (serial by construction — ≤ 2·Nc rows at ANY
    * corpus size, allowlisted in CatalogPlanSweepSpec), and the fusion
    * join is ≤ Nc vs ≤ Nc rows. At 100 TB both legs are index probes
    * (inverted-index posting lists / IVF-PQ shortlists) and the fusion
    * cost is unchanged.
    *
    * Float discipline: each RRF term is ONE IEEE division of exact
    * integers (1.0 / (60 + rank)) and the two-term sum is a fixed
    * expression tree (sparse term + dense term) — bit-identical across
    * engines; rank ties inside each leg are broken by doc id, so the
    * ranks themselves are integers both engines agree on. */
  val hybridRrf = QueryDef("retrieval_hybrid_rrf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val Nc = 50
      // sparse leg: BM25 top-50 → ranks (window input bounded by LIMIT)
      val sparse = bm25Scored(s, d)
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(Nc)
        .withColumn("r_sparse", row_number().over(
          Window.orderBy(col("score_micro").desc, col("doc_id"))))
        .select(col("doc_id"), col("r_sparse"))
      // dense leg: exact cosine vs vec 0, top-50 → ranks
      graft.functions.VectorFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", expr("sqrt(dot_f64(embedding, embedding))"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      val dense = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("cosine",
          expr("dot_f64(q_emb, embedding)") / (col("q_nrm") * col("nrm")))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(Nc)
        .withColumn("r_dense", row_number().over(
          Window.orderBy(col("cosine").desc, col("vec_id"))))
        .select(col("vec_id").as("doc_id"), col("r_dense"))
      sparse.join(dense, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          col("r_sparse").cast("int").as("r_sparse"),
          col("r_dense").cast("int").as("r_dense"),
          (expr("CASE WHEN r_sparse IS NULL THEN 0.0d " +
              "ELSE 1.0d / (60.0d + CAST(r_sparse AS DOUBLE)) END") +
            expr("CASE WHEN r_dense IS NULL THEN 0.0d " +
              "ELSE 1.0d / (60.0d + CAST(r_dense AS DOUBLE)) END"))
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
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
      terms AS (SELECT doc_id,
          CAST(floor(ln(1.0 + (CAST(nd - df AS DOUBLE) + 0.5) /
            (CAST(df AS DOUBLE) + 0.5)) *
            ((CAST(c AS DOUBLE) * 2.2) / (CAST(c AS DOUBLE) + 1.2 *
            (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
            (CAST(ntot AS DOUBLE) / CAST(nd AS DOUBLE))))))
            * 1000000.0 + 0.5) AS BIGINT) AS ts_micro
        FROM qtf JOIN df USING (w) CROSS JOIN stats),
      bm AS (SELECT doc_id, CAST(SUM(ts_micro) AS BIGINT) AS score_micro
        FROM terms GROUP BY doc_id),
      bm50 AS (SELECT doc_id, score_micro FROM bm
        ORDER BY score_micro DESC, doc_id LIMIT 50),
      sparse AS (SELECT doc_id, ROW_NUMBER() OVER (
          ORDER BY score_micro DESC, doc_id) AS r_sparse FROM bm50),
      e AS (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding,
          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
        FROM embeddings),
      q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
      scored AS (SELECT e.vec_id,
          list_sum(list_transform(range(1, len(q.q_emb)+1),
            i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
            / (q.q_nrm * e.nrm) AS cosine
        FROM e CROSS JOIN q WHERE e.vec_id <> 0),
      cos50 AS (SELECT vec_id, cosine FROM scored
        ORDER BY cosine DESC, vec_id LIMIT 50),
      dense AS (SELECT vec_id AS doc_id, ROW_NUMBER() OVER (
          ORDER BY cosine DESC, vec_id) AS r_dense FROM cos50)
      SELECT COALESCE(s.doc_id, de.doc_id) AS doc_id,
        CAST(s.r_sparse AS INT) AS r_sparse,
        CAST(de.r_dense AS INT) AS r_dense,
        (CASE WHEN s.r_sparse IS NULL THEN 0.0
          ELSE 1.0 / (60.0 + CAST(s.r_sparse AS DOUBLE)) END) +
        (CASE WHEN de.r_dense IS NULL THEN 0.0
          ELSE 1.0 / (60.0 + CAST(de.r_dense AS DOUBLE)) END) AS rrf
      FROM sparse s FULL OUTER JOIN dense de ON s.doc_id = de.doc_id
      ORDER BY rrf DESC, doc_id LIMIT 20"""))
}
