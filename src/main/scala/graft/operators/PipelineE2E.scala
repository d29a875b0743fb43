package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** The end-to-end training-data curation pipeline (r6 verdict #7): the
  * path a user of this engine actually runs, composed from the SAME stage
  * implementations the catalog proves individually —
  *
  *   ingest → decontaminate ([[Curation.ngramHashes]], any 8-gram overlap
  *   with the held-out doc_id < 50 benchmark ⇒ drop) → near-dup dedup
  *   ([[Dedup.minhashPairs]], MinHash+LSH at Jaccard ≥ 0.5; the larger id
  *   of every pair drops) → quality filter (the `corpus_keep_filter`
  *   signals: 20 ≤ tokens ≤ 1000, stopword ratio ≤ 0.5) →
  *   [[Packing.packCounts]] (128-token sequences) → epoch shuffle key
  *   (the `shuffle_epoch` multiplicative hash over seq_id).
  *
  * One oracle-checked entry proves the operators COMPOSE: stage outputs
  * feed the next stage's plan with no layout, caching, or determinism
  * surprises, and the DuckDB oracle chains the same stages as CTEs.
  *
  * Scale shape is the union of the stages' shapes, all linear: two
  * corpus-sized hash shuffles (n-gram hash, shingle minhash), LSH band
  * self-join on distinct band keys (never all-pairs), two anti-joins
  * against small drop lists, the three-level distributed prefix scan
  * (serial window bounded by cluster parallelism P, not data), one final
  * sort. No stage holds more than per-key state.
  */
object PipelineE2E {

  def all: Seq[QueryDef] = Seq(curationE2E, mixManifest)

  /** Domain-aware train-manifest assembly (r8 verdict #6) — the SECOND
    * end-to-end entry, composing the proven mixing/split stages into the
    * artifact a pretraining run actually consumes: an ordered per-domain
    * document manifest under per-domain token budgets.
    *
    *   leakage-safe split ([[Components]] star labels over
    *   [[Dedup.minhashClassEdges]]; unit = near-dup component, ≈10%
    *   test by group-key hash — no near-dup pair straddles) → train side
    *   → per-domain temperature budgets (α = 0.5, the `mix_temperature`
    *   transform): budget_d = ⌊0.6·√tok_d·√max_tok⌋ tokens, which caps
    *   the largest domain at 60% of its supply while letting
    *   low-resource domains keep nearly everything (their oversampling
    *   is the repeat factor downstream) → budget fill in LENGTH-WEIGHTED
    *   deterministic order via a per-domain running token sum.
    *
    * The fill order is `sample_weighted`'s hash-vs-capped-length
    * criterion recast as a PRIORITY — the deterministic analogue of
    * weighted sampling without replacement (the Efraimidis–Spirakis
    * key, with the uniform draw replaced by the portable rolling hash):
    * p = ⌊(roll_hash(doc_id) mod 2000) · 2000 / min(n_chars, 2000)⌋,
    * ascending, so longer documents tend to fill first. Composing the
    * Bernoulli GATE itself with budgets would double-censor — a domain
    * whose gate survivors undershoot its budget can never fill it —
    * so the gate's weight function becomes the order and the budgets
    * do ALL the capping (the gate stays its own catalog entry).
    *
    * Numeric discipline: every budget is ⌊0.6·√a·√b⌋ of exact integers
    * — sqrt and the two products are single IEEE operations in a fixed
    * tree, so both engines compute identical bits; the priority is pure
    * integer arithmetic; there is NO order-dependent double summation
    * anywhere (the pitfall a Σ√-normalized allocation would introduce).
    * Selection and order are pure functions of (doc_id, source),
    * reproducible on any cluster.
    *
    * Scale: the split reuses the near-dup component machinery (banded,
    * linear); the pre-sample is row-local; budgets are a ~domains-row
    * broadcast; the fill is one window per domain partition — the
    * manifest shape a 100 TB recipe run emits unchanged. Driver-loop
    * star fixpoint keeps it out of the bench set like the other
    * component entries. */
  val mixManifest = QueryDef("pipeline_mix_manifest",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.HashExpressions.register(s)
      val docs = Tables.documents(s, d)
      val comp = Components.connectedComponentsStar(
          Dedup.minhashClassEdges(docs))
        .withColumnRenamed("node", "doc_id")
      val train = docs
        .join(comp, Seq("doc_id"), "left")
        .withColumn("group_key", coalesce(col("component"), col("doc_id")))
        .filter((col("group_key") * lit(1000003L) + lit(17L))
          % lit(1000000007L) % 10 =!= 0)
      val pool = train
        .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
        .withColumn("pr", expr(
          "((roll_hash(cast(doc_id as string)) % 2000) * 2000) " +
            "div least(n_chars, cast(2000 as bigint))"))
        .select(col("doc_id"), col("source"), col("group_key"),
          col("n_tokens"), col("pr"))
      val bySrc = pool.groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("tok"))
      val mx = bySrc.agg(max(col("tok")).as("mx"))
      val budgets = bySrc.crossJoin(broadcast(mx))
        .select(col("source"),
          floor(lit(0.6) * sqrt(col("tok").cast("double")) *
            sqrt(col("mx").cast("double"))).as("budget_tokens"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("pr"), col("doc_id"))
      pool
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .join(budgets, "source")
        .filter(col("cum_tokens") <= col("budget_tokens"))
        .select(col("source"), col("doc_id"), col("group_key"),
          col("n_tokens"), col("cum_tokens"), col("budget_tokens"))
        .orderBy(col("source"), col("cum_tokens"))
    },
    Some(s"""WITH RECURSIVE ${graft.operators.Dedup.minhashCtesSqlDuck(
        "(SELECT doc_id, string_split(text,' ') AS t FROM documents)")},
      cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      pairs AS (SELECT a, b FROM cands
        JOIN sets sa ON sa.doc_id = a JOIN sets sb ON sb.doc_id = b
        WHERE ${graft.operators.Dedup.jaccardSqlDuck("sa.hs", "sb.hs")} >= 0.5),
      sym AS (SELECT a AS u, b AS v FROM pairs
        UNION SELECT b, a FROM pairs),
      reach(u, v) AS (SELECT u, v FROM sym
        UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
      comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component
        FROM reach GROUP BY u),
      pool AS (SELECT d.doc_id, d.source,
          COALESCE(c.component, d.doc_id) AS group_key,
          CAST(len(string_split(d.text,' ')) AS BIGINT) AS n_tokens,
          ((list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(CAST(d.doc_id AS VARCHAR),''),
              c2 -> CAST(unicode(c2) AS BIGINT))),
            (h,c2) -> (h*31+c2) % 1000000007) % 2000) * 2000)
            // LEAST(d.n_chars, 2000) AS pr
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        WHERE ((COALESCE(c.component, d.doc_id) * 1000003 + 17)
            % 1000000007) % 10 <> 0),
      by_src AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tok
        FROM pool GROUP BY source),
      mxs AS (SELECT MAX(tok) AS mx FROM by_src),
      budgets AS (SELECT source,
          CAST(FLOOR(0.6 * sqrt(CAST(tok AS DOUBLE)) *
            sqrt(CAST(mx AS DOUBLE))) AS BIGINT) AS budget_tokens
        FROM by_src CROSS JOIN mxs),
      cum AS (SELECT source, doc_id, group_key, n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source
            ORDER BY pr, doc_id) AS BIGINT) AS cum_tokens
        FROM pool)
      SELECT c.source, c.doc_id, c.group_key, c.n_tokens, c.cum_tokens,
        b.budget_tokens
      FROM cum c JOIN budgets b USING (source)
      WHERE c.cum_tokens <= b.budget_tokens
      ORDER BY c.source, c.cum_tokens"""),
    // driver-loop star fixpoint like dedup_components / split_leakage_safe
    bench = false)

  val curationE2E = QueryDef("pipeline_curation_e2e",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // stage 1: strict decontamination against the doc_id < 50 holdout —
      // any shared distinct 8-gram disqualifies the document
      val sh = Curation.ngramHashes(docs)
      val benchSet = sh.filter(col("doc_id") < 50).select(col("h")).distinct()
      val contaminated = sh.filter(col("doc_id") >= 50)
        .join(benchSet, Seq("h"), "left_semi")
        .select(col("doc_id")).distinct()
      val s1 = docs.filter(col("doc_id") >= 50)
        .join(contaminated, Seq("doc_id"), "left_anti")
      // stage 2: near-dup dedup — greedy keep-first: the larger doc_id of
      // every verified pair is dropped (deterministic, anti-join shape)
      val dropB = Dedup.minhashPairs(s1).select(col("b").as("doc_id")).distinct()
      val s2 = s1.join(dropB, Seq("doc_id"), "left_anti")
      // stage 3: composite quality filter (corpus_keep_filter signals)
      val s3 = s2.withColumn("t", tokens(col("text")))
        .withColumn("n", size(col("t")).cast("long"))
        .withColumn("stop_ratio",
          expr("size(filter(t, w -> w IN ('the', 'a')))").cast("double") /
            col("n"))
        .filter(col("n").between(20, 1000) && col("stop_ratio") <= 0.5)
        .select(col("doc_id"), col("n"))
      // stage 4 + 5: pack into 128-token sequences, stamp the epoch
      // shuffle key, emit in epoch order
      Packing.packCounts(s, s3)
        .withColumn("shuffle_key",
          expr("((seq_id % 1000000007) * 2654435761 + 42) % 1000000007"))
        .orderBy(col("shuffle_key"), col("seq_id"))
    },
    Some {
      val gram8 = (0 until 8).map(k => s"t[j + $k]").mkString(" || ' ' || ")
      s"""WITH docs0 AS (SELECT doc_id, text, string_split(text, ' ') AS t
          FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 6),
            j -> $gram8)) AS ss
          FROM docs0 WHERE len(t) >= 8),
        ex AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(g, ''), c -> CAST(unicode(c) AS BIGINT))),
            (h, c) -> (h*31+c) % 1000000007) AS h
          FROM (SELECT doc_id, unnest(ss) AS g FROM sh)),
        bench AS (SELECT DISTINCT h FROM ex WHERE doc_id < 50),
        contam AS (SELECT DISTINCT doc_id FROM ex
          WHERE doc_id >= 50 AND h IN (SELECT h FROM bench)),
        s1 AS (SELECT doc_id, t FROM docs0 WHERE doc_id >= 50
          AND doc_id NOT IN (SELECT doc_id FROM contam)),
        ${graft.operators.Dedup.minhashCtesSqlDuck("s1")},
        cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        pairs AS (SELECT a, b FROM cands
          JOIN sets sa ON sa.doc_id = a JOIN sets sb ON sb.doc_id = b
          WHERE ${graft.operators.Dedup.jaccardSqlDuck("sa.hs", "sb.hs")} >= 0.5),
        s2 AS (SELECT doc_id, t FROM s1
          WHERE doc_id NOT IN (SELECT b FROM pairs)),
        s3 AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM s2
          WHERE len(t) BETWEEN 20 AND 1000
            AND CAST(len(list_filter(t, w -> w IN ('the', 'a'))) AS DOUBLE)
              / len(t) <= 0.5),
        off AS (SELECT doc_id, n, CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS o
          FROM s3),
        spans AS (SELECT doc_id, n, o,
            unnest(range(o // 128, (o + n - 1) // 128 + 1)) AS seq_id
          FROM off),
        packed AS (SELECT seq_id, COUNT(*) AS n_docs,
            CAST(SUM(LEAST((seq_id + 1) * 128, o + n) -
              GREATEST(seq_id * 128, o)) AS BIGINT) AS n_tokens,
            MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
          FROM spans GROUP BY seq_id)
        SELECT seq_id, n_docs, n_tokens, first_doc, last_doc,
          ((seq_id % 1000000007) * 2654435761 + 42) % 1000000007 AS shuffle_key
        FROM packed ORDER BY shuffle_key, seq_id"""
    })
}
