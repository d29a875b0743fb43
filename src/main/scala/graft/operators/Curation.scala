package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Corpus-curation operators: the two standard decisions a training-data
  * pipeline makes beyond pairwise dedup —
  *
  *   - benchmark DECONTAMINATION: flag documents whose n-grams overlap a
  *     held-out evaluation set (so eval data never leaks into training);
  *     here the holdout is the doc_id < 50 prefix, standing in for an
  *     external benchmark corpus.
  *   - composite KEEP/DROP filter: one deterministic decision per document
  *     composed from the established signals (exact-dup keeper, length
  *     bounds, stopword ratio), with the first failing check as the
  *     audit reason.
  *
  * Scale shape, both ops: per-row expression work + one hash aggregation
  * or semi-join on well-distributed keys — linear, no self-joins. The
  * contamination check is one corpus-sized shuffle on n-gram hash; the
  * holdout side is tiny (broadcastable) at any realistic benchmark size.
  */
object Curation {

  def all: Seq[QueryDef] =
    Seq(decontaminate, decontaminateSpans, keepFilter, dsirSelect,
      clusterBalanced)

  /** Cluster-balanced diversity sampling — the coverage-preserving
    * subsample curation pipelines draw when a corpus over-represents
    * dense regions (the SemDeDup/SSL-prototypes observation: random
    * sampling reproduces the density skew; per-cluster quotas flatten
    * it). Every embedding is assigned to its nearest of the k = 8 seed
    * centroids (the `emb_kmeans_assign` kernel verbatim: broadcast
    * centroids, codegen `dot_f64` expansion of squared L2, centroid-id
    * tie-break), then each cluster contributes at most Q = 16 members
    * in deterministic pseudo-random order — priority =
    * (vec_id · 2654435761) mod 1e9+7, the multiplicative-hash
    * convention of `shuffle_epoch`, so the sample is reproducible on
    * any layout and NOT correlated with ingest order.
    *
    * Scale stance: the only shuffle is the per-cluster rank, which
    * Spark 4 plans as a WindowGroupLimit (per-partition top-Q heaps
    * before the exchange); production k is thousands-to-millions of
    * clusters, so parallelism scales with k while per-cluster state
    * stays Q rows. All arithmetic is exact BIGINT. */
  val clusterBalanced = QueryDef("curate_cluster_balanced",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val Q = 16
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          expr("dot_f64(embedding, embedding)").as("xx"))
      val seeds = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          col("xx").as("cc"))
      val wAssign = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
      val assigned = e.crossJoin(broadcast(seeds))
        .withColumn("d2",
          col("xx") - lit(2.0) * expr("dot_f64(embedding, cvec)") + col("cc"))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid").as("cluster"))
        .withColumn("pri", (col("vec_id") * lit(2654435761L)) % 1000000007L)
      val sizes = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_cluster"))
      val wPick = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster")).orderBy(col("pri"), col("vec_id"))
      assigned
        .withColumn("pick_rank", row_number().over(wPick))
        .filter(col("pick_rank") <= Q)
        .join(sizes, "cluster")
        .select(col("cluster"), col("pick_rank").cast("int").as("pick_rank"),
          col("vec_id"), col("n_cluster"))
        .orderBy(col("cluster"), col("pick_rank"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding,
        list_sum(list_transform(range(1, len(embedding)+1),
          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
          AS xx
        FROM embeddings),
      seeds AS (SELECT vec_id AS cid, embedding AS cvec, xx AS cc
        FROM e WHERE vec_id < 8),
      dist AS (SELECT x.vec_id, s.cid,
          x.xx - 2 * list_sum(list_transform(range(1, len(x.embedding)+1),
            i -> CAST(x.embedding[i] AS DOUBLE) * CAST(s.cvec[i] AS DOUBLE)))
            + s.cc AS d2
        FROM e x CROSS JOIN seeds s),
      assigned AS (SELECT vec_id, cid AS cluster,
          (vec_id * 2654435761) % 1000000007 AS pri
        FROM (SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY d2, cid) AS rn FROM dist)
        WHERE rn = 1),
      sizes AS (SELECT cluster, COUNT(*) AS n_cluster
        FROM assigned GROUP BY cluster)
      SELECT cluster, CAST(pick_rank AS INT) AS pick_rank, vec_id, n_cluster
      FROM (SELECT vec_id, cluster, pri, ROW_NUMBER() OVER (
          PARTITION BY cluster ORDER BY pri, vec_id) AS pick_rank
        FROM assigned) JOIN sizes USING (cluster)
      WHERE pick_rank <= 16 ORDER BY cluster, pick_rank"""))

  /** DSIR-style data selection (importance resampling over hashed n-gram
    * features — the published recipe: Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): estimate a bag-of-
    * hashed-unigrams distribution for the TARGET corpus (the doc_id < 50
    * holdout prefix, standing in for the high-quality domain sample) and
    * for the RAW pool (everything else), score every raw document by its
    * importance log-ratio  Σ_tokens [ln p_target(bucket) − ln p_raw
    * (bucket)]  with add-1 smoothing over B = 256 hash buckets, and keep
    * the top-100 most-target-like documents.
    *
    * Scale shape: two corpus scans' worth of per-row hash work folded
    * into ONE pass (the bucket histograms and per-doc bucket counts hash-
    * aggregate from the same exploded token relation), a ≤B-row log-ratio
    * table AQE broadcasts on runtime stats (no hint — the round-6
    * vocabulary-relation rule), and a global top-k (TakeOrderedAndProject
    * — per-partition heads, never a full sort). No self-joins; linear in
    * corpus tokens at any scale.
    *
    * Float discipline: p_t and p_raw are single IEEE divisions of exact
    * integers, ln is the bit-parity `math_ln`, the per-(doc, bucket) term
    * is one multiply, and per-doc terms fold in bucket order
    * (`sort_array` + `aggregate`) — the `text_entropy` convention, so the
    * score hash-matches DuckDB exactly. */
  val dsirSelect = QueryDef("curate_dsir",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val B = 256
      val isTgt = col("doc_id") < 50
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .withColumn("b", rollHash("w") % B)
      val tot = tok.agg(
        sum(when(isTgt, 1L).otherwise(0L)).as("nt"),
        sum(when(isTgt, 0L).otherwise(1L)).as("ns"))
      val tgt = tok.filter(isTgt).groupBy(col("b")).agg(count(lit(1)).as("ct"))
      val db = tok.filter(!isTgt)
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      val lr = db.groupBy(col("b")).agg(sum(col("c")).as("cs"))
        .join(tgt, Seq("b"), "left_outer")
        .crossJoin(broadcast(tot))
        .select(col("b"), (
          expr(s"math_ln(CAST(coalesce(ct, 0L) + 1L AS DOUBLE) / CAST(nt + $B AS DOUBLE))") -
            expr(s"math_ln(CAST(cs + 1L AS DOUBLE) / CAST(ns + $B AS DOUBLE))")).as("lr"))
      db.join(lr, "b")
        .withColumn("term", col("c").cast("double") * col("lr"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          sort_array(collect_list(struct(col("b"), col("term")))).as("ts"))
        .select(col("doc_id"), col("n_tokens"),
          expr("aggregate(ts, 0d, (a, x) -> a + x.term)").as("logw"))
        .orderBy(col("logw").desc, col("doc_id"))
        .limit(100)
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      hb AS (SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(w, ''), c -> CAST(unicode(c) AS BIGINT))),
            (h, c) -> (h*31+c) % 1000000007) % 256 AS b
        FROM tok),
      tot AS (SELECT
          CAST(SUM(CASE WHEN doc_id < 50 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
          CAST(SUM(CASE WHEN doc_id >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS ns
        FROM hb),
      tgt AS (SELECT b, COUNT(*) AS ct FROM hb WHERE doc_id < 50 GROUP BY b),
      db AS (SELECT doc_id, b, COUNT(*) AS c
        FROM hb WHERE doc_id >= 50 GROUP BY doc_id, b),
      lr AS (SELECT s.b,
          ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) / CAST(o.nt + 256 AS DOUBLE)) -
            ln(CAST(s.cs + 1 AS DOUBLE) / CAST(o.ns + 256 AS DOUBLE)) AS lr
        FROM (SELECT b, CAST(SUM(c) AS BIGINT) AS cs FROM db GROUP BY b) s
        LEFT JOIN tgt t USING (b) CROSS JOIN tot o),
      dw AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          list_sum(list(CAST(c AS DOUBLE) * lr ORDER BY b)) AS logw
        FROM db JOIN lr USING (b) GROUP BY doc_id)
      SELECT doc_id, n_tokens, logw FROM dw
      ORDER BY logw DESC, doc_id LIMIT 100"""))

  /** Span-level decontamination — the surgical upgrade over
    * [[decontaminate]]'s doc-level flag: instead of dropping every
    * document that shares an 8-gram with the holdout, strip ONLY the
    * overlapping spans and keep the rest of the text (standard practice
    * when contaminated documents carry mostly-clean content). Built
    * from the substring-dedup machinery at W = 8: every overlapping
    * 8-token window of a corpus doc whose rolling hash appears in the
    * holdout's window-hash set marks its 8 tokens for removal
    * ([[Dedup.probeFlags]]), and the merge-sort/running-max apply
    * ([[Dedup.spanApply]]) rebuilds the cleaned text. A doc sharing no
    * 8-gram keeps its text verbatim; n_kept < n_tokens exactly on
    * [[decontaminate]]'s flagged docs (pinned in PipelineOpsSpec).
    *
    * Scale shape: one corpus-sized shuffle keyed by window hash + the
    * broadcastable holdout hash set + one per-doc window — linear, the
    * same budget as the doc-level flag plus the rebuild. */
  val decontaminateSpans = QueryDef("text_decontaminate_spans",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.spanApply(Dedup.probeFlags(
        docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50), 8), 8)
    },
    Some("""WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      w AS (
        SELECT doc_id, i - 1 AS pos,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(array_to_string(t[i:i+7], ' '), ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (h, c) -> (h*31+c) % 1000000007) AS gh
        FROM docs, UNNEST(range(1, len(t) - 6)) AS r(i)
        WHERE len(t) >= 8),
      idx AS (SELECT DISTINCT gh FROM w WHERE doc_id < 50),
      flagged AS (SELECT doc_id, pos FROM w
        WHERE doc_id >= 50 AND gh IN (SELECT gh FROM idx)),
      corpus AS (SELECT doc_id, t FROM docs WHERE doc_id >= 50),
      toks AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
        FROM corpus, UNNEST(range(1, len(t) + 1)) AS r(i)),
      ev AS (SELECT doc_id, pos AS p, 0 AS kind,
          CAST(NULL AS VARCHAR) AS tok, pos + 8 AS lim FROM flagged
        UNION ALL
        SELECT doc_id, p, 1, tok, NULL FROM toks),
      kept AS (SELECT doc_id, p, tok FROM (
          SELECT doc_id, p, kind, tok,
            MAX(lim) OVER (PARTITION BY doc_id ORDER BY p, kind
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
          FROM ev)
        WHERE kind = 1 AND (carry IS NULL OR carry <= p)),
      agg AS (SELECT doc_id, COUNT(*) AS nk,
          array_to_string(list(tok ORDER BY p), ' ') AS ct
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        CAST(COALESCE(a.nk, 0) AS BIGINT) AS n_kept,
        COALESCE(a.ct, '') AS clean_text
      FROM corpus d LEFT JOIN agg a USING (doc_id)
      ORDER BY d.doc_id"""))

  /** (doc_id, h): distinct 8-gram rolling hashes per document. Shared by
    * the batch decontamination query and the streaming twin
    * ([[graft.streaming.DocStreams.flagContaminated]]) — batch/stream
    * unification, same as EventStreams. */
  private[graft] def ngramHashes(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ngramHashesTok(docs.withColumn("t", tokens(col("text"))))

  /** [[ngramHashes]] from an already-tokenized `(doc_id, t)` frame — the
    * multi-day pipeline tokenizes each batch once and shares `t` across
    * all per-doc derivations; expression tree from `t` onward identical. */
  private[graft] def ngramHashesTok(tok: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.HashExpressions.register(tok.sparkSession)
    tok
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"),
        explode(array_distinct(expr(shinglesSql("t", 8)))).as("sh"))
      .withColumn("h", rollHash("sh"))
  }

  /** 8-gram overlap of every corpus document against the holdout prefix.
    * Hashing happens after per-doc `array_distinct` on the shingle
    * strings, so counts are per distinct n-gram — identical in both
    * engines even under hash collisions (same hash, same strings). */
  val decontaminate = QueryDef("text_decontaminate",
    (s, d) => {
      // three subtrees consume the hashed shingles (holdout set, hit
      // counts, totals). Recompute-over-cache is a MEASURED decision, same
      // as text_langid: the whole pipeline is codegen'd scan+hash, and
      // .cache() tested SLOWER at 8x (2.27 s vs 1.71 s — materialization
      // barrier + memory-format conversion cost more than two re-scans)
      val sh = ngramHashes(Tables.documents(s, d))
      val benchSet = sh.filter(col("doc_id") < 50).select(col("h")).distinct()
      val corpus = sh.filter(col("doc_id") >= 50)
      val hits = corpus.join(benchSet, Seq("h"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
      corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ngrams"))
        .join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_ngrams"),
          coalesce(col("hits"), lit(0L)).as("n_contaminated"),
          (coalesce(col("hits"), lit(0L)).cast("double") / col("n_ngrams"))
            .as("contamination"))
        .orderBy(col("doc_id"))
    },
    Some {
      val gram = (0 until 8).map(k => s"t[j + $k]").mkString(" || ' ' || ")
      s"""WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 6),
          j -> $gram)) AS ss
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 8),
      ex AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(g, ''), c -> CAST(unicode(c) AS BIGINT))),
          (h, c) -> (h*31+c) % 1000000007) AS h
        FROM (SELECT doc_id, unnest(ss) AS g FROM sh)),
      bench AS (SELECT DISTINCT h FROM ex WHERE doc_id < 50),
      agg AS (SELECT doc_id, COUNT(*) AS n_ngrams,
          CAST(SUM(CASE WHEN h IN (SELECT h FROM bench) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated
        FROM ex WHERE doc_id >= 50 GROUP BY doc_id)
      SELECT doc_id, n_ngrams, n_contaminated,
        CAST(n_contaminated AS DOUBLE) / n_ngrams AS contamination
      FROM agg ORDER BY doc_id"""
    })

  /** Composite keep/drop decision with an audit reason: duplicate (not the
    * exact-dup keeper) → too_short → too_long → low_quality (stopword
    * ratio), first failure wins. */
  val keepFilter = QueryDef("corpus_keep_filter",
    (s, d) => {
      val base = Tables.documents(s, d)
        .withColumn("t", tokens(col("text")))
        .withColumn("n", size(col("t")).cast("long"))
        .withColumn("stop_ratio",
          expr("size(filter(t, w -> w IN ('the', 'a')))").cast("double") / col("n"))
        .withColumn("norm", array_join(array_sort(col("t")), " "))
      val keepers = base.groupBy(col("norm")).agg(min(col("doc_id")).as("keeper"))
      base.join(keepers, "norm")
        .withColumn("reason",
          when(col("doc_id") =!= col("keeper"), "duplicate")
            .when(col("n") < 20, "too_short")
            .when(col("n") > 1000, "too_long")
            .when(col("stop_ratio") > 0.5, "low_quality")
            .otherwise("ok"))
        .select(col("doc_id"), (col("reason") === "ok").as("keep"), col("reason"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS t,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
          CAST(len(list_filter(string_split(text, ' '),
            w -> w IN ('the', 'a'))) AS DOUBLE)
            / len(string_split(text, ' ')) AS stop_ratio,
          array_to_string(list_sort(string_split(text, ' ')), ' ') AS norm
        FROM documents),
      keepers AS (SELECT norm, MIN(doc_id) AS keeper FROM base GROUP BY norm),
      flagged AS (SELECT b.doc_id,
          CASE WHEN b.doc_id <> k.keeper THEN 'duplicate'
            WHEN b.n < 20 THEN 'too_short'
            WHEN b.n > 1000 THEN 'too_long'
            WHEN b.stop_ratio > 0.5 THEN 'low_quality'
            ELSE 'ok' END AS reason
        FROM base b JOIN keepers k ON b.norm = k.norm)
      SELECT doc_id, reason = 'ok' AS keep, reason
      FROM flagged ORDER BY doc_id"""))
}
