package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Corpus scoring operators: TF-IDF term relevance, a hashed linear
  * quality classifier (the fastText-style model-based filter every LM
  * curation pipeline runs), and n-gram novelty (corpus-redundancy
  * growth — the metric used to pick dedup thresholds).
  *
  * Scale stance: TF-IDF shuffles once by doc_id and once by term (both
  * map-side combinable) and joins the vocabulary-sized document-frequency
  * relation back via broadcast; the classifier is a pure per-row fold —
  * ZERO shuffles, embarrassingly parallel at any corpus size; novelty
  * groups 8-gram instances by a 64-bit-safe rolling hash (instances
  * shuffle as (hash, doc_id) pairs, never the gram text — the same
  * bytes-on-the-wire trade the minhash path makes).
  *
  * Float discipline (SURVEY.md §7.4): every ratio is one IEEE division of
  * exact integers; TF-IDF's log is the custom `math_ln` expression
  * ([[graft.functions.MathLog]]) whose `Math.log` is bit-equal to DuckDB's
  * libm `ln` (established for `text_unigram_logprob`); the classifier's
  * decision is made on the INTEGER score, so the label can never disagree
  * with the oracle even if a future platform drifted a ulp.
  */
object TextScoring {

  def all: Seq[QueryDef] =
    Seq(tfidf, qualityModel, ngramNovelty, entropy, rakeKeywords)

  /** RAKE-style keyword extraction (Rose et al. 2010) — unsupervised
    * keyphrase mining, the doc-level complement to [[tfidf]]'s term
    * relevance: candidate phrases are maximal stopword-free token runs
    * (split at the corpus stopwords), each scored by the summed corpus
    * DEGREE of its member words (degree = Σ length of phrases a word
    * occurs in — words that appear inside long multi-word phrases score
    * high), top-3 phrases per document. The degree-sum variant keeps
    * the score an exact INTEGER (classic RAKE's deg/freq ratio would
    * sum per-word float ratios — order-dependent); ties break on
    * (phrase text, phrase position).
    *
    * Scale shape: one token explode (~1 row/token), ONE doc-partitioned
    * window for the phrase-id prefix sum, a (doc, phrase) agg, a
    * vocabulary-sized degree agg joined back (AQE decides the
    * broadcast), and WindowGroupLimit for the per-doc top-3 — linear,
    * no self-joins. */
  val rakeKeywords = QueryDef("text_keywords_rake",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val seg = tok
        .withColumn("is_stop", col("w").isin("the", "a"))
        .withColumn("pid",
          sum(when(col("is_stop"), 1L).otherwise(0L)).over(wdoc))
        .filter(!col("is_stop"))
      val phrases = seg.groupBy(col("doc_id"), col("pid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("w"))))
          .as("pw"))
        .select(col("doc_id"), col("pid"),
          expr("transform(pw, x -> x.w)").as("ws"),
          size(col("pw")).cast("long").as("plen"))
      val wstats = phrases
        .select(explode(col("ws")).as("w"), col("plen"))
        .groupBy(col("w")).agg(sum(col("plen")).as("deg"))
      val pscore = phrases
        .select(col("doc_id"), col("pid"), explode(col("ws")).as("w"))
        .join(wstats, "w")
        .groupBy(col("doc_id"), col("pid")).agg(sum(col("deg")).as("score"))
      val wRank = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("phrase"), col("pid"))
      phrases.join(pscore, Seq("doc_id", "pid"))
        .withColumn("phrase", concat_ws(" ", col("ws")))
        // rank stays INT through the filter so InferWindowGroupLimit's
        // rank-filter pattern matches (PlanShapeSpec pins the heap limit)
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("bigint").as("rank"),
          col("phrase"), col("score"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
          FROM documents),
      tok AS (SELECT doc_id,
          unnest(range(1, len(t) + 1)) AS pos, unnest(t) AS w FROM t),
      seg AS (SELECT doc_id, pos, w,
          SUM(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS pid,
          (w IN ('the', 'a')) AS is_stop
        FROM tok),
      ph AS (SELECT doc_id, pid,
          string_agg(w, ' ' ORDER BY pos) AS phrase,
          CAST(COUNT(*) AS BIGINT) AS plen,
          list(w ORDER BY pos) AS ws
        FROM seg WHERE NOT is_stop GROUP BY doc_id, pid),
      wstats AS (SELECT w, CAST(SUM(plen) AS BIGINT) AS deg
        FROM (SELECT unnest(ws) AS w, plen FROM ph) GROUP BY w),
      pscore AS (SELECT doc_id, pid, CAST(SUM(deg) AS BIGINT) AS score
        FROM (SELECT doc_id, pid, unnest(ws) AS w FROM ph) p
        JOIN wstats USING (w)
        GROUP BY doc_id, pid),
      ranked AS (SELECT ph.doc_id, ph.phrase, ps.score,
          ROW_NUMBER() OVER (PARTITION BY ph.doc_id
            ORDER BY ps.score DESC, ph.phrase, ph.pid) AS rank
        FROM ph JOIN pscore ps USING (doc_id, pid))
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, phrase, score
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"""))

  /** Per-document token entropy H(d) = −Σ_w p(w|d)·ln p(w|d) — the
    * vocabulary-diversity quality signal (near-zero for boilerplate /
    * keyword-stuffed pages, high for fluent prose; a standard pre-LM
    * corpus filter next to the repetition fractions).
    *
    * Float discipline: per-(doc, token) terms are folded in TOKEN order
    * (each token appears once per doc after the count agg, so the order
    * is total) with the bit-parity `math_ln`; p is one exact division of
    * exact integers; the p·ln p product is a single IEEE multiply. Plan:
    * one (doc, w) hash agg, doc length by a window over the same doc_id
    * clustering — no second corpus shuffle, state bounded by per-doc
    * vocabulary. */
  val entropy = QueryDef("text_entropy",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val tc = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      tc.withColumn("n",
          sum(col("c")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"))))
        .withColumn("term", expr(
          "-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * " +
            "math_ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"))
        .groupBy(col("doc_id"))
        .agg(first(col("n")).as("n_tokens"),
          sort_array(collect_list(struct(col("w"), col("term")))).as("ts"))
        .select(col("doc_id"), col("n_tokens"),
          expr("aggregate(ts, 0d, (a, x) -> a + x.term)").as("entropy"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tc AS (
        SELECT doc_id, w, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents)
        GROUP BY doc_id, w),
      tn AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM tc GROUP BY doc_id)
      SELECT doc_id, ANY_VALUE(n) AS n_tokens,
        list_sum(list(
          -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
            ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
          ORDER BY w)) AS entropy
      FROM tc JOIN tn USING (doc_id)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** The classifier transform itself, factored out so the streaming
    * surface ([[graft.streaming.DocStreams.scoreQuality]]) can apply the
    * SAME code to an unbounded stream: it is stateless per-row work, so
    * it is legal (and identical) under `readStream`. No ORDER BY here —
    * sorting is the batch entry's presentation step. */
  def scoreQuality(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    graft.functions.HashExpressions.register(docs.sparkSession)
    docs
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        expr("""aggregate(t, CAST(0 AS BIGINT),
          (a, w) -> a + (((roll_hash(w) % 4096) * 2654435761) % 2001 - 1000))""")
          .as("score_milli"))
      .select(col("doc_id"), col("n_tokens"),
        (col("score_milli").cast("double") / (col("n_tokens") * 1000))
          .as("logit"),
        when(col("score_milli") > 0, 1).otherwise(0).as("keep"))
  }

  /** Top-3 TF-IDF terms per document: tf(w,d)/|d| × ln(N/df(w)).
    *
    * Plan: one (doc_id, w) hash-agg for term counts, a window over
    * doc_id for document length (reuses the same doc_id clustering),
    * one vocabulary-sized df agg joined back. The df side is NOT
    * broadcast-hinted — a vocabulary is data-scaled, so AQE's runtime
    * stats broadcast it while small and keep the shuffle join once it
    * outgrows executor memory. Ties at the rank-3 boundary break
    * by term, so the kept set is deterministic in both engines. */
  val tfidf = QueryDef("text_tfidf",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      val withLen = tf.withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("doc_id"))))
      val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
      val scored = withLen.join(df, "w")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          (col("c").cast("double") / col("n")) *
            expr("math_ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE))"))
      val wTop = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("w"))
      scored.withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("w").as("term"), col("c").as("tf"),
          col("df"), col("tfidf"))
        .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
      tf AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      tfn AS (SELECT doc_id, w, c,
          SUM(c) OVER (PARTITION BY doc_id) AS n FROM tf),
      df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
      nd AS (SELECT COUNT(*) AS nd FROM documents),
      scored AS (SELECT doc_id, w, c, df,
          (CAST(c AS DOUBLE) / n) * ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE))
            AS tfidf
        FROM tfn JOIN df USING (w) CROSS JOIN nd)
      SELECT doc_id, w AS term, c AS tf, df, tfidf FROM (
        SELECT doc_id, w, c, df, tfidf, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY tfidf DESC, w) AS rn
        FROM scored) WHERE rn <= 3
      ORDER BY doc_id, tfidf DESC, term"""))

  /** Hashed linear quality classifier (the portable surrogate for a
    * fastText / logistic-regression quality model): each token hashes to
    * one of 4096 weight buckets (the hashing trick), the bucket's
    * milli-weight in [-1000, 1000] is a fixed multiplicative scramble of
    * the bucket id, and the document's score is the exact BIGINT sum of
    * its tokens' weights. `logit` = score / (1000·n) is one IEEE
    * division; `keep` is decided on the integer score.
    *
    * In production the weight table comes from a trained model; the
    * plumbing — hash, lookup-free weight evaluation, per-row fold — is
    * exactly what serving such a model at 100 TB looks like (a real
    * 4096-float weight vector would be a broadcast literal, same plan).
    * Scale: zero shuffles, no joins; the whole query is row-local fold
    * work that scales embarrassingly. */
  val qualityModel = QueryDef("text_quality_model",
    (s, d) => scoreQuality(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some("""WITH scored AS (SELECT doc_id,
        CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        list_sum(list_transform(string_split(text,' '), w ->
          ((list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(w,''), c -> CAST(unicode(c) AS BIGINT))),
              (h,c) -> (h*31+c) % 1000000007) % 4096) * 2654435761) % 2001 - 1000))
          AS score_milli
      FROM documents)
      SELECT doc_id, n_tokens,
        CAST(score_milli AS DOUBLE) / (n_tokens * 1000) AS logit,
        CASE WHEN score_milli > 0 THEN 1 ELSE 0 END AS keep
      FROM scored ORDER BY doc_id"""))

  /** 8-gram novelty: per document, the fraction of its 8-gram instances
    * whose gram first occurs (min doc_id corpus-wide) in THIS document.
    * Falling novelty across a corpus is the standard signal that
    * additional data is redundant — the curve curation teams read before
    * spending on dedup.
    *
    * Scale: instances shuffle once keyed by the gram's rolling hash
    * (compact fixed-width keys instead of ~50-byte gram strings), the
    * first-occurrence relation joins back on the same key, and the final
    * agg re-uses the doc_id clustering. Hash collisions (mod 1e9+7) are
    * the same deterministic trade the minhash path makes and the oracle
    * replays them exactly. Documents shorter than 8 tokens have no
    * 8-grams and are excluded in both engines. */
  val ngramNovelty = QueryDef("text_ngram_novelty",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val g = Tables.documents(s, d)
        .withColumn("t", tokens(col("text")))
        .filter(size(col("t")) >= 8)
        .select(col("doc_id"), explode(expr(shinglesSql("t", 8))).as("g"))
        .select(col("doc_id"), expr("roll_hash(g)").as("gh"))
      val first = g.groupBy(col("gh")).agg(min(col("doc_id")).as("first_doc"))
      g.join(first, "gh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_grams")).as("novel_frac"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH g AS (SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(gram,''), c -> CAST(unicode(c) AS BIGINT))),
          (h,c) -> (h*31+c) % 1000000007) AS gh
      FROM (SELECT doc_id, unnest(list_transform(range(1, len(t) - 6),
          j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2] || ' ' || t[j+3] || ' ' ||
               t[j+4] || ' ' || t[j+5] || ' ' || t[j+6] || ' ' || t[j+7])) AS gram
        FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)
        WHERE len(t) >= 8)),
      first AS (SELECT gh, MIN(doc_id) AS first_doc FROM g GROUP BY gh)
      SELECT doc_id, COUNT(*) AS n_grams,
        CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
          AS n_novel,
        CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*) AS novel_frac
      FROM g JOIN first USING (gh)
      GROUP BY doc_id ORDER BY doc_id"""))
}
