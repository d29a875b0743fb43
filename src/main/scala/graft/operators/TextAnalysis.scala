package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table (SURVEY.md §2.4 /
  * north-star extensions): token statistics, global word count (A1 over
  * tokens), quality scoring, corpus-profile language ID, and rolling-hash
  * document fingerprinting.
  *
  * Scale stance: everything is per-row expression work (codegen) plus one
  * hash aggregation — no driver-side loops; word count and profiles use
  * map-side partial aggregation. At 100 TB the only shuffle is the
  * groupBy on (word) / (lang, word), both low-cardinality here and
  * salt-able if a vocabulary were skewed.
  */
object TextAnalysis {

  def all: Seq[QueryDef] =
    Seq(tokenStats, wordcount, quality, fingerprint, langid, tokenBpe,
      repetition, vocabRichness)

  /** Per-language vocabulary richness — type/token ratio, hapax (and
    * ≤5-count rare-word) share: the lexical-diversity panel corpus
    * linguistics runs first, and in a training-data pipeline the
    * cheapest detector for templated or de-duplicated-to-death slices
    * (richness collapses when boilerplate dominates; hapax share rises
    * with OCR noise / junk tokens). One explode → (lang, word) count →
    * per-lang aggregate; ratios are single divisions of exact BIGINTs.
    * At 100 TB the (lang, word) relation is vocabulary-scaled, and the
    * rollup is map-side combinable. */
  val vocabRichness = QueryDef("text_vocab_richness",
    (s, d) => {
      val wc = Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      wc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("c")).as("n_tokens"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
          sum(when(col("c") <= 5, 1L).otherwise(0L)).as("n_rare"))
        .select(col("lang"), col("n_types"), col("n_tokens"),
          col("n_hapax"), col("n_rare"),
          (col("n_types").cast("double") / col("n_tokens").cast("double"))
            .as("type_token_ratio"),
          (col("n_hapax").cast("double") / col("n_types").cast("double"))
            .as("hapax_share"))
        .orderBy(col("lang"))
    },
    Some("""WITH wc AS (SELECT lang, w, COUNT(*) AS c FROM (
        SELECT lang, unnest(string_split(text,' ')) AS w FROM documents)
        GROUP BY lang, w)
      SELECT lang, COUNT(*) AS n_types,
        CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        CAST(SUM(CASE WHEN c <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
          AS type_token_ratio,
        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS hapax_share
      FROM wc GROUP BY lang ORDER BY lang"""))

  /** Within-document repetition signals (the Gopher-style quality
    * filters for machine-generated / boilerplate text): fraction of
    * duplicate tokens, fraction of all bigrams/trigrams claimed by the
    * single most frequent one, and the fraction of 5-gram instances
    * whose 5-gram repeats within the document.
    *
    * Scale shape: n-gram explode → hash-agg keyed by (doc_id, gram) →
    * per-doc re-agg — the A1 shape three times, all shuffles keyed by
    * doc_id(+gram), map-side partial aggregation throughout; no joins
    * except the per-doc left joins of three doc-keyed aggregates. Docs
    * shorter than n produce NULL for that signal in both engines. All
    * fractions are one IEEE division of exact integers. */
  val repetition = QueryDef("text_repetition",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      def gramCounts(n: Int) = docs
        .filter(size(col("t")) >= n)
        .select(col("doc_id"), explode(expr(shinglesSql("t", n))).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      def topFrac(n: Int, alias: String) = gramCounts(n)
        .groupBy(col("doc_id"))
        .agg((max(col("c")).cast("double") / sum(col("c"))).as(alias))
      val dup5 = gramCounts(5)
        .groupBy(col("doc_id"))
        .agg((sum(when(col("c") > 1, col("c")).otherwise(lit(0L)))
          .cast("double") / sum(col("c"))).as("dup_5gram_frac"))
      docs.select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          ((size(col("t")) - size(array_distinct(col("t")))).cast("double") /
            size(col("t"))).as("dup_token_frac"))
        .join(topFrac(2, "top_bigram_frac"), Seq("doc_id"), "left_outer")
        .join(topFrac(3, "top_trigram_frac"), Seq("doc_id"), "left_outer")
        .join(dup5, Seq("doc_id"), "left_outer")
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (
        SELECT doc_id, string_split(text,' ') AS t FROM documents),
      base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t)
          AS dup_token_frac FROM t),
      g2 AS (SELECT doc_id, g, COUNT(*) AS c FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(t)),
            j -> t[j] || ' ' || t[j+1])) AS g
          FROM t WHERE len(t) >= 2) GROUP BY 1, 2),
      top2 AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c)
          AS top_bigram_frac FROM g2 GROUP BY 1),
      g3 AS (SELECT doc_id, g, COUNT(*) AS c FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
            j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2])) AS g
          FROM t WHERE len(t) >= 3) GROUP BY 1, 2),
      top3 AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c)
          AS top_trigram_frac FROM g3 GROUP BY 1),
      g5 AS (SELECT doc_id, g, COUNT(*) AS c FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
            j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2] || ' ' ||
                 t[j+3] || ' ' || t[j+4])) AS g
          FROM t WHERE len(t) >= 5) GROUP BY 1, 2),
      dup5 AS (SELECT doc_id,
          CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c)
          AS dup_5gram_frac FROM g5 GROUP BY 1)
      SELECT doc_id, n_tokens, dup_token_frac, top_bigram_frac,
        top_trigram_frac, dup_5gram_frac
      FROM base LEFT JOIN top2 USING (doc_id) LEFT JOIN top3 USING (doc_id)
        LEFT JOIN dup5 USING (doc_id)
      ORDER BY doc_id"""))

  /** Regex ("BPE-ish") tokenizer variant: letter runs / digit runs /
    * single punctuation — the pre-tokenization split BPE vocabularies use,
    * counted per document alongside the whitespace tokenization. */
  val tokenBpe = QueryDef("text_token_bpe",
    (s, d) => Tables.documents(s, d)
      .withColumn("bpe", expr(
        "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
      .select(col("doc_id"),
        size(col("bpe")).cast("long").as("n_bpe_tokens"),
        size(array_distinct(col("bpe"))).cast("long").as("n_bpe_distinct"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
        AS n_bpe_tokens,
      CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
        AS n_bpe_distinct,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
      FROM documents ORDER BY doc_id"""))

  /** Per-document token statistics. All ratios are single divisions of
    * exact integers → bit-identical in DuckDB. */
  val tokenStats = QueryDef("text_token_stats",
    (s, d) => Tables.documents(s, d)
      .withColumn("t", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_distinct"),
        (expr("aggregate(t, cast(0 as bigint), (a, w) -> a + length(w))")
          .cast("double") / size(col("t"))).as("mean_word_len"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
      CAST(list_sum(list_transform(string_split(text,' '), w -> length(w))) AS DOUBLE)
        / len(string_split(text,' ')) AS mean_word_len
      FROM documents ORDER BY doc_id"""))

  /** Global word count — literally number_count (A1) over tokens. */
  val wordcount = QueryDef("text_wordcount",
    (s, d) => Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")),
    Some("""SELECT w AS word, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split(text,' ')) AS w FROM documents)
      GROUP BY w ORDER BY cnt DESC, word"""))

  /** Quality scoring: type-token ratio, stopword ratio, length saturation,
    * blended into one deterministic score. */
  val quality = QueryDef("text_quality",
    (s, d) => Tables.documents(s, d)
      .withColumn("t", tokens(col("text")))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("ttr", size(array_distinct(col("t"))).cast("double") / col("n"))
      .withColumn("stop_ratio",
        expr("size(filter(t, w -> w IN ('the', 'a')))").cast("double") / col("n"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("ttr"),
        col("stop_ratio"),
        (col("ttr") * 0.3 + (lit(1.0) - col("stop_ratio")) * 0.4 +
          least(lit(1.0), col("n") / lit(100.0)) * 0.3).as("quality"))
      .orderBy(col("doc_id")),
    Some("""WITH q AS (SELECT doc_id,
        CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
          / len(string_split(text,' ')) AS ttr,
        CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS DOUBLE)
          / len(string_split(text,' ')) AS stop_ratio
      FROM documents)
      SELECT doc_id, n_tokens, ttr, stop_ratio,
        ttr*0.3 + (1.0 - stop_ratio)*0.4 +
        least(1.0, n_tokens/100.0)*0.3 AS quality
      FROM q ORDER BY doc_id"""))

  /** Rolling-hash document fingerprint (mod 1e9+7 — portable, overflow-free). */
  val fingerprint = QueryDef("text_fingerprint",
    (s, d) => { graft.functions.HashExpressions.register(s); Tables.documents(s, d) }
      .select(col("doc_id"), rollHash("text").as("fp"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(text,''), c -> CAST(unicode(c) AS BIGINT))),
        (h,c) -> (h*31+c) % 1000000007) AS fp
      FROM documents ORDER BY doc_id"""))

  /** Corpus-profile language ID: per language, take the 10 most
    * *distinctive* words (by relative-frequency ratio, exact-integer
    * arithmetic until one final division); classify each document by how
    * many signature words it contains (integer score — no FP in the
    * argmax), tie-broken by language name.
    *
    * Two-pass heuristic n-gram langid re-expressed as joins/aggregations —
    * profiles are a tiny broadcast side at any corpus size.
    */
  val langid = QueryDef("text_langid",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // tok/lw are read by multiple branches; recomputing them pipelines
      // inside whole-stage codegen and measures FASTER than .cache()
      // (caching forces a materialization barrier and, invoked per call,
      // leaks entries the session never unpersists)
      val tok = docs.select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("w"))
      val lw = tok.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      val lt = lw.groupBy(col("lang")).agg(sum(col("c")).as("t"))
      val gw = lw.groupBy(col("w")).agg(sum(col("c")).as("cg"))
      val gt = lw.agg(sum(col("c")).as("tg"))
      val ratio = lw.join(lt, "lang").join(gw, "w").crossJoin(broadcast(gt))
        .select(col("lang"), col("w"),
          ((col("c").cast("double") / col("t")) /
            (col("cg").cast("double") / col("tg"))).as("ratio"))
      val wSig = Window.partitionBy(col("lang"))
        .orderBy(col("ratio").desc, col("w"))
      val sig = ratio.withColumn("rn", row_number().over(wSig))
        .filter(col("rn") <= 10).select(col("lang").as("sig_lang"), col("w"))
      val docWords = tok.select(col("doc_id"), col("w")).distinct()
      val scores = docWords.join(broadcast(sig), "w")
        .groupBy(col("doc_id"), col("sig_lang")).agg(count(lit(1)).as("score"))
      val langs = sig.select(col("sig_lang")).distinct()
      val full = docs.select(col("doc_id")).crossJoin(broadcast(langs))
        .join(scores, Seq("doc_id", "sig_lang"), "left_outer")
        .na.fill(0L, Seq("score"))
      val wBest = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("sig_lang"))
      full.withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("sig_lang").as("pred_lang"), col("score"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text,' ')) AS w FROM documents),
      lw AS (SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY 1,2),
      lt AS (SELECT lang, SUM(c) AS t FROM lw GROUP BY 1),
      gw AS (SELECT w, SUM(c) AS cg FROM lw GROUP BY 1),
      gt AS (SELECT SUM(c) AS tg FROM lw),
      ratio AS (SELECT lang, w,
          (CAST(c AS DOUBLE)/t) / (CAST(cg AS DOUBLE)/tg) AS ratio
        FROM lw JOIN lt USING(lang) JOIN gw USING(w), gt),
      sig AS (SELECT lang AS sig_lang, w FROM (
          SELECT lang, w, ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY ratio DESC, w) AS rn FROM ratio) WHERE rn <= 10),
      docwords AS (SELECT DISTINCT doc_id, w FROM tok),
      scores AS (SELECT doc_id, sig_lang, COUNT(*) AS score
        FROM docwords JOIN sig USING(w) GROUP BY 1,2),
      langs AS (SELECT DISTINCT sig_lang FROM sig),
      full_scores AS (SELECT d.doc_id, l.sig_lang,
          COALESCE(s.score, 0) AS score
        FROM (SELECT doc_id FROM documents) d
        CROSS JOIN langs l
        LEFT JOIN scores s ON s.doc_id = d.doc_id AND s.sig_lang = l.sig_lang)
      SELECT doc_id, sig_lang AS pred_lang, score FROM (
        SELECT doc_id, sig_lang, score, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY score DESC, sig_lang) AS rn
        FROM full_scores) WHERE rn = 1 ORDER BY doc_id"""))
}
