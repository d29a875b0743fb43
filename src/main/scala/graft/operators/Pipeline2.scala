package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Third wave of pipeline operators: event funnel analysis, corpus-rarity
  * scoring, CDC-style latest-per-key compaction, and the dedup *apply*
  * step that materializes the kept corpus.
  *
  * Scale stance: the funnel is one shuffle on user_id then per-user min
  * timestamps (tiny state per key); rarity joins token occurrences to a
  * corpus-frequency table that's broadcast-sized for any realistic
  * vocabulary; latest-per-key is the standard window top-1 compaction that
  * log-structured ingestion runs continuously; dedup-apply is an anti-join
  * of the corpus against the (small) drop list.
  */
object Pipeline2 {

  def all: Seq[QueryDef] =
    Seq(funnel, rarity, latestPerKey, dedupApply, retention, unigramLogprob,
      survivorQuality)

  /** Quality-aware dedup survivorship — [[dedupApply]] keeps the
    * min-doc_id representative of every duplicate cluster; real curation
    * pipelines keep the BEST one (the copies differ in truncation,
    * boilerplate, encoding damage — arrival order is not a quality
    * signal). Per cluster, the survivor is the member with the highest
    * `text_quality` score, ties to the smaller doc_id.
    *
    * The cluster key is the VOCABULARY fingerprint (sorted distinct
    * tokens), not the sorted token multiset: every term of the quality
    * score (type-token ratio, stopword ratio, length) is
    * permutation-invariant, so a multiset key would make all cluster
    * members score identically and the policy would silently collapse
    * to min-id keeping — same-support/different-repetition is the
    * near-dup class where a quality keeper actually changes the answer
    * (truncated or stutter-damaged copies of one source).
    *
    * The quality relation is literally `TextAnalysis.quality.fn` — the
    * oracle-proven entry reused as a building block, so the two entries'
    * scores CANNOT drift apart (and the oracle here re-spells the same
    * formula text). Plan: one shuffle on the cluster key; the per-cluster
    * argmax is a rank-1 window that Spark executes with the heap-based
    * WindowGroupLimit pre-filter (no full sort of cluster members),
    * filtered on the raw rank before any cast. */
  val survivorQuality = QueryDef("dedup_survivor_quality",
    (s, d) => {
      val q = TextAnalysis.quality.fn(s, d)
        .select(col("doc_id"), col("quality"))
      val w = Window.partitionBy(col("norm"))
        .orderBy(col("quality").desc, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("norm",
          array_join(array_sort(array_distinct(tokens(col("text")))), " "))
        .join(q, "doc_id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("quality"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH q AS (SELECT doc_id, lang, n_chars,
        array_to_string(list_sort(list_distinct(string_split(text,' '))),' ') AS norm,
        CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
            / len(string_split(text,' ')) * 0.3 +
          (1.0 - CAST(len(list_filter(string_split(text,' '),
              w -> w IN ('the','a'))) AS DOUBLE)
            / len(string_split(text,' '))) * 0.4 +
          least(1.0, CAST(len(string_split(text,' ')) AS BIGINT)/100.0) * 0.3
          AS quality
      FROM documents)
      SELECT doc_id, lang, n_chars, quality FROM (
        SELECT doc_id, lang, n_chars, quality, ROW_NUMBER() OVER (
          PARTITION BY norm ORDER BY quality DESC, doc_id) AS rn
        FROM q)
      WHERE rn = 1 ORDER BY doc_id"""))

  /** Unigram language-model score (the standard statistical quality
    * filter for LM corpora): each document's log-probability under the
    * corpus's own unigram distribution, `Σ_pos ln(f(w_pos) / N)`. Low
    * scores flag token streams that are implausible for the corpus —
    * the cheap first-pass twin of model-based perplexity filtering.
    *
    * Scale shape: token explode ⋈ frequency table. The frequency side is
    * vocabulary-sized — NOT bounded by construction — so it carries no
    * broadcast hint: AQE's runtime stats convert the join to broadcast
    * while the vocabulary is small and correctly keep the shuffle join
    * once it outgrows executor memory (the catalog-wide
    * broadcast-boundedness sweep enforces that no hinted broadcast is
    * data-scaled). Per-doc state bounded by document length. Float
    * discipline:
    * the per-token terms are summed in POSITION order via a sorted fold,
    * and the log is the custom `math_ln` expression
    * ([[graft.functions.MathLog]]) — `java.lang.Math.log` is bit-equal
    * to DuckDB's libm `ln` on every distinct (f, N) ratio in all three
    * corpora (cold AND C2-compiled), while Spark's own `log`
    * (`StrictMath.log`, fdlibm) differs by 1 ulp on one of them. The
    * oracle gate re-checks the agreement on every run. */
  val unigramLogprob = QueryDef("text_unigram_logprob",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))))
        .toDF("doc_id", "pos", "w")
      val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("f"))
      val tot = tok.agg(count(lit(1)).as("n_total"))
      tok.join(freq, "w")
        .crossJoin(broadcast(tot))
        .withColumn("term",
          expr("math_ln(CAST(f AS DOUBLE) / CAST(n_total AS DOUBLE))"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(
          struct(col("pos").as("p"), col("term").as("t")))).as("ts"))
        .select(col("doc_id"),
          size(col("ts")).cast("long").as("n_tokens"),
          expr("aggregate(ts, 0d, (a, x) -> a + x.t)").as("logprob"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (SELECT doc_id, i - 1 AS pos, w FROM (
        SELECT doc_id, unnest(string_split(text,' ')) AS w,
          unnest(range(1, len(string_split(text,' ')) + 1)) AS i
        FROM documents)),
      freq AS (SELECT w, COUNT(*) AS f FROM tok GROUP BY w),
      tot AS (SELECT COUNT(*) AS n FROM tok)
      SELECT doc_id, COUNT(*) AS n_tokens,
        list_sum(list(ln(CAST(f AS DOUBLE) / CAST(n AS DOUBLE))
          ORDER BY pos)) AS logprob
      FROM tok JOIN freq USING (w) CROSS JOIN tot
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Cohort retention: per first-seen-day cohort, users active again
    * exactly 1 / within 7 days later. Two shuffles (user grouping, then
    * cohort grouping over a users×days distinct relation) — the standard
    * product-analytics shape, exact integers throughout. */
  val retention = QueryDef("ev_retention",
    (s, d) => {
      val ev = Tables.events(s, d)
      val firstDay = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("d0"))
      val activeDays = ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      firstDay.join(activeDays, "user_id")
        .withColumn("age", datediff(col("day"), col("d0")))
        .groupBy(col("d0"))
        .agg(countDistinct(col("user_id")).as("cohort_size"),
          countDistinct(when(col("age") === 1, col("user_id"))).as("d1"),
          countDistinct(when(col("age").between(1, 7), col("user_id")))
            .as("d7"))
        .orderBy(col("d0"))
    },
    Some("""WITH first_day AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
        FROM events GROUP BY user_id),
      active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      SELECT d0, COUNT(DISTINCT user_id) AS cohort_size,
        COUNT(DISTINCT CASE WHEN datediff('day', d0, day) = 1
          THEN user_id END) AS d1,
        COUNT(DISTINCT CASE WHEN datediff('day', d0, day) BETWEEN 1 AND 7
          THEN user_id END) AS d7
      FROM first_day JOIN active USING (user_id)
      GROUP BY d0 ORDER BY d0"""))

  /** Conversion funnel view → click → purchase: per stage, users who
    * reached it in order (each stage's first occurrence strictly after the
    * previous stage's). Integer counts — exact everywhere. */
  val funnel = QueryDef("ev_funnel",
    (s, d) => {
      val ev = Tables.events(s, d)
      def firstTs(t: String) = min(when(col("event_type") === t, col("ts")))
      val perUser = ev.groupBy(col("user_id"))
        .agg(firstTs("view").as("t_view"), firstTs("click").as("t_click"),
          firstTs("purchase").as("t_purchase"))
      perUser.agg(
        count(col("t_view")).as("n_view"),
        count(when(col("t_click") > col("t_view"), 1)).as("n_view_click"),
        count(when(col("t_click") > col("t_view") &&
          col("t_purchase") > col("t_click"), 1)).as("n_view_click_purchase"))
    },
    Some("""WITH per_user AS (SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
      SELECT COUNT(t_view) AS n_view,
        COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
        COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
          AS n_view_click_purchase
      FROM per_user"""))

  /** Token-rarity scoring (data-quality signal for LM corpora): per
    * document, the mean and minimum corpus frequency of its tokens —
    * integer sums and one final division, exact in both engines. */
  val rarity = QueryDef("text_rarity",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("f"))
      tok.join(freq, "w")
        .groupBy(col("doc_id"))
        .agg((sum(col("f")).cast("double") / count(lit(1))).as("mean_freq"),
          min(col("f")).as("min_freq"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
        FROM documents),
      freq AS (SELECT w, COUNT(*) AS f FROM tok GROUP BY w)
      SELECT doc_id, CAST(SUM(f) AS DOUBLE) / COUNT(*) AS mean_freq,
        MIN(f) AS min_freq
      FROM tok JOIN freq USING (w) GROUP BY doc_id ORDER BY doc_id"""))

  /** CDC compaction: latest order per customer (by date, then key) — the
    * window top-1 every log-structured table maintenance job runs. */
  val latestPerKey = QueryDef("q44_latest_per_key",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderstatus"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders)
      WHERE rn = 1 ORDER BY o_custkey"""))

  /** Dedup apply: the corpus with exact duplicates dropped — keep the
    * min-doc_id representative of every normalized-text group (the
    * materialization step downstream training jobs consume). Anti-join
    * shape: corpus minus the drop list. */
  val dedupApply = QueryDef("dedup_apply",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val keepers = docs
        .withColumn("norm", array_join(array_sort(tokens(col("text"))), " "))
        .groupBy(col("norm")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      docs.join(keepers, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id IN (SELECT MIN(doc_id) FROM (
        SELECT doc_id,
          array_to_string(list_sort(string_split(text,' ')),' ') AS norm
        FROM documents) GROUP BY norm)
      ORDER BY doc_id"""))
}
