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
    Seq(topBigrams, piiScrub, stratifiedSample, invertedIndex)

  /** Inverted index (word → posting list): document frequency plus the
    * first 20 postings, serialized as a string so the result stays
    * hashable for the driver's comparator. The classic MapReduce output
    * shape — explode, distinct, one grouped aggregation; posting lists
    * are truncated deterministically (sorted, first 20), which is also the
    * right scale behavior (full postings for stopwords would be corpus-
    * sized rows). */
  val invertedIndex = QueryDef("text_inverted_index",
    (s, d) => Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("w"), col("doc_id"))
      .distinct()
      .groupBy(col("w"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",", transform(
          slice(array_sort(collect_list(col("doc_id"))), 1, 20),
          x => x.cast("string"))).as("postings"))
      .orderBy(col("w")),
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
