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

  def all: Seq[QueryDef] = Seq(curationE2E)

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
        sets AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
            j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2])) AS ss
          FROM s1 WHERE len(t) >= 3),
        th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(sg, ''), c -> CAST(unicode(c) AS BIGINT))),
            (h, c) -> (h*31+c) % 1000000007) AS th
          FROM (SELECT doc_id, unnest(ss) AS sg FROM sets)),
        mh AS (SELECT doc_id, i, MIN(((2*i+1)*th + (7*i+3)) % 1000000007) AS mh
          FROM th, range(0, 16) r(i) GROUP BY doc_id, i),
        bands AS (SELECT doc_id, CAST(i // 4 AS INT) AS band,
            array_to_string(list_transform(list_sort(list({'i': i, 'mh': mh})),
              x -> CAST(x.mh AS VARCHAR)), ',') AS bkey
          FROM mh GROUP BY doc_id, band),
        cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        pairs AS (SELECT a, b FROM cands
          JOIN sets sa ON sa.doc_id = a JOIN sets sb ON sb.doc_id = b
          WHERE CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE) /
            (len(sa.ss) + len(sb.ss) - len(list_intersect(sa.ss, sb.ss))) >= 0.5),
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
