package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, Tables}

/** Embedding-space curation operators that COMPOSE the catalog's proven
  * kernels into the two remaining classic shapes:
  *
  *   - `dedup_semantic` — SemDeDup-style semantic deduplication (cluster
  *     the embedding space, then prune near-duplicates WITHIN a cluster
  *     only). Reference analog: none — pure north-star (BASELINE.json
  *     dedup family). The published recipe is k-means + within-cluster
  *     pairwise cosine; the quadratic "within cluster" step is made
  *     scale-safe here by intersecting the cluster key with the same
  *     6-bit hyperplane bucket the LSH near-dup path uses, so candidate
  *     generation is a two-key equi-join — never all-pairs, not even
  *     within one cluster. (In production k scales with the corpus so
  *     clusters stay bounded; the plan shape here is k-agnostic.)
  *   - `emb_pq_topk` — product-quantization ANN (the third classic ANN
  *     index next to the catalog's LSH and IVF): split each vector into
  *     M=16 contiguous 4-dim subvectors, code each against a per-subspace
  *     codebook, score every vector by asymmetric distance computation
  *     (ADC) — the query's exact dot product with each coded centroid,
  *     summed across subspaces — then re-rank the ADC shortlist with
  *     exact dot products (the standard two-stage deployment).
  *
  * Float discipline (SURVEY.md §7.4): every dot product is the native
  * codegen `dot_f64` left-to-right double fold, mirrored in DuckDB by
  * `list_sum(list_transform(...))`; squared L2 is expanded as
  * ‖x‖² − 2·x·c + ‖c‖² with centroid-id tie-breaks, exactly as in
  * [[Clustering.kmeansAssign]]; the ADC sum folds subspace partials in
  * subspace order (`sort_array` + `aggregate`, the [[TextScoring]]
  * entropy convention), so scores are bit-identical across engines and
  * layouts.
  *
  * Scale stance: seed centroids (8 rows), PQ codebooks (16×32 rows), the
  * query's ADC table, and the LIMIT-bounded re-rank shortlist are the
  * only broadcasts — each bounded by a key-range filter or an explicit
  * limit (reviewed in CatalogPlanSweepSpec); the big side never shuffles
  * for assignment — one broadcast join + a (vec_id[, m])-partitioned
  * window.
  */
object Semantic {

  def all: Seq[QueryDef] = Seq(semanticDedup, pqTopK)

  /** Nearest-of-8-seed-centroid assignment (the [[Clustering]] kernel)
    * plus the shared LSH bucket id and the L2 norm — the per-vector
    * state both SemDeDup stages need, computed in one pass. */
  private def assigned(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        expr("dot_f64(embedding, embedding)").as("xx"),
        expr(Similarity.bucketExpr).as("bucket"))
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
        col("xx").as("cc"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
    e.crossJoin(broadcast(seeds))
      .withColumn("d2",
        col("xx") - lit(2.0) * expr("dot_f64(embedding, cvec)") + col("cc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), sqrt(col("xx")).as("nrm"),
        col("bucket"), col("cid").as("cluster"))
  }

  /** SemDeDup: drop every vector with a cosine ≥ 0.4 neighbor of smaller
    * vec_id in the SAME k-means cluster (keep-first, like the MinHash
    * path); candidates additionally share the 6-bit hyperplane bucket so
    * the pair join is equi-keyed on (cluster, bucket) — the documented
    * recall trade every web-scale near-dup pipeline makes. Output: one
    * row per dropped vector with its keeper, cluster, and the strongest
    * similarity that condemned it. */
  val semanticDedup = QueryDef("dedup_semantic",
    (s, d) => {
      val a = assigned(s, d)
      a.alias("x").join(a.alias("y"),
          col("x.cluster") === col("y.cluster") &&
            col("x.bucket") === col("y.bucket") &&
            col("x.vec_id") < col("y.vec_id"))
        .withColumn("cosine",
          expr("dot_f64(x.embedding, y.embedding)") /
            (col("x.nrm") * col("y.nrm")))
        .filter(col("cosine") >= 0.4)
        .groupBy(col("y.vec_id").as("vec_id"))
        .agg(min(col("x.vec_id")).as("kept_as"),
          max(col("x.cluster")).as("cluster"),
          max(col("cosine")).as("max_cos"))
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding,
        list_sum(list_transform(range(1, len(embedding)+1),
          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
          AS xx,
        ${Similarity.bucketSqlDuck("embedding")} AS bucket
        FROM embeddings),
      seeds AS (SELECT vec_id AS cid, embedding AS cvec, xx AS cc
        FROM e WHERE vec_id < 8),
      dist AS (SELECT x.vec_id, x.embedding, x.xx, x.bucket, s.cid,
          x.xx - 2 * list_sum(list_transform(range(1, len(x.embedding)+1),
            i -> CAST(x.embedding[i] AS DOUBLE) * CAST(s.cvec[i] AS DOUBLE)))
            + s.cc AS d2
        FROM e x CROSS JOIN seeds s),
      asg AS (SELECT vec_id, embedding, sqrt(xx) AS nrm, bucket,
          cid AS cluster FROM (
        SELECT vec_id, embedding, xx, bucket, cid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dist)
        WHERE rn = 1),
      pairs AS (SELECT x.vec_id AS a, y.vec_id AS b, y.cluster AS cluster,
          list_sum(list_transform(range(1, len(x.embedding)+1),
            i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
            / (x.nrm * y.nrm) AS cosine
        FROM asg x JOIN asg y ON x.cluster = y.cluster
          AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
      SELECT b AS vec_id, MIN(a) AS kept_as, MAX(cluster) AS cluster,
        MAX(cosine) AS max_cos
      FROM pairs WHERE cosine >= 0.4
      GROUP BY b ORDER BY vec_id"""))

  /** Product-quantization top-k with exact re-rank — the production
    * two-stage ANN shape: M=16 subspaces × 4 dims, K=32 sub-centroids
    * per subspace (the subvectors of vec_id 0..31 — deterministic
    * seeding, as for IVF), query = vec_id 0. Stage 1 ranks EVERY vector
    * by asymmetric distance computation over its 16 one-byte codes (at
    * 100 TB the codes relation — 16 bytes/vector vs 256 — is what fits
    * in memory); stage 2 re-ranks only the 50-candidate ADC shortlist
    * against raw vectors with exact dot products. Measured recall@10 vs
    * exact search, mean over 20 queries: 0.92 / 0.87 / 0.79 at
    * sf0.001/0.01/0.1 (ADC alone: ~0.5 — the corpus's near-uniform
    * vectors make quantization noise comparable to true dot spread;
    * re-ranking is how real deployments buy that back). */
  val pqTopK = QueryDef("emb_pq_topk",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val e = Tables.embeddings(s, d)
      val subCols = (0 until 16).map(m =>
        expr(s"slice(embedding, ${m * 4 + 1}, 4)"))
      val subs = e
        .select(col("vec_id"), posexplode(array(subCols: _*)).as(Seq("m", "sub")))
        .withColumn("xx", expr("dot_f64(sub, sub)"))
      val book = subs.filter(col("vec_id") < 32)
        .select(col("m").as("bm"), col("vec_id").as("cid"),
          col("sub").as("cvec"), col("xx").as("cc"))
      val w = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("d2"), col("cid"))
      val codes = subs.join(broadcast(book), col("m") === col("bm"))
        .withColumn("d2",
          col("xx") - lit(2.0) * expr("dot_f64(sub, cvec)") + col("cc"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("cid").as("code"))
      val adc = subs.filter(col("vec_id") === 0)
        .select(col("m").as("qm"), col("sub").as("qsub"))
        .join(book, col("qm") === col("bm"))
        .select(col("qm").as("am"), col("cid").as("acode"),
          expr("dot_f64(qsub, cvec)").as("p"))
      val shortlist = codes.filter(col("vec_id") =!= 0)
        .join(broadcast(adc),
          col("m") === col("am") && col("code") === col("acode"))
        .groupBy(col("vec_id"))
        .agg(sort_array(collect_list(struct(col("m"), col("p")))).as("ps"))
        .select(col("vec_id"),
          expr("aggregate(ps, 0d, (a, x) -> a + x.p)").as("adc_score"))
        .orderBy(col("adc_score").desc, col("vec_id"))
        .limit(50)
      val qvec = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.select(col("vec_id"), col("embedding"))
        .join(broadcast(shortlist), "vec_id")
        .crossJoin(broadcast(qvec))
        .select(col("vec_id"), expr("dot_f64(embedding, qe)").as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    },
    Some("""WITH subs AS (SELECT vec_id, m,
        embedding[m*4+1 : m*4+4] AS sub
        FROM embeddings, (SELECT unnest(range(16)) AS m)),
      subsx AS (SELECT vec_id, m, sub,
        list_sum(list_transform(sub,
          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS xx
        FROM subs),
      book AS (SELECT m AS bm, vec_id AS cid, sub AS cvec, xx AS cc
        FROM subsx WHERE vec_id < 32),
      codes AS (SELECT vec_id, m, cid AS code FROM (
        SELECT s.vec_id, s.m, b.cid, ROW_NUMBER() OVER (
          PARTITION BY s.vec_id, s.m ORDER BY
            s.xx - 2 * list_sum(list_transform(range(1, len(s.sub)+1),
              i -> CAST(s.sub[i] AS DOUBLE) * CAST(b.cvec[i] AS DOUBLE)))
              + b.cc,
            b.cid) AS rn
        FROM subsx s JOIN book b ON s.m = b.bm) WHERE rn = 1),
      adc AS (SELECT q.m AS am, b.cid AS acode,
        list_sum(list_transform(range(1, len(q.sub)+1),
          i -> CAST(q.sub[i] AS DOUBLE) * CAST(b.cvec[i] AS DOUBLE))) AS p
        FROM subsx q JOIN book b ON q.m = b.bm WHERE q.vec_id = 0),
      shortlist AS (SELECT vec_id, list_sum(list(p ORDER BY m)) AS adc_score
        FROM codes JOIN adc ON codes.m = adc.am AND codes.code = adc.acode
        WHERE vec_id <> 0
        GROUP BY vec_id
        ORDER BY adc_score DESC, vec_id LIMIT 50),
      qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      SELECT s.vec_id,
        list_sum(list_transform(range(1, len(e.embedding)+1),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
          AS score
      FROM shortlist s JOIN embeddings e USING (vec_id) CROSS JOIN qv
      ORDER BY score DESC, vec_id LIMIT 10"""))
}
