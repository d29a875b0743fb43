package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** k-center coreset selection (Gonzalez' greedy 2-approximation) — the
  * COVERAGE-first subset picker beside [[Clustering]]'s cap-per-cluster
  * balancer (`curate_cluster_balanced`): instead of capping dense
  * regions, greedily pick the point FARTHEST from everything picked so
  * far, so k points span the embedding space's extremes — the classic
  * seed for diverse eval sets, annotation batches, and k-means++-style
  * initialization, with the provable 2× bound on covering radius.
  *
  * Round r: next center = argmax over the corpus of min squared-L2
  * distance to the r−1 chosen centers (ties → smallest vec_id). The
  * selection sequence's distances are the covering-radius curve — each
  * d² is the radius the corpus would be covered at if selection
  * stopped there (monotone non-increasing, spec-asserted).
  *
  * Determinism/portability: embeddings cast to double ONCE, d² =
  * |x|² + |c|² − 2·x·c with both norms and the dot from the
  * `dot_f64` in-order fold (the [[Similarity]] Lloyd convention —
  * DuckDB folds the identical tree), MIN over centers is order-free,
  * and the argmax is an integer-tie-broken top-1.
  *
  * Scale shape: k−1 rounds, each ONE broadcast-join scan (centers are
  * ≤ k×D doubles of driver state — the Lloyd/BPE-argmax precedent) +
  * a global top-1 (TakeOrderedAndProject). Nothing is ever pairwise
  * in the corpus. At 100 TB the standard practice this implements
  * runs the greedy on a uniform pre-sample (coverage degrades by at
  * most the sample's covering radius); the operator is
  * sample-size-agnostic — feed it the sampled relation. */
object Coreset {

  def all: Seq[QueryDef] = Seq(kCenter)

  /** Number of centers — bounded driver state, like [[Similarity.IvfK]]. */
  val K = 8

  /** The greedy driver loop over an arbitrary `(vec_id, embedding)`
    * frame; returns one row per selection round. */
  def kCenterOf(s: SparkSession, e0: DataFrame, k: Int): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    import s.implicits._
    val e = e0.select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("emb"))
      .withColumn("n2", expr("dot_f64(emb, emb)"))
    val seed = e.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("emb"), col("n2")).collect()
    var centers = seed.toSeq.map(r =>
      (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    var picks = centers.map(c => (1, c._1, 0.0))
    if (centers.nonEmpty) {
      for (r <- 2 to k) {
        val cdf = broadcast(centers.toDF("c_id", "c_emb", "c_n2"))
        val next = e.crossJoin(cdf)
          .withColumn("d2",
            col("n2") + col("c_n2") - lit(2.0) * expr("dot_f64(emb, c_emb)"))
          .groupBy(col("vec_id"))
          .agg(min(col("d2")).as("md"), first(col("emb")).as("emb"),
            first(col("n2")).as("n2"))
          .orderBy(col("md").desc, col("vec_id"))
          .limit(1)
          .collect()
        if (next.nonEmpty) {
          val row = next(0)
          centers :+= ((row.getLong(0), row.getSeq[Double](2), row.getDouble(3)))
          picks :+= ((r, row.getLong(0), row.getDouble(1)))
        }
      }
    }
    picks.toDF("round", "vec_id", "d2").orderBy(col("round"))
  }

  /** The greedy loop unrolled into DuckDB CTEs from the same constants
    * (the [[Similarity]] `ivfTrainSqlDuck` convention) so the two
    * spellings cannot drift. */
  private def kCenterSqlDuck(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH e2 AS (SELECT vec_id,
        list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb,
        list_sum(list_transform(embedding,
          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS n2
        FROM embeddings),
      sel1 AS (SELECT 1 AS round, vec_id, CAST(0 AS DOUBLE) AS d2
        FROM e2 ORDER BY vec_id LIMIT 1),
      c1 AS (SELECT vec_id FROM sel1)"""
    for (r <- 2 to k) {
      sb ++= s""",
      m${r - 1} AS (SELECT x.vec_id,
          MIN(x.n2 + c.n2 - 2 * list_sum(list_transform(
            range(1, len(x.emb)+1), i -> x.emb[i] * c.emb[i]))) AS md
        FROM e2 x CROSS JOIN
          (SELECT * FROM e2 WHERE vec_id IN (SELECT vec_id FROM c${r - 1})) c
        GROUP BY x.vec_id),
      sel$r AS (SELECT $r AS round, vec_id, md AS d2 FROM m${r - 1}
        ORDER BY md DESC, vec_id LIMIT 1),
      c$r AS (SELECT vec_id FROM c${r - 1}
        UNION ALL SELECT vec_id FROM sel$r)"""
    }
    sb ++= (2 to k).foldLeft("\n      SELECT round, vec_id, d2 FROM sel1")(
      (acc, r) => acc + s"\n      UNION ALL SELECT round, vec_id, d2 FROM sel$r")
    sb ++= "\n      ORDER BY round"
    sb.toString
  }

  val kCenter = QueryDef("curate_coreset_kcenter",
    (s, d) => kCenterOf(s, Tables.embeddings(s, d), K),
    Some(kCenterSqlDuck(K)),
    bench = false) // k driver-round actions — correctness exemplar; the
                   // per-round scan cost is annIvfTrained's, already benched
}
