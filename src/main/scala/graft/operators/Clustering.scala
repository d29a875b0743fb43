package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** Embedding clustering primitives: the k-means assignment step (the same
  * kernel the IVF ANN index in [[Similarity]] relies on — IVF *is* assign
  * + per-cell search).
  *
  * Scale stance: centroids are a k-row broadcast; assignment is a
  * broadcast nested-loop over the embedding table with the distance
  * computed by the native codegen `dot_f64` expression — no shuffle of
  * the big side at all. Squared L2 is expanded as ‖x‖² − 2·x·c + ‖c‖² so
  * every term is a left-to-right double fold (the convention the DuckDB
  * oracle mirrors bit-exactly); a full Lloyd's iteration would recompute
  * centroids with one hash-agg per dimension-block, same shapes.
  */
object Clustering {

  def all: Seq[QueryDef] = Seq(kmeansAssign, silhouette)

  /** Simplified (centroid-based) silhouette per vector — the cluster
    * QUALITY measure beside [[kmeansAssign]]'s assignment: a = squared
    * distance to the own (nearest) centroid, b = squared distance to the
    * best OTHER centroid, sil = (b − a) / max(a, b) ∈ [−1, 1]. The exact
    * silhouette is an all-pairs sum per vector — O(N²) and never the
    * plan you'd run; the centroid form is the standard linear surrogate
    * (it is what sklearn's `silhouette` becomes when medoids collapse to
    * centroids) and needs only the SAME broadcast distance relation the
    * assignment step already computes: rank-2 instead of rank-1.
    *
    * Plan: broadcast k-row seeds, one codegen distance projection, one
    * vec_id-partitioned rank-≤2 window; the per-vector pivot agg reuses
    * the window's hash partitioning (no second shuffle). d2 can go
    * microscopically negative from cancellation when x ≈ c — the IEEE
    * tree is identical in both engines, so the oracle hash still
    * matches; the 0-guard covers duplicate-centroid ties. */
  val silhouette = QueryDef("emb_silhouette",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          expr("dot_f64(embedding, embedding)").as("xx"))
      val seeds = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          col("xx").as("cc"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("cid"))
      e.crossJoin(broadcast(seeds))
        .withColumn("d2",
          col("xx") - lit(2.0) * expr("dot_f64(embedding, cvec)") + col("cc"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .groupBy(col("vec_id"))
        .agg(max(when(col("rn") === 1, col("cid"))).as("cluster"),
          max(when(col("rn") === 1, col("d2"))).as("a2"),
          max(when(col("rn") === 2, col("d2"))).as("b2"))
        .select(col("vec_id"), col("cluster"),
          when(greatest(col("a2"), col("b2")) === 0.0, lit(0.0))
            .otherwise((col("b2") - col("a2")) /
              greatest(col("a2"), col("b2"))).as("sil"))
        .orderBy(col("vec_id"))
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
      r AS (SELECT vec_id, cid, d2, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY d2, cid) AS rn FROM dist),
      p AS (SELECT vec_id,
          max(CASE WHEN rn = 1 THEN cid END) AS cluster,
          max(CASE WHEN rn = 1 THEN d2 END) AS a2,
          max(CASE WHEN rn = 2 THEN d2 END) AS b2
        FROM r WHERE rn <= 2 GROUP BY vec_id)
      SELECT vec_id, cluster,
        CASE WHEN greatest(a2, b2) = 0 THEN 0.0
          ELSE (b2 - a2) / greatest(a2, b2) END AS sil
      FROM p ORDER BY vec_id"""))

  /** Assign every embedding to the nearest of k=8 seed centroids (the
    * vectors with vec_id 0..7 — deterministic seeding), with squared-L2
    * distance and centroid-id tie-break. */
  val kmeansAssign = QueryDef("emb_kmeans_assign",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          expr("dot_f64(embedding, embedding)").as("xx"))
      val seeds = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          col("xx").as("cc"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("cid"))
      e.crossJoin(broadcast(seeds))
        .withColumn("d2",
          col("xx") - lit(2.0) * expr("dot_f64(embedding, cvec)") + col("cc"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid").as("cluster"), col("d2").as("dist2"))
        .orderBy(col("vec_id"))
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
        FROM e x CROSS JOIN seeds s)
      SELECT vec_id, cid AS cluster, d2 AS dist2 FROM (
        SELECT vec_id, cid, d2, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY d2, cid) AS rn FROM dist)
      WHERE rn = 1 ORDER BY vec_id"""))
}
