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

  def all: Seq[QueryDef] = Seq(kmeansAssign, silhouette, driftPsi,
    normHistogram)

  /** Embedding-norm histogram — the cheapest encoder-health diagnostic
    * (norm collapse, norm drift after a re-embed, and un-normalized
    * outliers all show up here before any similarity math does): 20
    * equi-width buckets over ‖x‖, the `stat_histogram` convention —
    * bucket formula spelled with the SAME operation order in both
    * engines (subtract, scale by 20, divide, floor; min/max from one
    * global aggregate), norms from the in-order `dot_f64` fold under
    * an IEEE-exact sqrt. One scan + one 20-group hash agg. */
  val normHistogram = QueryDef("emb_norm_histogram",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .select(expr("sqrt(dot_f64(embedding, embedding))").as("v"))
      val mm = e.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n"))
      e.crossJoin(broadcast(mm))
        .withColumn("bucket",
          least(lit(19L), floor((col("v") - col("mn")) * 20.0 /
            greatest(col("mx") - col("mn"), lit(1e-12))).cast("long")))
        .groupBy(col("bucket"))
        .agg(first(col("mn")).as("mn"), first(col("mx")).as("mx"),
          count(lit(1)).as("n"))
        .select(col("bucket"),
          (col("mn") + col("bucket").cast("double") *
            (col("mx") - col("mn")) / 20.0).as("lo"),
          col("n"))
        .orderBy(col("bucket"))
    },
    Some("""WITH e AS (SELECT sqrt(list_sum(list_transform(
          range(1, len(embedding)+1),
          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
          AS v
        FROM embeddings),
      mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx, COUNT(*) AS n FROM e),
      b AS (SELECT LEAST(19, CAST(FLOOR((v - mn) * 20.0 /
          GREATEST(mx - mn, 1e-12)) AS BIGINT)) AS bucket, mn, mx
        FROM e CROSS JOIN mm)
      SELECT bucket, mn + CAST(bucket AS DOUBLE) * (mx - mn) / 20.0 AS lo,
        COUNT(*) AS n
      FROM b GROUP BY bucket, mn, mx ORDER BY bucket"""))

  /** Embedding-distribution drift monitor — `profile_drift`'s PSI
    * discipline applied to the EMBEDDING space: quantize both snapshots
    * onto the same k=8 coarse cells (the [[kmeansAssign]] kernel — the
    * IVF coarse quantizer doubling as a histogram), then one add-1-
    * smoothed PSI term per cell. This is how a feature-store watches
    * "did the encoder or the corpus shift" without pairwise anything:
    * a cell whose occupancy moves carries the alert, and the cells are
    * the SAME broadcast centroids for both sides by construction.
    * Snapshots here are the even/odd vec_id halves (a null split — PSI
    * ≈ 0, the calibration the spec pins; a production deployment feeds
    * yesterday/today). All counts integer-exact; p's are single
    * divisions; the log is the bit-parity `math_ln`; terms emitted as
    * rows (k-bounded), never float-summed by the engine. */
  val driftPsi = QueryDef("emb_drift_psi",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      graft.functions.HashExpressions.register(s)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          expr("dot_f64(embedding, embedding)").as("xx"))
      val seeds = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          col("xx").as("cc"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("cid"))
      val assigned = e.crossJoin(broadcast(seeds))
        .withColumn("d2",
          col("xx") - lit(2.0) * expr("dot_f64(embedding, cvec)") + col("cc"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid").as("cell"))
      val counts = assigned.groupBy(col("cell"))
        .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("c_old"),
          sum(when(col("vec_id") % 2 === 0, 0L).otherwise(1L)).as("c_new"))
      val totals = counts.agg(sum(col("c_old")).as("n_old"),
        sum(col("c_new")).as("n_new"), count(lit(1)).as("k"))
      counts.crossJoin(broadcast(totals))
        .withColumn("p_old",
          expr("CAST(c_old + 1 AS DOUBLE) / CAST(n_old + k AS DOUBLE)"))
        .withColumn("p_new",
          expr("CAST(c_new + 1 AS DOUBLE) / CAST(n_new + k AS DOUBLE)"))
        .withColumn("psi_term",
          (col("p_old") - col("p_new")) * expr("math_ln(p_old / p_new)"))
        .select(col("cell"), col("c_old"), col("c_new"), col("p_old"),
          col("p_new"), col("psi_term"))
        .orderBy(col("cell"))
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
      assigned AS (SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid, d2, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY d2, cid) AS rn FROM dist) WHERE rn = 1),
      counts AS (SELECT cell,
          CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS c_old,
          CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
            AS c_new
        FROM assigned GROUP BY 1),
      totals AS (SELECT CAST(SUM(c_old) AS BIGINT) AS n_old,
        CAST(SUM(c_new) AS BIGINT) AS n_new, COUNT(*) AS k FROM counts)
      SELECT cell, c_old, c_new,
        CAST(c_old + 1 AS DOUBLE) / CAST(n_old + k AS DOUBLE) AS p_old,
        CAST(c_new + 1 AS DOUBLE) / CAST(n_new + k AS DOUBLE) AS p_new,
        (CAST(c_old + 1 AS DOUBLE) / CAST(n_old + k AS DOUBLE) -
         CAST(c_new + 1 AS DOUBLE) / CAST(n_new + k AS DOUBLE)) *
          ln((CAST(c_old + 1 AS DOUBLE) / CAST(n_old + k AS DOUBLE)) /
             (CAST(c_new + 1 AS DOUBLE) / CAST(n_new + k AS DOUBLE)))
          AS psi_term
      FROM counts CROSS JOIN totals ORDER BY cell"""))

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
