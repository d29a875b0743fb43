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

  def all: Seq[QueryDef] = Seq(kmeansAssign)

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
