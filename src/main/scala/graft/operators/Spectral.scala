package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Distributed power iteration: the top principal direction of the
  * embedding matrix (the leading eigenvector of XᵀX), by the A7
  * superstep pattern (`shortest_path/main.cpp:178-188`) applied to
  * linear algebra — per round, one map-side dot product per row
  * (s_r = ⟨x_r, v⟩), one per-dimension aggregate (y_j = Σ_r x_rj·s_r),
  * and a 64-row driver collect to renormalize. The spectral direction is
  * what embedding-space whitening, spectral outlier pruning, and
  * anisotropy diagnostics (all standard corpus-curation steps) consume.
  *
  * Exactness discipline (the `graph_pagerank` trade applied to floats):
  * embeddings are quantized once to BIGINT (floor(x·1000 + 0.5), the
  * `sim_topk_quantized` rounding), and every subsequent operation — dot
  * products, per-dimension sums, the max-abs renormalization — is
  * integer arithmetic, so sums are associative and any partitioning or
  * engine produces identical bits. Renormalization divides |y| (shifted
  * to non-negative before the integer division, since Spark `div`
  * truncates toward zero while DuckDB `//` floors — they agree only on
  * non-negatives) so that max|v| returns to ~10^4 each round; bounds:
  * |q|≤500, |v|≤2·10^4, dim 64 ⇒ |s_r| ≤ 6.4·10^8, and at 10^6 rows
  * |y_j| ≤ 3.2·10^17 < 2^63 — no overflow headroom games at bench scale.
  *
  * Scale stance: each round is one scan + one 64-group aggregate; the
  * driver holds 64 longs. At 100 TB you'd persist the quantized relation
  * once instead of rescanning (documented seam; 3 scans here).
  *
  * The DuckDB oracle unrolls the 3 rounds into chained CTEs over the
  * same quantized relation — the whole training loop is hash-checked
  * cross-engine, like `sim_ann_ivf_trained`'s Lloyd rounds.
  */
object Spectral {

  val Dim = 64
  val Rounds = 3
  val QScale = 1000L   // float quantization: q = floor(x*1000 + 0.5)
  val VScale = 10000L  // renormalize so max|v| ≈ 10^4 each round

  def all: Seq[QueryDef] = Seq(powerIteration)

  val powerIteration = QueryDef("emb_power_iteration",
    (s, d) => {
      // quantized exploded relation: (vec_id, dim j ∈ [1,64], qv)
      val qe = Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(expr(
            s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale + 0.5d) AS BIGINT))")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("j"),
          col("col").as("qv"))
      import s.implicits._
      var v: Array[Long] = Array.fill(Dim)(VScale)
      for (_ <- 1 to Rounds) {
        val vDf = v.zipWithIndex
          .map { case (w, i) => ((i + 1).toLong, w) }.toSeq.toDF("j", "v")
        val sr = qe.join(broadcast(vDf), "j")
          .groupBy(col("vec_id")).agg(sum(col("qv") * col("v")).as("sv"))
        val y = qe.join(sr, "vec_id")
          .groupBy(col("j")).agg(sum(col("qv") * col("sv")).as("y"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        // maxOption: an EMPTY corpus gives an empty y (no groups), which
        // must flow through to an empty result — like the oracle's empty
        // CTE chain — not crash the driver (EmptyInputSweepSpec)
        val sc = math.max(
          y.map(p => math.abs(p._2)).maxOption.getOrElse(0L) / VScale, 1L)
        v = y.map { case (_, yj) =>
          (if (yj < 0) -1L else 1L) * (math.abs(yj) / sc)
        }
      }
      v.zipWithIndex.map { case (w, i) => ((i + 1).toLong, w) }.toSeq
        .toDF("j", "v").orderBy(col("j"))
    },
    Some {
      val rounds = (1 to Rounds).map { k =>
        s"""s$k AS (SELECT vec_id, SUM(qv * v) AS sv
          FROM qe JOIN v${k - 1} USING (j) GROUP BY vec_id),
        y$k AS (SELECT j, CAST(SUM(qv * sv) AS BIGINT) AS y
          FROM qe JOIN s$k USING (vec_id) GROUP BY j),
        n$k AS (SELECT GREATEST(MAX(ABS(y)) // $VScale, 1) AS sc FROM y$k),
        v$k AS (SELECT j,
          CAST((CASE WHEN y < 0 THEN -1 ELSE 1 END) * (ABS(y) // sc) AS BIGINT) AS v
          FROM y$k CROSS JOIN n$k)"""
      }.mkString(",\n")
      s"""WITH dims AS (SELECT unnest(range(1, ${Dim + 1})) AS j),
        qe AS (SELECT vec_id, j,
          CAST(floor(CAST(embedding[j] AS DOUBLE) * $QScale + 0.5) AS BIGINT) AS qv
          FROM embeddings CROSS JOIN dims),
        v0 AS (SELECT j, CAST($VScale AS BIGINT) AS v FROM dims),
        $rounds
        SELECT CAST(j AS BIGINT) AS j, v FROM v$Rounds ORDER BY j"""
    },
    bench = true)
}
