package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.apps.ShortestPath

/** Fixed-point PageRank over the deterministic synthetic ring+skip graph
  * (the same relation `sssp_synthetic` solves shortest paths on) — the
  * second iterative-superstep graph algorithm, generalizing the
  * reference's A4–A7 pattern (frontier ⋈ edges → per-node aggregate →
  * next state; `shortest_path/main.cpp:178-188`) from MIN-propagation to
  * damped mass-propagation.
  *
  * Arithmetic is scaled-integer fixed point (rank mass × 10^12, integer
  * division throughout): BIGINT sums are exact and associative, so any
  * partitioning/any engine computes bit-identical ranks — the same
  * discipline the decimal money columns use (QueryDef doc), applied to an
  * iterative algorithm. The DuckDB oracle unrolls the 5 rounds into
  * chained CTEs over the identical edge relation.
  *
  * Scale stance: each round is one shuffle keyed by src (contribution
  * join) plus one keyed by dst (mass aggregation) — the canonical
  * distributed PageRank plan; the degree relation is computed once.
  * Node state is one BIGINT per node. Unlike the 279-superstep SSSP
  * loop, 5 unrolled rounds stay well inside Catalyst's comfortable plan
  * depth, so NO per-round [[graft.core.Iterative.cutLineage]]: the cut's
  * five eager materializations measured 4.2 s vs 1.8 s as one lazy
  * 10-shuffle job (TimeQuery, sf-independent). A variant with an
  * unbounded round count must re-add the cut — that's what it's for
  * (see Iterative.scala's stats-compounding analysis). The rank relation
  * is renamed before each join so rounds compose as clean two-relation
  * joins, not self-joins Catalyst has to de-duplicate.
  */
object PageRank {

  /** Rank mass scale: 1.0 == 10^12 (so with n=1000 nodes, initial rank
    * is 10^9 — floor-division loss per round is ≤ 1 part in 10^7). */
  val Scale = 1000000000000L
  val N = 1000L
  val Rounds = 5

  /** Personalization seed set for [[ppr]]: nodes ≡ 0 (mod [[SeedMod]])
    * — 4 seeds on the N=1000 synthetic graph, deterministic at any N. */
  val SeedMod = 333L

  def all: Seq[QueryDef] = Seq(pagerank, ppr, pagerankPlaw)

  /** [[pagerank]] on the HEAVY-TAILED fixture
    * ([[Triangles.powerLawEdges]], hub in-degree Θ(n/2)) — mass-
    * propagation skew behavior moved behind the DuckDB hash gate (r15
    * verdict item 7, the `graph_triangles_plaw` precedent): the
    * ring+skip graph `graph_pagerank` runs on is near-regular, so the
    * hub-concentration regime — node 0 absorbing contributions from
    * ~n/2 neighbors each round, the 100 TB skew case where a
    * mass-propagation implementation melts if it ever groups by the
    * hub's neighborhood in memory — was previously only tool-tier
    * evidence (PowerLawTier through 12.8 M edges; that row is the
    * scale half of this entry's claim). Same machinery as [[pagerank]],
    * verbatim: scaled-BIGINT fixed point (×10^12 — with n=2000,
    * initial rank 5·10^8), truncating integer division (exact,
    * associative, partition-invariant), 5 unrolled lazy rounds, each
    * one shuffle keyed by src + one keyed by dst; the per-node sum at
    * the hub is exactly what a shuffle hash aggregate absorbs without
    * per-key memory beyond one BIGINT. Undirected simple edge set run
    * symmetrically (both directions), so every node has out-edges —
    * no dangling mass. Full n-row relation, every rank oracle-visible. */
  val pagerankPlaw = QueryDef("graph_pagerank_plaw",
    (s, _) => {
      val n = Triangles.PlawN
      val simple = Triangles.powerLawEdges(s, n)
      val edges = simple.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(simple.select(col("b").as("src"), col("a").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val e = edges.join(deg, "src")
      val base = (15L * (Scale / n)) / 100L
      var pr = s.range(0, n, 1, 32)
        .select(col("id"), lit(Scale / n).as("v"))
      for (_ <- 1 to Rounds) {
        val contrib = e
          .join(pr.withColumnRenamed("id", "pid"), col("src") === col("pid"))
          .select(col("dst").as("id"), expr("v div deg").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("cs"))
        // id universe = the CONSTANT range relation, not pr_{k-1}.select(id)
        // (r16, guide §7.2 duplicated-subtree audit): referencing the prior
        // round twice doubles the ANALYZED plan per round — 2^5 copies of
        // round-1's subtree that every analyzer/optimizer pass must walk.
        // The optimizer then eliminates the duplicate anyway (id-only
        // projection over a left_outer against unique aggregate keys), so
        // the physical plan is IDENTICAL either way (plans/r16 diff) and
        // the wall-clock delta is inside the ambient band — this spelling
        // just states outright what Catalyst had to derive, and stops the
        // plan from silently going exponential if a refactor breaks the
        // elimination preconditions. Every round's id set IS range(0,n) —
        // the left_outer preserves it — the oracle's own
        // `FROM ids LEFT JOIN c_k` spelling. Fresh range per round keeps
        // attribute ids unambiguous.
        pr = s.range(0, n, 1, 32).select(col("id"))
          .join(contrib, Seq("id"), "left_outer")
          .select(col("id"),
            (lit(base) +
              expr("(85 * coalesce(cs, CAST(0 AS BIGINT))) div 100")).as("v"))
      }
      pr.orderBy(col("id"))
    },
    Some {
      val n = Triangles.PlawN
      val base = (15L * (Scale / n)) / 100L
      val rounds = (1 to Rounds).map { k =>
        s"""c$k AS (SELECT e.dst AS id, SUM(p.v // e.deg) AS cs
          FROM e JOIN pr${k - 1} p ON p.id = e.src GROUP BY e.dst),
        pr$k AS (SELECT i.id,
          CAST($base + (85 * COALESCE(c.cs, 0)) // 100 AS BIGINT) AS v
          FROM ids i LEFT JOIN c$k c ON c.id = i.id)"""
      }.mkString(",\n")
      s"""WITH ids AS (SELECT range AS id FROM range($n)),
        base0 AS (
          SELECT id AS src, (id + 1) % $n AS dst FROM ids
          UNION ALL
          SELECT id,
            $n // ((((id % 2147483647) * 1099087573) % 2147483647)
              % $n + 1) - 1
          FROM ids),
        se AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM base0 WHERE src <> dst),
        e0 AS (
          SELECT a AS src, b AS dst FROM se
          UNION ALL
          SELECT b, a FROM se),
        deg AS (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY src),
        e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
        pr0 AS (SELECT id, CAST(${Scale / n} AS BIGINT) AS v FROM ids),
        $rounds
        SELECT id, v FROM pr$Rounds ORDER BY id"""
    })

  val pagerank = QueryDef("graph_pagerank",
    (s, _) => {
      val edges = ShortestPath.syntheticGraph(s, N).select(col("src"), col("dst"))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val e = edges.join(deg, "src")
      val base = (15L * (Scale / N)) / 100L
      var pr = s.range(0, N, 1, 32)
        .select(col("id"), lit(Scale / N).as("v"))
      for (_ <- 1 to Rounds) {
        val contrib = e
          .join(pr.withColumnRenamed("id", "pid"), col("src") === col("pid"))
          .select(col("dst").as("id"), expr("v div deg").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("cs"))
        // constant-range id universe — see pagerankPlaw's loop comment
        // (the pr_{k-1}.select(id) spelling doubled the plan per round)
        pr = s.range(0, N, 1, 32).select(col("id"))
          .join(contrib, Seq("id"), "left_outer")
          .select(col("id"),
            (lit(base) +
              expr("(85 * coalesce(cs, CAST(0 AS BIGINT))) div 100")).as("v"))
      }
      pr.orderBy(col("id"))
    },
    Some {
      val base = (15L * (Scale / N)) / 100L
      val rounds = (1 to Rounds).map { k =>
        s"""c$k AS (SELECT e.dst AS id, SUM(p.v // e.deg) AS cs
          FROM e JOIN pr${k - 1} p ON p.id = e.src GROUP BY e.dst),
        pr$k AS (SELECT i.id,
          CAST($base + (85 * COALESCE(c.cs, 0)) // 100 AS BIGINT) AS v
          FROM ids i LEFT JOIN c$k c ON c.id = i.id)"""
      }.mkString(",\n")
      s"""WITH ids AS (SELECT range AS id FROM range($N)),
        base AS (
          SELECT id AS src, (id + 1) % $N AS dst FROM ids
          UNION ALL
          SELECT id, (id * 7 + 11) % $N FROM ids),
        e0 AS (
          SELECT src, dst FROM base WHERE src <> dst
          UNION ALL
          SELECT dst AS src, src AS dst FROM base WHERE src <> dst),
        deg AS (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY src),
        e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
        pr0 AS (SELECT id, CAST(${Scale / N} AS BIGINT) AS v FROM ids),
        $rounds
        SELECT id, v FROM pr$Rounds ORDER BY id"""
    })

  /** Personalized PageRank — the restart vector concentrated on a seed
    * set instead of uniform: π = 0.15·e_S + 0.85·Pᵀπ, the
    * recommendation / graph-feature shape the GLOBAL rank cannot serve
    * (hubs dominate `graph_pagerank` regardless of whose neighborhood
    * you care about; PPR ranks BY PROXIMITY to the seeds — PprSpec pins
    * seed-mass concentration against the global rank's order; r13
    * verdict item 6).
    *
    * Same machinery as [[pagerank]], reused wholesale: scaled-BIGINT
    * fixed point (×10^12, truncating integer division — exact,
    * associative, partition-invariant), 5 unrolled lazy rounds,
    * contribution join keyed by src + mass aggregation keyed by dst,
    * oracle as chained CTEs generated from the same constants. The only
    * deltas: the restart term lands ONLY on seeds, and the initial
    * vector puts all mass on the seeds (the standard PPR start, so
    * round k bounds the k-hop neighborhood). No dangling mass: every
    * node of the ring+skip graph has out-edges. */
  val ppr = QueryDef("graph_ppr",
    (s, _) => {
      val edges = ShortestPath.syntheticGraph(s, N)
        .select(col("src"), col("dst"))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val e = edges.join(deg, "src")
      val nSeeds = (N + SeedMod - 1) / SeedMod // ids 0, 333, 666, 999
      val seedBase = (15L * (Scale / nSeeds)) / 100L
      var pr = s.range(0, N, 1, 32)
        .select(col("id"),
          when(col("id") % SeedMod === 0L, lit(Scale / nSeeds))
            .otherwise(lit(0L)).as("v"))
      for (_ <- 1 to Rounds) {
        val contrib = e
          .join(pr.withColumnRenamed("id", "pid"), col("src") === col("pid"))
          .select(col("dst").as("id"), expr("v div deg").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("cs"))
        // constant-range id universe — see pagerankPlaw's loop comment
        pr = s.range(0, N, 1, 32).select(col("id"))
          .join(contrib, Seq("id"), "left_outer")
          .select(col("id"),
            (when(col("id") % SeedMod === 0L, lit(seedBase))
              .otherwise(lit(0L)) +
              expr("(85 * coalesce(cs, CAST(0 AS BIGINT))) div 100"))
              .as("v"))
      }
      pr.orderBy(col("id"))
    },
    Some {
      val nSeeds = (N + SeedMod - 1) / SeedMod
      val seedBase = (15L * (Scale / nSeeds)) / 100L
      val rounds = (1 to Rounds).map { k =>
        s"""c$k AS (SELECT e.dst AS id, SUM(p.v // e.deg) AS cs
          FROM e JOIN pr${k - 1} p ON p.id = e.src GROUP BY e.dst),
        pr$k AS (SELECT i.id,
          CAST(CASE WHEN i.id % $SeedMod = 0 THEN $seedBase ELSE 0 END
            + (85 * COALESCE(c.cs, 0)) // 100 AS BIGINT) AS v
          FROM ids i LEFT JOIN c$k c ON c.id = i.id)"""
      }.mkString(",\n")
      s"""WITH ids AS (SELECT range AS id FROM range($N)),
        base AS (
          SELECT id AS src, (id + 1) % $N AS dst FROM ids
          UNION ALL
          SELECT id, (id * 7 + 11) % $N FROM ids),
        e0 AS (
          SELECT src, dst FROM base WHERE src <> dst
          UNION ALL
          SELECT dst AS src, src AS dst FROM base WHERE src <> dst),
        deg AS (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY src),
        e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
        pr0 AS (SELECT id, CAST(CASE WHEN id % $SeedMod = 0
          THEN ${Scale / nSeeds} ELSE 0 END AS BIGINT) AS v FROM ids),
        $rounds
        SELECT id, v FROM pr$Rounds ORDER BY id"""
    })
}
