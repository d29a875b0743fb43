package graft.queries

import graft.{QueryDef, Tables}

/** Round-10 relational additions: join-side reduction patterns that only
  * matter at scale — the explicit bloom-filter semi-join reduction every
  * warehouse engine applies when a huge fact joins a selective dimension. */
object Relational7 {

  def all: Seq[QueryDef] = Seq(bloomPruneJoin)

  /** Revenue of lineitems belonging to urgent first-year orders, with the
    * fact side pruned by a distributed Bloom filter of the dimension's
    * keys BEFORE the join — Spark's runtime-filter machinery
    * ([[graft.functions.BloomFunctions]]) placed deliberately.
    *
    * Why this is its own entry and not just a join: at 100 TB the
    * dominant cost of `fact ⋈ selective-dim` is shuffling the ~97 % of
    * fact rows that will NOT find a match. The bloom subquery aggregates
    * the ~450-key dimension into one 64 KiB bit-OR sketch (map-side
    * combinable, one row), and `bloom_might_contain` is pushed below the
    * join onto the lineitem side (PlanShapeSpec pins the Filter under the
    * join input), so non-matching fact rows die at the scan — the shuffle
    * carries only survivors (+ ≤2 % false positives, which the exact join
    * then removes; false negatives are impossible). Same plan shape AQE's
    * InjectRuntimeFilter produces, but stated in the query so it does not
    * depend on optimizer heuristics firing.
    *
    * Exactness: the bloom only ever REMOVES rows the join would drop
    * anyway, so the oracle is the plain join; revenue follows the
    * engine-wide exact-decimal convention (identical SQL text both
    * engines). xxhash64 never reaches the output. */
  val bloomPruneJoin = QueryDef("q55_bloom_prune_join",
    (s, d) => {
      graft.functions.BloomFunctions.register(s)
      Tables.registerAll(s, d)
      s.sql("""
        WITH dim AS (
          SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT'
            AND o_orderdate < TIMESTAMP '1996-01-01'),
        bf AS (SELECT bloom_agg(xxhash64(o_orderkey)) AS b FROM dim)
        SELECT l_returnflag, COUNT(*) AS n_lines,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
            (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN dim ON l_orderkey = o_orderkey
        WHERE bloom_might_contain((SELECT b FROM bf), xxhash64(l_orderkey))
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""WITH dim AS (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate < TIMESTAMP '1996-01-01')
      SELECT l_returnflag, COUNT(*) AS n_lines,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN dim ON l_orderkey = o_orderkey
      GROUP BY l_returnflag ORDER BY l_returnflag"""))
}
