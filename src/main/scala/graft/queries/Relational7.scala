package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** Round-10 relational additions: join-side reduction patterns that only
  * matter at scale — the explicit bloom-filter semi-join reduction every
  * warehouse engine applies when a huge fact joins a selective dimension —
  * and the skyline operator family. */
object Relational7 {

  def all: Seq[QueryDef] = Seq(bloomPruneJoin, skyline, recursiveDepth,
    lateralTopk)

  /** LATERAL correlated derived table — the remaining ANSI join-surface
    * spelling (top-N-per-group as a correlated subquery instead of a
    * window): for each order priority, its two highest-value orders.
    * The sql_text_surface discipline — ONE statement, char-identical in
    * both engines (Spark 4 decorrelates the LIMIT-bounded lateral into
    * a window/join plan; DuckDB executes it natively — two engines, two
    * strategies, hash-equal). The group domain is the 5-row DISTINCT
    * priority relation, so the lateral fan-out is bounded by the group
    * count at any corpus size; `q8_top_orders`-style windows remain the
    * idiomatic spelling — this is the SQL-compatibility path. */
  val lateralTopk = {
    val sqlText = """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
      FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
               WHERE o.o_orderpriority = p.o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY p.o_orderpriority, t.o_totalprice DESC, t.o_orderkey"""
    QueryDef("sql_lateral_topk",
      (s, d) => { Tables.registerAll(s, d); s.sql(sqlText) },
      Some(sqlText))
  }

  /** Native recursive-SQL surface: the SAME `WITH RECURSIVE` text runs
    * through Spark 4.x's recursive-CTE executor and DuckDB — the
    * sql_text_surface discipline applied to recursion (so the text must
    * stay char-identical in both engines; no Spark-side rewrite). The
    * walk is [[graft.operators.Hierarchy]]'s synthetic customer tree;
    * output is the depth histogram, so this entry cross-checks the
    * pointer-jumping twin (`graph_tree_closure`, ⌈log₂ d⌉ shuffles)
    * against per-level recursion (depth-many joins) — the two
    * evaluation strategies for the same recursive query, both native.
    * Scale stance: recursion depth is ln N on the random-attachment
    * tree (~21 at 10⁹ nodes, far under Spark's 100-level default); each
    * level is one hash join keyed on the ancestor pointer. The
    * pointer-jumping twin stays the 100 TB recommendation; this is the
    * SQL-compatibility path. */
  val recursiveDepth = {
    val sqlText = """WITH RECURSIVE par AS (
        SELECT CAST(c_custkey AS BIGINT) AS node,
          CASE WHEN c_custkey = 0 THEN CAST(0 AS BIGINT)
            ELSE ((CAST(c_custkey AS BIGINT) * 2654435761) % 1000000007)
              % CAST(c_custkey AS BIGINT) END AS parent
        FROM customer),
      walk AS (
        SELECT node, parent AS anc, CAST(1 AS BIGINT) AS depth
        FROM par WHERE node <> 0
        UNION ALL
        SELECT w.node, p.parent, w.depth + 1
        FROM walk w JOIN par p ON w.anc = p.node WHERE w.anc <> 0),
      resolved AS (
        SELECT node, depth FROM walk WHERE anc = 0
        UNION ALL
        SELECT node, CAST(0 AS BIGINT) AS depth FROM par WHERE node = 0)
      SELECT depth, COUNT(*) AS n_nodes FROM resolved
      GROUP BY depth ORDER BY depth"""
    QueryDef("sql_recursive_depth",
      (s, d) => { Tables.registerAll(s, d); s.sql(sqlText) },
      Some(sqlText))
  }

  /** 2-D skyline (Pareto front) per return flag: the lineitems for which
    * no other lineitem in the group has BOTH lower-or-equal price and
    * lower-or-equal quantity (one strict) — the classic multi-criteria
    * "best trade-offs" operator the catalog's top-k/rank surface did not
    * yet cover.
    *
    * Distributed shape — the Quantiles two-level prefix-sum pattern
    * applied to dominance: after collapsing to per-(flag, price) min
    * quantity (any higher-qty peer at the same price is dominated by
    * that row), a naive front test is one PER-FLAG window — serial over
    * every distinct price of a group at 100 TB (3 partitions!). Instead:
    * (1) per-(flag, price-bucket) floors get the only cross-bucket
    * window, over the ~#buckets-row bucket relation; (2) the exact test
    * runs per-(flag, bucket) — PARALLEL BY BUCKET — against
    * min(carried prior-bucket floor, within-bucket exclusive running
    * min). Exact because an earlier-bucket row always has strictly
    * smaller price (bucket edges order prices) and dominates iff its
    * qty ≤ ours, i.e. iff the prior floor ≤ ours. Both running mins are
    * growing frames (incremental). The oracle deliberately spells the
    * SINGLE-level window formulation — hash equality proves the bucket
    * reduction, not just the answer. */
  val skyline = QueryDef("q56_skyline",
    (s, d) => {
      val inf = lit(Double.MaxValue)
      val pq = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_extendedprice").as("price"))
        .agg(min(col("l_quantity")).as("qty"))
        .withColumn("b", floor(col("price") / 1000.0))
      val floors = pq.groupBy(col("l_returnflag"), col("b"))
        .agg(min(col("qty")).as("bq"))
      val wb = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val prior = floors
        .withColumn("prior", min(col("bq")).over(wb))
        .select(col("l_returnflag"), col("b"), col("prior"))
      val wi = Window.partitionBy(col("l_returnflag"), col("b"))
        .orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      pq.join(prior, Seq("l_returnflag", "b"))
        .withColumn("local", min(col("qty")).over(wi))
        .filter(col("qty") <
          least(coalesce(col("prior"), inf), coalesce(col("local"), inf)))
        .select(col("l_returnflag"), col("price"), col("qty"))
        .orderBy(col("l_returnflag"), col("price"))
    },
    Some("""WITH pq AS (SELECT l_returnflag, l_extendedprice AS price,
          MIN(l_quantity) AS qty
        FROM lineitem GROUP BY 1, 2),
      r AS (SELECT l_returnflag, price, qty,
          MIN(qty) OVER (PARTITION BY l_returnflag ORDER BY price
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
        FROM pq)
      SELECT l_returnflag, price, qty FROM r
      WHERE prior IS NULL OR qty < prior
      ORDER BY l_returnflag, price"""))

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
