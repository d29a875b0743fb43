package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.Num

/** Incremental-maintenance operators: MERGE-style CDC batch apply (the
  * write path of log-structured ingestion) and partial-aggregate
  * materialized-view maintenance (the no-recompute path every 100 TB
  * rollup depends on).
  *
  * Scale stance: the merge is ONE full-outer equi join keyed by the
  * primary key — on a bucketed base table (see `sink_bucketed_roundtrip`)
  * it plans shuffle-free on the base side, which is exactly how
  * Delta/Iceberg MERGE jobs are laid out; MV maintenance touches the
  * delta partition only and combines with the stored partials, never
  * rescanning the base — correctness rests on the aggregates being
  * map-side combinable (exact decimal sums + counts), which the oracle
  * proves by computing the full aggregate from scratch.
  */
object Cdc {

  def all: Seq[QueryDef] =
    Seq(merge, mvIncremental, mvIncrementalRetract, snapshotDiff, scd2,
      timeTravel)

  /** Time travel — reconstruct the table AS OF a version timestamp from
    * a base snapshot plus a dated change log (the Delta/Iceberg
    * `VERSION AS OF` semantics, spelled out): keep only log batches
    * ≤ T, compact to the LATEST change per key (the log-compaction step
    * [[merge]] doesn't need because it applies exactly one batch), then
    * one full-outer apply against the base. Three dated batches derive
    * deterministically from the key space — credit updates (1996-06),
    * deletes + per-nation inserts (1997-06), debit updates (1998-06) —
    * and T = 1997-12-31 must apply the first two and ignore the third.
    *
    * Scale shape: the log filter is a partition-pruning predicate on a
    * date-partitioned log table in production; compaction is one
    * key-partitioned window over the SURVIVING log only; the apply is
    * the same single full-outer equi join as `cdc_merge` (shuffle-free
    * on a bucketed base). */
  val timeTravel = QueryDef("cdc_time_travel",
    (s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          Num.dec(col("c_acctbal")).as("bal"))
      def batch(ts: String, df: org.apache.spark.sql.DataFrame) =
        df.withColumn("bts", lit(ts))
      val b1 = batch("1996-06-01", base.filter(col("c_custkey") % 10 === 1)
        .select(col("c_custkey"), lit("U").as("op"),
          col("c_nationkey").as("new_nationkey"),
          (col("bal") + lit("100.00").cast("decimal(12,2)"))
            .cast("decimal(12,2)").as("new_bal")))
      val b2d = batch("1997-06-01", base.filter(col("c_custkey") % 10 === 3)
        .select(col("c_custkey"), lit("D").as("op"),
          lit(null).cast("int").as("new_nationkey"),
          lit(null).cast("decimal(12,2)").as("new_bal")))
      val b2i = batch("1997-06-01", Tables.nation(s, d)
        .select((col("n_nationkey").cast("bigint") + 1000000000000L).as("c_custkey"),
          lit("I").as("op"), col("n_nationkey").as("new_nationkey"),
          lit("0.00").cast("decimal(12,2)").as("new_bal")))
      val b3 = batch("1998-06-01", base.filter(col("c_custkey") % 7 === 2)
        .select(col("c_custkey"), lit("U").as("op"),
          col("c_nationkey").as("new_nationkey"),
          (col("bal") - lit("50.00").cast("decimal(12,2)"))
            .cast("decimal(12,2)").as("new_bal")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_custkey")).orderBy(col("bts").desc)
      val applied = b1.unionAll(b2d).unionAll(b2i).unionAll(b3)
        .filter(col("bts") <= lit("1997-12-31"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn", "bts")
      base.join(applied, Seq("c_custkey"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("c_custkey"),
          coalesce(col("new_nationkey"), col("c_nationkey"))
            .as("c_nationkey"),
          coalesce(col("new_bal"), col("bal")).cast("double")
            .as("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH base AS (SELECT c_custkey, c_nationkey,
          CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer),
      log AS (
        SELECT c_custkey, '1996-06-01' AS bts, 'U' AS op,
          c_nationkey AS new_nationkey,
          CAST(bal + CAST('100.00' AS DECIMAL(12,2)) AS DECIMAL(12,2))
            AS new_bal
        FROM base WHERE c_custkey % 10 = 1
        UNION ALL
        SELECT c_custkey, '1997-06-01', 'D', CAST(NULL AS INT),
          CAST(NULL AS DECIMAL(12,2))
        FROM base WHERE c_custkey % 10 = 3
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT) + 1000000000000, '1997-06-01', 'I',
          n_nationkey, CAST('0.00' AS DECIMAL(12,2))
        FROM nation
        UNION ALL
        SELECT c_custkey, '1998-06-01', 'U', c_nationkey,
          CAST(bal - CAST('50.00' AS DECIMAL(12,2)) AS DECIMAL(12,2))
        FROM base WHERE c_custkey % 7 = 2),
      applied AS (SELECT * FROM (
          SELECT c_custkey, op, new_nationkey, new_bal,
            ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY bts DESC)
              AS rn
          FROM log WHERE bts <= '1997-12-31')
        WHERE rn = 1)
      SELECT COALESCE(b.c_custkey, a.c_custkey) AS c_custkey,
        COALESCE(a.new_nationkey, b.c_nationkey) AS c_nationkey,
        CAST(COALESCE(a.new_bal, b.bal) AS DOUBLE) AS c_acctbal
      FROM base b FULL OUTER JOIN applied a USING (c_custkey)
      WHERE a.op IS NULL OR a.op <> 'D'
      ORDER BY c_custkey"""))

  /** SCD Type-2 dimension build — the warehouse pattern that turns a
    * change log into validity intervals: per key, each change opens a
    * version effective until the next change (`eff_to` = next
    * `eff_from`, NULL while current), so any fact row can join the
    * version that was in force at its timestamp (the as-of semantics
    * `ev_pit_features` consumes on the query side; this is the build
    * side). Orders stand in for the change log: each order is a
    * price-change event for its customer; same-day writes collapse
    * last-write-wins (`max_by` on the unique order key — deterministic
    * with no window needed for the dedup).
    *
    * Scale shape: one hash agg keyed by (key, day) + one window
    * partitioned by key (row_number + lead share the single sort) —
    * two key-partitioned shuffles, fully parallel across keys; no
    * global sort, no self-join. State per key is its version chain,
    * exactly what the output is. */
  val scd2 = QueryDef("cdc_scd2",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate").as("eff_from"))
        .agg(expr("max_by(CAST(o_totalprice AS DECIMAL(12,2)), o_orderkey)")
          .as("price"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("eff_from"))
      daily
        .withColumn("version", row_number().over(w).cast("bigint"))
        .withColumn("eff_to", lead(col("eff_from"), 1).over(w))
        .select(col("o_custkey"), col("version"), col("eff_from"),
          col("eff_to"), col("price").cast("double").as("price"),
          col("eff_to").isNull.as("is_current"))
        .orderBy(col("o_custkey"), col("version"))
    },
    Some("""WITH daily AS (SELECT o_custkey, o_orderdate AS eff_from,
          max_by(CAST(o_totalprice AS DECIMAL(12,2)), o_orderkey) AS price
        FROM orders GROUP BY 1, 2),
      v AS (SELECT o_custkey, eff_from, price,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY eff_from)
            AS version,
          LEAD(eff_from) OVER (PARTITION BY o_custkey ORDER BY eff_from)
            AS eff_to
        FROM daily)
      SELECT o_custkey, version, eff_from, eff_to,
        CAST(price AS DOUBLE) AS price, (eff_to IS NULL) AS is_current
      FROM v ORDER BY o_custkey, version"""))

  /** [[mvIncremental]] with RETRACTIONS — the Flink retract-stream /
    * Materialize-style maintenance shape: the delta carries signed
    * multiplicities (+1 inserts, −1 deletes), partials combine by
    * signed addition (counts add weights, exact decimal sums add signed
    * amounts), and groups whose maintained count reaches zero drop out
    * of the view. Deletes retract pre-1997 orders with key ≡ 0 mod 13;
    * inserts are the 1997+ arrivals — both present in every corpus.
    * The oracle recomputes the rollup from scratch over
    * (orders − deleted), proving signed partial-combine lossless
    * INCLUDING group disappearance — the case append-only MV
    * maintenance ([[mvIncremental]]) cannot express. */
  val mvIncrementalRetract = QueryDef("mv_incremental_retract",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          Num.dec(col("o_totalprice")).as("p"))
      val stored = o.filter(col("o_orderdate") < lit("1997-01-01"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("p")).as("rev"))
      val deletes = o.filter(col("o_orderdate") < lit("1997-01-01") &&
          col("o_orderkey") % 13 === 0)
        .select(col("o_custkey"), lit(-1L).as("w"), col("p"))
      val inserts = o.filter(col("o_orderdate") >= lit("1997-01-01"))
        .select(col("o_custkey"), lit(1L).as("w"), col("p"))
      val delta = deletes.unionAll(inserts)
        .groupBy(col("o_custkey"))
        .agg(sum(col("w")).as("n"),
          sum(when(col("w") === 1L, col("p")).otherwise(-col("p"))).as("rev"))
      stored.unionAll(delta)
        .groupBy(col("o_custkey"))
        .agg(sum(col("n")).as("n_orders"),
          sum(col("rev")).cast("double").as("revenue"))
        .filter(col("n_orders") > 0)
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM orders
      WHERE NOT (o_orderdate < TIMESTAMP '1997-01-01'
        AND o_orderkey % 13 = 0)
      GROUP BY o_custkey ORDER BY o_custkey"""))

  /** Snapshot diff — the lakehouse "what changed between versions"
    * audit (Delta/Iceberg table diff): full-outer join two snapshots on
    * the primary key and classify every key as added / removed /
    * changed / unchanged, where "changed" compares a content hash of
    * the tracked columns (one BIGINT per row crosses the shuffle, not
    * the payload). Snapshots derive deterministically from `orders`
    * (old = keys ≢ 9 mod 10, new = keys ≢ 0 mod 10 with prices bumped
    * for keys ≡ 0 mod 7 — inserts, deletes, AND updates all present).
    * Output: one count + exact-decimal price-delta row per status.
    *
    * Scale shape: two scans, one full-outer equi-join on the key (both
    * sides shuffle once; bucketed snapshots make it shuffle-free like
    * `cdc_merge`), one tiny aggregation. The content hash is
    * `roll_hash61` of the canonical column rendering — the 61-bit
    * Mersenne polynomial hash ([[graft.functions.RollingHashMersenne61]]),
    * replicated exactly in DuckDB with a HUGEINT fold.
    *
    * Collision bound: a uniform 61-bit hash misclassifies a changed row
    * as unchanged with ~4.3e-19 probability per key. And since the
    * price columns cross the shuffle anyway (for the delta sum), the
    * unchanged decision ALSO compares them exactly; the hash only has
    * to cover the remaining tracked columns (here `prio`), so a silent
    * miss needs a same-price-different-prio key that ALSO collides —
    * at 10¹² changed keys the expected miss count is ≤ 4.3e-7, i.e.
    * "unchanged" is trustworthy at the 100 TB key scale. */
  val snapshotDiff = QueryDef("cdc_snapshot_diff",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val o = Tables.orders(s, d)
      val oldSnap = o.filter(col("o_orderkey") % 10 =!= 9)
        .select(col("o_orderkey").as("k"),
          Num.dec(col("o_totalprice")).as("price"),
          col("o_orderpriority").as("prio"))
      val newSnap = o.filter(col("o_orderkey") % 10 =!= 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 7 === 0,
            Num.dec(col("o_totalprice")) + Num.dec(lit(10.0)))
            .otherwise(Num.dec(col("o_totalprice"))).as("price"),
          col("o_orderpriority").as("prio"))
      def h(df: org.apache.spark.sql.DataFrame) = df.withColumn("h",
        expr("roll_hash61(concat(CAST(price AS STRING), '|', prio))"))
      h(oldSnap).select(col("k"), col("h").as("oh"), col("price").as("op"))
        .join(h(newSnap).select(col("k"), col("h").as("nh"),
          col("price").as("np")), Seq("k"), "full_outer")
        .withColumn("status",
          when(col("oh").isNull, lit("added"))
            .when(col("nh").isNull, lit("removed"))
            .when(col("oh") === col("nh") && col("op") === col("np"),
              lit("unchanged"))
            .otherwise(lit("changed")))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("np"), lit(0).cast("decimal(12,2)")) -
            coalesce(col("op"), lit(0).cast("decimal(12,2)")))
            .cast("double").as("price_delta"))
        .orderBy(col("status"))
    },
    Some("""WITH o AS (SELECT o_orderkey AS k,
          CAST(o_totalprice AS DECIMAL(12,2)) AS price,
          o_orderpriority AS prio FROM orders),
      olds AS (SELECT k, price, prio,
          CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
            list_transform(string_split(CAST(price AS VARCHAR) || '|' || prio,
              ''), c -> CAST(unicode(c) AS HUGEINT))),
            (h, c) -> (h*131+c) % 2305843009213693951) AS BIGINT) AS h
        FROM o WHERE k % 10 <> 9),
      news AS (SELECT k, price, prio,
          CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
            list_transform(string_split(CAST(price AS VARCHAR) || '|' || prio,
              ''), c -> CAST(unicode(c) AS HUGEINT))),
            (h, c) -> (h*131+c) % 2305843009213693951) AS BIGINT) AS h
        FROM (SELECT k,
            CASE WHEN k % 7 = 0
              THEN price + CAST(10.0 AS DECIMAL(12,2)) ELSE price END AS price,
            prio FROM o WHERE k % 10 <> 0)),
      j AS (SELECT COALESCE(a.k, b.k) AS k, a.h AS oh, b.h AS nh,
          a.price AS op, b.price AS np
        FROM olds a FULL OUTER JOIN news b ON a.k = b.k)
      SELECT CASE WHEN oh IS NULL THEN 'added'
          WHEN nh IS NULL THEN 'removed'
          WHEN oh = nh AND op = np THEN 'unchanged'
          ELSE 'changed' END AS status,
        COUNT(*) AS n,
        CAST(SUM(COALESCE(np, CAST(0 AS DECIMAL(12,2))) -
          COALESCE(op, CAST(0 AS DECIMAL(12,2)))) AS DOUBLE) AS price_delta
      FROM j GROUP BY 1 ORDER BY status"""))

  /** Deterministic CDC batch derived from the key space (no external
    * change feed in the test corpus): delete customers with
    * custkey % 10 == 3, credit +100.00 to those with custkey % 10 in
    * (1, 5), and insert one new customer per nation (keys 10^12+n, past any real custkey: c_custkey tops out at 150k·SF, reaching 10^12 only at SF ≈ 6.7M ≈ 10 EB).
    * Applied MERGE-style: one full outer join on the key, per-row
    * case analysis — unmatched-base rows pass through, matched rows
    * update or drop, unmatched-change rows insert. */
  val merge = QueryDef("cdc_merge",
    (s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          Num.dec(col("c_acctbal")).as("bal"))
      val upserts = base
        .filter(col("c_custkey") % 10 === 1 || col("c_custkey") % 10 === 5)
        .select(col("c_custkey"), lit("U").as("op"),
          lit(null).cast("int").as("new_nationkey"),
          lit(null).cast("decimal(12,2)").as("new_bal"))
      val deletes = base.filter(col("c_custkey") % 10 === 3)
        .select(col("c_custkey"), lit("D").as("op"),
          lit(null).cast("int").as("new_nationkey"),
          lit(null).cast("decimal(12,2)").as("new_bal"))
      val inserts = Tables.nation(s, d)
        .select((col("n_nationkey").cast("bigint") + 1000000000000L).as("c_custkey"),
          lit("I").as("op"), col("n_nationkey").as("new_nationkey"),
          lit("0.00").cast("decimal(12,2)").as("new_bal"))
      val changes = upserts.unionAll(deletes).unionAll(inserts)
      base.join(changes, Seq("c_custkey"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("c_custkey"),
          coalesce(col("new_nationkey"), col("c_nationkey")).as("c_nationkey"),
          when(col("op") === "U", col("bal") + lit("100.00").cast("decimal(12,2)"))
            .otherwise(coalesce(col("new_bal"), col("bal")))
            .cast("decimal(13,2)").cast("double").as("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH base AS (SELECT c_custkey, c_nationkey,
          CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer),
      changes AS (
        SELECT c_custkey, 'U' AS op, CAST(NULL AS INT) AS new_nationkey,
          CAST(NULL AS DECIMAL(12,2)) AS new_bal
        FROM base WHERE c_custkey % 10 IN (1, 5)
        UNION ALL
        SELECT c_custkey, 'D', NULL, NULL FROM base WHERE c_custkey % 10 = 3
        UNION ALL
        SELECT CAST(n_nationkey AS BIGINT) + 1000000000000, 'I', n_nationkey,
          CAST('0.00' AS DECIMAL(12,2))
        FROM nation)
      SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
        COALESCE(c.new_nationkey, b.c_nationkey) AS c_nationkey,
        CAST(CAST(CASE WHEN c.op = 'U' THEN b.bal + CAST('100.00' AS DECIMAL(12,2))
          ELSE COALESCE(c.new_bal, b.bal) END AS DECIMAL(13,2)) AS DOUBLE)
          AS c_acctbal
      FROM base b FULL OUTER JOIN changes c USING (c_custkey)
      WHERE c.op IS NULL OR c.op <> 'D'
      ORDER BY c_custkey"""))

  /** Materialized-view incremental maintenance: the per-customer order
    * rollup (count, exact decimal revenue) is stored as of 1997-01-01;
    * new orders arrive as a delta partition. The maintained view =
    * combine(stored partials, delta partials) — counts add, decimal sums
    * add — and the oracle computes the same rollup from the FULL table,
    * proving the partial-combine is lossless. At 100 TB this is the
    * difference between scanning one day and scanning four years. */
  val mvIncremental = QueryDef("mv_incremental_agg",
    (s, d) => {
      val orders = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"),
          Num.dec(col("o_totalprice")).as("p"))
      def rollup(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("rev"))
      val stored = rollup(orders.filter(col("o_orderdate") < lit("1997-01-01")))
      val delta = rollup(orders.filter(col("o_orderdate") >= lit("1997-01-01")))
      stored.unionAll(delta)
        .groupBy(col("o_custkey"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))
}
