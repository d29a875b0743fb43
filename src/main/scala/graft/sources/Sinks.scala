package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Num, QueryDef, Tables}

/** Write-path operators: partitioned + bucketed parquet layout ownership
  * (VERDICT r3 item 7 — a 100 TB pipeline owns its output layout, not just
  * its scans).
  *
  * Layout contract:
  *   - `partitionBy(col)` → one directory per value; re-reads with a
  *     predicate on the partition column scan only matching directories
  *     (partition pruning — asserted in PlanShapeSpec).
  *   - `bucketBy(n, key).sortBy(key)` → each partition-dir splits into `n`
  *     files by `hash(key) % n`; a join or aggregation on `key` between
  *     co-bucketed tables needs NO shuffle (also asserted in
  *     PlanShapeSpec). At 100 TB this is the difference between a
  *     one-off layout cost at ingest and a full-cluster shuffle on every
  *     downstream join.
  *
  * Bucketing metadata only lives in the catalog, so the sink uses
  * `saveAsTable` with an explicit `path` (Spark 4's warehouse dir is
  * static — see the round-1 notes) and re-reads via `spark.table`.
  */
object Sinks {

  def all: Seq[QueryDef] = Seq(bucketedRoundtrip)

  /** Deterministic sink location per source dir (same dir → same path, so
    * repeated invocations overwrite instead of accumulating). */
  private def sinkPath(d: String, name: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_sink/$tag/$name"
  }

  /** Write lineitem partitioned by `l_returnflag` and bucketed 8-ways on
    * `l_orderkey`, then prove the round-trip by re-reading the table and
    * aggregating per partition value — the result must equal the same
    * aggregate over the original table (the oracle's view). Decimal-exact
    * sums per the engine-wide convention. */
  val bucketedRoundtrip = QueryDef("sink_bucketed_roundtrip",
    (s, d) => {
      val path = sinkPath(d, "lineitem_bucketed")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("l_returnflag")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", path)
        .format("parquet")
        .saveAsTable("graft_sink_lineitem")
      s.table("graft_sink_lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("l_orderkey")).as("orders"),
          Num.sumd(Num.dec(col("l_quantity"))).as("sum_qty"),
          Num.sumd(Num.dec(col("l_extendedprice"))).as("sum_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
        count(*) AS n,
        count(DISTINCT l_orderkey) AS orders,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Re-read handle for the sink table (PlanShapeSpec drives pruning and
    * shuffle-free co-bucketed join assertions through this). Runs the
    * write if the table isn't registered yet in this session. */
  def sinkTable(s: SparkSession, d: String): DataFrame = {
    if (!s.catalog.tableExists("graft_sink_lineitem"))
      bucketedRoundtrip.fn(s, d).collect()
    s.table("graft_sink_lineitem")
  }
}
