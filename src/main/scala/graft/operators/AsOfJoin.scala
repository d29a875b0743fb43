package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** As-of join — the canonical "operator Spark lacks" (time-series point
  * lookup: for each left row, the latest right row with `right.ts <=
  * left.ts` within a key). Implemented by composition (preference (a) in
  * the engine's design rules) rather than a custom SparkPlan: union both
  * sides tagged, sort within key by (ts, side), and carry the last seen
  * right value forward with `last(..., ignoreNulls)` over a running
  * window. One shuffle on the key, no range-condition join explosion —
  * the plan a hand-written AsOfJoinExec would produce anyway.
  *
  * DuckDB's native ASOF JOIN provides the oracle.
  */
object AsOfJoin {

  def all: Seq[QueryDef] = Seq(evAsofBusyHour)

  /** For each left row, attach `valCol` from the latest right row with
    * rightTs <= leftTs, matching on `key`. Left rows with no prior right
    * row get null. */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valCol: String): DataFrame = {
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_val", lit(null).cast(right.schema(valCol).dataType))
    val r = right.select(col(key), col(rightTs).as("_ts"),
      lit(0).as("_side"), col(valCol).as("_val"))
    // right rows sort before left rows at equal ts (side 0 < 1) → `<=`
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true) // right fills left cols with null
      .withColumn("_asof", last(col("_val"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_ts", "_side", "_val")
      .withColumnRenamed("_asof", s"asof_$valCol")
  }

  /** Events as-of joined to the most recent prior "busy hour" (hours with
    * >= 30 events of that type): for each event, how many events its
    * type's last busy hour had. */
  val evAsofBusyHour = QueryDef("ev_asof_busy_hour",
    (s, d) => {
      val ev = Tables.events(s, d)
      val busy = ev.groupBy(date_trunc("hour", col("ts")).as("hts"),
          col("event_type"))
        .agg(count(lit(1)).as("busy_n"))
        .filter(col("busy_n") >= 30)
      val joined = asof(
        ev.select(col("event_id"), col("event_type"), col("ts")),
        busy, key = "event_type", leftTs = "ts", rightTs = "hts",
        valCol = "busy_n")
      joined
        .groupBy(col("event_type"))
        .agg(count(col("asof_busy_n")).as("n_with_prior_busy"),
          sum(col("asof_busy_n")).as("sum_busy_n"))
        .orderBy(col("event_type"))
    },
    Some("""WITH busy AS (
        SELECT date_trunc('hour', ts) AS hts, event_type, COUNT(*) AS busy_n
        FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 30)
      SELECT e.event_type,
        COUNT(b.busy_n) AS n_with_prior_busy,
        CAST(SUM(b.busy_n) AS BIGINT) AS sum_busy_n
      FROM events e
      ASOF LEFT JOIN busy b
        ON e.event_type = b.event_type AND e.ts >= b.hts
      GROUP BY e.event_type ORDER BY e.event_type"""))
}
