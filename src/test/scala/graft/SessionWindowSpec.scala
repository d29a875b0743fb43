package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Native session_window boundary semantics: Spark MERGES a session
  * whose next event lands exactly at prev + gap (merge condition is
  * next.start <= prev.end), so only diff > gap splits — the same
  * strict rule as the lag-recipe entry, making ev_sessionize_native an
  * exact semantic twin of ev_sessionize. Pinned here so a Spark
  * upgrade that flips the bound to exclusive fails loudly (and with it
  * the shared oracle). */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("exact-gap arrival merges in BOTH the native and lag recipes") {
    // user 1: events at t=0 and t=1800 (exactly the gap apart)
    // user 2: events at t=0 and t=1799 (inside the gap)
    // user 3: events at t=0 and t=1801 (outside the gap)
    val events = Seq(
      (1L, ts(0)), (1L, ts(1800)),
      (2L, ts(0)), (2L, ts(1799)),
      (3L, ts(0)), (3L, ts(1801))).toDF("user_id", "ts")

    val native = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))

    // the lag recipe (strict > gap) agrees: user 1 stays ONE session
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val lagged = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
          .otherwise(0L))
      .groupBy(col("user_id")).agg(sum(col("new_sess")).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lagged == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("session_window merges chained events across one long span") {
    // 5 events each 1000 s apart: every consecutive pair is inside the
    // gap, so they chain into ONE session spanning 4000 s > gap
    val events = (0 until 5).map(i => (7L, ts(i * 1000L)))
      .toDF("user_id", "ts")
    val sessions = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("w.end"), col("n")).collect()
    assert(sessions.length == 1)
    assert(sessions.head.getLong(2) == 5L)
    // window end = last event + gap
    assert(sessions.head.getTimestamp(1) == ts(4000L + 1800L))
  }

  test("q54 RANGE interval frame matches a serial trailing-7-day model at sf0.001") {
    val d = sf("sf0.001")
    val got = graft.queries.Relational6.rangeIntervalWindow.fn(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val orders = Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(12,2)").as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2).toLocalDate, r.getDecimal(3)))
    val byCust = orders.groupBy(_._1)
    orders.foreach { case (ck, ok, date, _) =>
      val want = byCust(ck)
        .filter { case (_, _, d2, _) =>
          !d2.isAfter(date) && !d2.isBefore(date.minusDays(7)) }
        .map(_._4.doubleValue()).sum
      assert(math.abs(got((ck, ok)) - want) < 1e-6, s"cust $ck order $ok")
    }
  }
}
