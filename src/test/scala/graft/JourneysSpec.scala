package graft

import org.apache.spark.sql.functions._

/** Serial-model specs for the user-journey entries: each query's result
  * re-derived from a collected copy of the events table in plain Scala
  * (per-user timelines sorted by (ts, event_id), the queries' window
  * order). */
class JourneysSpec extends SparkSpec {

  private lazy val timelines: Map[Long, Seq[(Long, String)]] =
    Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.sortBy(r => (r._2, r._3)).map(r => (r._2, r._4)).toSeq
      }

  test("ev_path_trigrams matches a serial per-user sequence model") {
    val counts = scala.collection.mutable.Map.empty[(String, String, String), Long]
    timelines.values.foreach { tl =>
      tl.sliding(3).foreach {
        case Seq(a, b, c) =>
          val k = (a._2, b._2, c._2)
          counts(k) = counts.getOrElse(k, 0L) + 1L
        case _ =>
      }
    }
    val expected = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    val got = graft.operators.Journeys.pathTrigrams
      .fn(spark, sf("sf0.001")).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.head._2 >= got.last._2)
  }

  test("ev_bot_flags matches a serial gap-profile model") {
    import graft.operators.Journeys.{FastGapUs, MinGaps}
    val expected = timelines.toSeq.flatMap { case (u, tl) =>
      val gaps = tl.map(_._1).sliding(2).collect {
        case Seq(a, b) => b - a
      }.toSeq
      val nFast = gaps.count(_ <= FastGapUs).toLong
      if (gaps.length >= MinGaps)
        Some((u, tl.length.toLong, gaps.length.toLong, nFast,
          nFast.toDouble / gaps.length.toDouble,
          if (nFast * 8 >= gaps.length) 1L else 0L))
      else None
    }.sortBy(_._1)
    val got = graft.operators.Journeys.botFlags
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the flag rule must be exactly the integer compare, not the float
    got.foreach { case (_, _, nGaps, nFast, _, bot) =>
      assert(bot == (if (nFast * 8 >= nGaps) 1L else 0L))
    }
  }

  test("ev_retention_triangle matches a serial cohort model") {
    val userDays = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val cohort = userDays.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).min
    }
    val dayMs = 86400000L
    val expected = userDays
      .groupBy(t => (cohort(t._1), (t._2 - cohort(t._1)) / dayMs))
      .map { case ((c, off), xs) => (c, off, xs.map(_._1).distinct.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = graft.operators.Journeys.retentionTriangle
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // triangle invariants: offset-0 cell of each cohort counts the whole
    // cohort, and no cell exceeds it
    val c0 = got.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    got.foreach { case (c, _, n) => assert(n <= c0(c)) }
    assert(got.exists(_._2 > 0L), "no retention beyond day 0 in fixture")
  }

  test("ev_cohort_ltv matches a serial revenue-cohort model") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2),
        r.getDouble(3)))
    val cohort = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val size = cohort.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    val dayMs = 86400000L
    // exact cents (the decimal(12,2) convention) for revenue sums
    val cells = ev.filter(_._3 == "purchase")
      .groupBy(t => (cohort(t._1), (t._2 - cohort(t._1)) / dayMs))
      .map { case ((c, age), xs) =>
        (c, age, xs.map(t => math.round(t._4 * 100)).sum)
      }.toSeq.sortBy(t => (t._1, t._2))
    val expected = cells.groupBy(_._1).toSeq.flatMap { case (c, ages) =>
      var cum = 0L
      ages.sortBy(_._2).map { case (_, age, cents) =>
        cum += cents
        (c, age, size(c), cents.toDouble / 100.0,
          (cum.toDouble / 100.0) / size(c).toDouble)
      }
    }.sortBy(t => (t._1, t._2))
    val got = graft.operators.Journeys.cohortLtv
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ==
      expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-9, s"revenue ${g._4} vs ${e._4}")
      assert(math.abs(g._5 - e._5) < 1e-9, s"ltv ${g._5} vs ${e._5}")
    }
    // the LTV curve is non-decreasing within each cohort
    got.groupBy(_._1).values.foreach { rows =>
      rows.sortBy(_._2).map(_._5).sliding(2).foreach {
        case Seq(a, b) => assert(b >= a)
        case _         =>
      }
    }
  }

  test("ev_activity_heatmap matches a serial UTC clock model") {
    val evs = Tables.events(spark, sf("sf0.001"))
      .select(expr("unix_seconds(ts)").as("s"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = evs.groupBy { case (s, _) =>
      ((s / 86400L + 4L) % 7L,
        java.time.Instant.ofEpochSecond(s)
          .atZone(java.time.ZoneOffset.UTC).getHour.toLong)
    }.map { case ((dow, hod), xs) =>
      (dow, hod, xs.length.toLong, xs.map(_._2).distinct.length.toLong)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = graft.operators.Journeys.activityHeatmap
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == evs.length.toLong)
    got.foreach { case (dow, hod, _, _) =>
      assert(dow >= 0 && dow < 7 && hod >= 0 && hod < 24)
    }
  }

  test("ev_lorenz_users matches a serial decile model and concentrates spend") {
    // keep exact decimals for sums (double folds would drift ulps vs the
    // query's sum-in-decimal-then-cast-once); the v image is one cast
    val spends = Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(12,2)")).as("spend"))
      .collect().map(r => BigDecimal(r.getDecimal(1)))
    val vs = spends.map(_.toDouble)
    val sorted = vs.sorted
    val n = sorted.length
    val edges = (1 to 9).map(k =>
      sorted(math.floor(k / 10.0 * (n - 1)).toInt))
    val total = spends.sum
    val expected = spends.groupBy(s => edges.count(s.toDouble > _).toLong)
      .toSeq
      .map { case (dec, xs) =>
        (dec, xs.length.toLong, xs.sum.toDouble,
          xs.sum.toDouble / total.toDouble)
      }.sortBy(_._1)
    val got = graft.operators.Journeys.lorenzUsers
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    // spends are exact 2-dp decimals whose sums stay ≪ 2^53 — the double
    // images must match exactly too
    got.zip(expected).foreach { case (g, e) =>
      assert(g._3 == e._3 && g._4 == e._4)
    }
    // concentration reads correctly: the top decile out-spends the bottom
    val byDec = got.map(t => t._1 -> t._4).toMap
    assert(byDec(9L) > byDec.getOrElse(0L, 0.0))
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9)
  }

  test("ev_new_vs_returning matches a serial first-seen model") {
    val userDays = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val first = userDays.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).min
    }
    val expected = userDays.groupBy(_._2).toSeq.map { case (day, xs) =>
      val nNew = xs.count(t => first(t._1) == day).toLong
      val act = xs.length.toLong
      (day, act, nNew, act - nNew, (act - nNew).toDouble / act.toDouble)
    }.sortBy(_._1)
    val got = graft.operators.Journeys.newVsReturning
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // every user is new exactly once; the first calendar day is all-new
    assert(got.map(_._3).sum == first.size.toLong)
    assert(got.head._4 == 0L)
  }

  test("ev_session_depth_hist matches a serial session-split model") {
    val evs = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val depths = scala.collection.mutable.ListBuffer.empty[Long]
    evs.groupBy(_._1).values.foreach { rows =>
      val tl = rows.sortBy(r => (r._2, r._3))
      var depth = 0L
      var prev = Long.MinValue
      tl.foreach { case (_, us, _) =>
        if (prev != Long.MinValue && us / 1000000L - prev / 1000000L <= 1800L)
          depth += 1
        else {
          if (depth > 0) depths += depth
          depth = 1
        }
        prev = us
      }
      depths += depth
    }
    val expected = depths.groupBy(identity).toSeq
      .map { case (d, xs) => (d, xs.length.toLong) }.sortBy(_._1)
    val got = graft.operators.Journeys.sessionDepthHist
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // histogram totals: sessions sum to the serial session count and
    // depth-weighted sessions sum to the event count
    assert(got.map(t => t._1 * t._2).sum == evs.length.toLong)
  }

  test("ev_funnel_latency matches a serial first-view/first-purchase model") {
    val lats = timelines.values.flatMap { tl =>
      val fv = tl.collectFirst { case (us, "view") => us }
      val fp = tl.collectFirst { case (us, "purchase") => us }
      (fv, fp) match {
        case (Some(v), Some(p)) if p > v => Some(p - v)
        case _ => None
      }
    }.toSeq.sorted
    // first event per type via collectFirst on the time-sorted timeline
    // == min(ts) per type; strict fp > fv matches the query filter
    assert(lats.nonEmpty, "fixture must contain converted users")
    val med = lats((lats.length - 1) / 2).toDouble
    val p90 = lats(math.floor(0.9 * (lats.length - 1)).toInt).toDouble
    val row = graft.operators.Journeys.funnelLatency
      .fn(spark, sf("sf0.001")).collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == lats.length.toLong)
    assert(row(0).getDouble(1) == med)
    assert(row(0).getDouble(2) == p90)
    assert(med <= p90)
  }
}
