package graft

import org.apache.spark.sql.functions._

/** Serial-model and invariant specs for the round-10 second-wave
  * entries: per-group OLS, Benford digit test, lag-k autocorrelation,
  * local clustering coefficient, MRR/recall retrieval eval, and PMI
  * collocations. Models re-derive expectations with plain Scala
  * collections; float outputs are compared BIT-EXACTLY (each entry's
  * arithmetic is one shared IEEE tree over exactly-summed operands, so
  * exact equality is the contract, not a tolerance). */
class StatsEvalSpec extends SparkSpec {

  test("stat_ols_group matches a serial exact-power-sum OLS") {
    val d = sf("sf0.001")
    val rows = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
         BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP))))
    val model = rows.groupBy(_._1).map { case (g, xs) =>
      val n = xs.length.toDouble
      val sx = xs.map(_._2._1).sum.toDouble
      val sy = xs.map(_._2._2).sum.toDouble
      val sxx = xs.map(p => p._2._1 * p._2._1).sum.toDouble
      val syy = xs.map(p => p._2._2 * p._2._2).sum.toDouble
      val sxy = xs.map(p => p._2._1 * p._2._2).sum.toDouble
      val num = n * sxy - sx * sy
      val denX = n * sxx - sx * sx
      val denY = n * syy - sy * sy
      val slope = num / denX
      g -> (xs.length.toLong, slope, (sy - slope * sx) / n,
        (num / denX) * (num / denY))
    }
    val got = SparkEntry.queries("stat_ols_group")(spark, d).collect()
    assert(got.length == model.size && got.nonEmpty)
    got.foreach { r =>
      val (n, slope, icept, r2) = model((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n)
      assert(r.getDouble(3) == slope, s"slope ${r.getString(0)}/${r.getString(1)}")
      assert(r.getDouble(4) == icept)
      assert(r.getDouble(5) == r2)
      // r² is a squared correlation — bounded regardless of slope sign
      assert(r2 >= 0 && r2 <= 1.0)
    }
  }

  test("stat_benford matches a serial digit count; proportions sum to 1") {
    val d = sf("sf0.001")
    val prices = Tables.lineitem(spark, d)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0))
      .filter(_ > 0)
    val cents = prices.map(p =>
      (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
        .toLongExact)
    val obs = cents.groupBy(_.toString.head.asDigit.toLong)
      .map { case (dg, xs) => dg -> xs.length.toLong }
    val n = cents.length.toDouble
    val got = SparkEntry.queries("stat_benford")(spark, d).collect()
    assert(got.map(_.getLong(0)).toSet == obs.keySet)
    got.foreach { r =>
      val dg = r.getLong(0)
      assert(r.getLong(1) == obs(dg))
      assert(r.getDouble(2) == obs(dg).toDouble / n)
      val bp = Math.log(1.0 + 1.0 / dg.toDouble) / Math.log(10.0)
      assert(r.getDouble(3) == bp)
      val en = n * bp
      val od = obs(dg).toDouble
      assert(r.getDouble(4) == (od - en) * (od - en) / en)
    }
    // observed proportions tile the filtered corpus exactly
    assert(got.map(_.getLong(1)).sum == cents.length)
  }

  test("stat_autocorr matches a serial lag-k Pearson over the daily series") {
    val d = sf("sf0.001")
    val daily = Tables.orders(spark, d)
      .select(col("o_orderdate"), col("o_totalprice"))
      .collect()
      .groupBy(_.getAs[java.time.LocalDateTime](0).toLocalDate)
      .map { case (dt, rs) =>
        dt -> (rs.map(r => BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum * 100)
          .toLongExact
      }
    val got = SparkEntry.queries("stat_autocorr")(spark, d).collect()
    assert(got.length == 7)
    got.foreach { r =>
      val k = r.getLong(0)
      val pairs = daily.toSeq.flatMap { case (dt, y) =>
        daily.get(dt.minusDays(k)).map(yl => (y, yl))
      }
      assert(r.getLong(1) == pairs.length.toLong, s"n at lag $k")
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxx = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val syy = pairs.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val want = (n * BigDecimal(sxy).toDouble - sx * sy) /
        (Math.sqrt(n * BigDecimal(sxx).toDouble - sx * sx) *
         Math.sqrt(n * BigDecimal(syy).toDouble - sy * sy))
      assert(r.getDouble(2) == want, s"autocorr at lag $k")
    }
  }

  test("graph_clustering_coeff matches a serial wedge count on the synthetic graph") {
    val n = graft.operators.Triangles.N
    val edges = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n), (i, (i * 7 + 11) % n))
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val tri = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(a) & adj(b); if c > b) {
      tri(a) += 1; tri(b) += 1; tri(c) += 1
    }
    val model = adj.collect { case (v, ns) if ns.size >= 2 =>
      (v, ns.size.toLong, tri(v),
        (2.0 * tri(v).toDouble) / (ns.size.toLong * (ns.size - 1)).toDouble)
    }.toSeq.sortBy(t => (-t._4, t._1)).take(50)
    val got = SparkEntry.queries("graph_clustering_coeff")(spark, "").collect()
    assert(got.length == model.length)
    got.zip(model).foreach { case (g, (v, deg, t, c)) =>
      assert(g.getLong(0) == v && g.getLong(1) == deg && g.getLong(2) == t)
      assert(g.getDouble(3) == c)
    }
    // the ring+skip-2 construction closes (i, i+1, i+2) everywhere, so
    // every node participates in triangles — coefficient strictly > 0
    assert(model.head._4 > 0)
  }

  test("eval_mrr is consistent with eval_ndcg and its own rank algebra") {
    val d = sf("sf0.001")
    val mrr = SparkEntry.queries("eval_mrr")(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ndcg = SparkEntry.queries("eval_ndcg")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // n_overlap
    assert(mrr.keySet == ndcg.keySet && mrr.nonEmpty)
    mrr.foreach { case (q, (fhr, rr, r5, r10)) =>
      // recall@10 is exactly the ndcg overlap over 10
      assert(r10 == ndcg(q).toDouble / 10.0, s"q$q recall@10 vs ndcg overlap")
      // rank algebra: rr = 1/first_hit_rank, 0 iff no hit
      if (fhr == 0L) assert(rr == 0.0 && ndcg(q) == 0L)
      else assert(rr == 1.0 / fhr.toDouble && fhr >= 1 && fhr <= 10)
      assert(r5 >= 0.0 && r5 <= 1.0 && r10 >= 0.0 && r10 <= 1.0)
      // a hit anywhere implies recall@10 saw it
      if (fhr > 0) assert(r10 > 0.0)
    }
  }

  test("text_pmi_bigrams matches a serial PMI model") {
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
    val toks = docs.map(_.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val nu = uni.values.sum
    val withBi = toks.filter(_.length >= 2)
    val nb = withBi.map(_.length - 1L).sum
    val bi = withBi.flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      .filter(_._2 >= 5)
    val model = bi.toSeq.map { case ((w1, w2), cxy) =>
      val pmi = Math.log((cxy.toDouble * nu.toDouble * nu.toDouble) /
        (nb.toDouble * uni(w1).toDouble * uni(w2).toDouble))
      (s"$w1 $w2", cxy, uni(w1), uni(w2), pmi)
    }.sortBy(t => (-t._5, t._1)).take(30)
    val got = SparkEntry.queries("text_pmi_bigrams")(spark, d).collect()
    assert(got.length == model.length && got.nonEmpty)
    got.zip(model).foreach { case (g, (b, cxy, cx, cy, pmi)) =>
      assert(g.getString(0) == b)
      assert(g.getLong(1) == cxy && g.getLong(2) == cx && g.getLong(3) == cy)
      assert(g.getDouble(4) == pmi, s"pmi of $b")
    }
    // support floor is enforced in the output, not just the model
    assert(got.forall(_.getLong(1) >= 5))
  }

  test("sql_recursive_depth equals the pointer-jumping twin's depth histogram") {
    val d = sf("sf0.001")
    val closure = SparkEntry.queries("graph_tree_closure")(spark, d)
      .collect().map(_.getLong(1))
      .groupBy(identity).map { case (dep, xs) => dep -> xs.length.toLong }
    val got = SparkEntry.queries("sql_recursive_depth")(spark, d).collect()
    assert(got.map(_.getLong(0)).toSet == closure.keySet && got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == closure(r.getLong(0)),
      s"depth ${r.getLong(0)}"))
    // recursion really recurses: the random-attachment tree is deeper
    // than a star
    assert(closure.keySet.max >= 3)
  }

  test("graph_common_neighbors matches a serial wedge model on non-edges") {
    val n = graft.operators.Triangles.N
    val edges = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n), (i, (i * 7 + 11) % n))
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val edgeSet = edges.toSet
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    // all degrees ≤ MaxMidDegree on this graph, so the hub cap is a
    // no-op here (its effect is plan-level bounding)
    assert(adj.values.map(_.size).max <= graft.operators.Triangles.MaxMidDegree)
    val cn = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for ((v, ns) <- adj; u <- ns; w <- ns; if u < w) cn((u, w)) += 1
    val model = cn.toSeq
      .filterNot { case (p, _) => edgeSet(p) }
      .map { case ((u, w), c) =>
        (u, w, c, c.toDouble /
          (adj(u).size.toLong + adj(w).size.toLong - c).toDouble)
      }
      .sortBy(t => (-t._3, t._1, t._2)).take(30)
    val got = SparkEntry.queries("graph_common_neighbors")(spark, "").collect()
    assert(got.length == model.length && got.nonEmpty)
    got.zip(model).foreach { case (g, (u, w, c, j)) =>
      assert(g.getLong(0) == u && g.getLong(1) == w && g.getLong(2) == c)
      assert(g.getDouble(3) == j)
      // link-prediction contract: scored pairs are NOT edges
      assert(!edgeSet((g.getLong(0), g.getLong(1))))
    }
  }

  test("ev_inter_arrival matches a serial per-user gap model") {
    val d = sf("sf0.001")
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Any](1), r.getLong(2), r.getString(3)))
    // the schema-adaptive loader yields NTZ (LocalDateTime) or regular
    // (Timestamp) depending on the file's physical type — gaps are
    // offset-invariant either way
    def micros(x: Any): Long = x match {
      case t: java.time.LocalDateTime =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000L
      case t: java.sql.Timestamp =>
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    }
    val gaps = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(t => (micros(t._2), t._3))
      sorted.sliding(2).collect { case Seq(a, b) =>
        (b._4, micros(b._2) - micros(a._2))
      }
    }
    val model = gaps.groupBy(_._1).map { case (t, xs) =>
      val g = xs.map(_._2)
      t -> (g.length.toLong, g.sum.toDouble / g.length.toDouble,
        g.min, g.max)
    }
    val got = SparkEntry.queries("ev_inter_arrival")(spark, d).collect()
    assert(got.length == model.size && got.nonEmpty)
    got.foreach { r =>
      val (ng, mean, mn, mx) = model(r.getString(0))
      assert(r.getLong(1) == ng && r.getLong(3) == mn && r.getLong(4) == mx)
      assert(r.getDouble(2) == mean, s"mean gap for ${r.getString(0)}")
      // events are strictly ordered per user, gaps non-negative
      assert(mn >= 0L)
    }
  }

  test("stat_gini matches the direct sorted-rank formula") {
    val d = sf("sf0.001")
    val spend = Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .groupBy(_.getLong(0))
      .map { case (_, rs) =>
        (rs.map(r => BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum * 100)
          .toLongExact
      }.toSeq.sorted
    val n = spend.length
    val sy = spend.map(BigInt(_)).sum
    val num = spend.zipWithIndex
      .map { case (y, i0) => BigInt(2L * (i0 + 1) - n - 1) * BigInt(y) }
      .sum
    val want = BigDecimal(num).toDouble / BigDecimal(BigInt(n) * sy).toDouble
    val got = SparkEntry.queries("stat_gini")(spark, d).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == n.toLong)
    assert(got.head.getLong(1) == spend.sum)
    assert(got.head.getDouble(2) == want, "gini")
    assert(want >= 0.0 && want < 1.0)
  }

  test("text_zipf_fit matches a serial log-log OLS over the top-100 words") {
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)
      .select(col("text")).collect().map(_.getString(0))
    val top = docs.flatMap(_.split(" ", -1)).groupBy(identity)
      .map { case (w, xs) => (w, xs.length.toLong) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(100)
    val terms = top.zipWithIndex.map { case ((_, cnt), i0) =>
      (Math.log((i0 + 1).toDouble), Math.log(cnt.toDouble))
    }
    // left folds in rank order, exactly the entry's accumulation
    val nd = terms.length.toDouble
    val sx = terms.foldLeft(0.0)((a, t) => a + t._1)
    val sy = terms.foldLeft(0.0)((a, t) => a + t._2)
    val sxx = terms.foldLeft(0.0)((a, t) => a + t._1 * t._1)
    val syy = terms.foldLeft(0.0)((a, t) => a + t._2 * t._2)
    val sxy = terms.foldLeft(0.0)((a, t) => a + t._1 * t._2)
    val num = nd * sxy - sx * sy
    val denX = nd * sxx - sx * sx
    val denY = nd * syy - sy * sy
    val slope = num / denX
    val got = SparkEntry.queries("text_zipf_fit")(spark, d).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == terms.length.toLong)
    assert(got.head.getDouble(1) == slope, "zipf slope")
    assert(got.head.getDouble(2) == (sy - slope * sx) / nd)
    assert(got.head.getDouble(3) == (num / denX) * (num / denY))
    // frequencies are non-increasing in rank, so the fit must slope down
    assert(slope < 0)
  }
}
