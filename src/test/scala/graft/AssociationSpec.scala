package graft

import org.apache.spark.sql.functions._

/** Serial-model specs for the association entries: per-cell mutual
  * information re-derived bit-exactly from collected counts, and
  * Kendall τ-b re-derived from an all-pairs loop over the daily
  * relation. */
class AssociationSpec extends SparkSpec {

  test("stat_mutual_info matches a bit-exact serial cell model") {
    val d = sf("sf0.001")
    val rows = Tables.documents(spark, d)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toLong
    val o = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rm = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cm = rows.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val expected = o.toSeq.sortBy(_._1).map { case ((l, s), obs) =>
      // the query's exact tree: one division of exact products, libm ln,
      // one division for p, one multiply
      val pmi = Math.log(
        (BigDecimal(obs) * BigDecimal(n)).toDouble /
          (BigDecimal(rm(l)) * BigDecimal(cm(s))).toDouble)
      val mi = (obs.toDouble / n.toDouble) * pmi
      (l, s, obs, pmi, mi)
    }
    val got = graft.operators.Association.mutualInfo.fn(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // MI is non-negative in exact arithmetic; the float term sum may
    // drift below zero only by rounding dust
    assert(got.map(_._5).sum > -1e-9)
  }

  test("stat_kendall_tau matches a serial all-pairs model") {
    val d = sf("sf0.001")
    val daily = Tables.orders(spark, d)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1),
        r.getDecimal(2)))
      .sortBy(_._1)
    var nc, nd, tx, ty, np = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val (a, b) = (daily(i), daily(j))
      np += 1
      val da = b._2.compareTo(a._2)
      val db = b._3.compareTo(a._3)
      if (da == 0) tx += 1
      if (db == 0) ty += 1
      if (da * db > 0) nc += 1
      if (da * db < 0) nd += 1
    }
    val tau = (nc - nd).toDouble /
      Math.sqrt((BigDecimal(np - tx) * BigDecimal(np - ty)).toDouble)
    val row = graft.operators.Association.kendallTau.fn(spark, d).collect()
    assert(row.length == 1)
    assert((row(0).getLong(0), row(0).getLong(1), row(0).getLong(2),
      row(0).getLong(3), row(0).getLong(4)) == ((np, nc, nd, tx, ty)))
    assert(row(0).getDouble(5) == tau)
    assert(math.abs(tau) <= 1.0)
    // volume and revenue per day should co-move on this corpus
    assert(tau > 0.0)
  }

  test("eval_auc matches a serial midrank model and separates long docs") {
    val d = sf("sf0.001")
    val scored = graft.operators.TextAnalysis.quality.fn(spark, d)
      .select(col("quality"), col("n_tokens")).collect()
      .map(r => (r.getDouble(0), r.getLong(1) >= 50L))
    // serial midrank AUC: group by score value, cumulative counts in
    // score order, 2*midrank = 2*cum - c + 1 (integer-exact)
    val byV = scored.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = 0L
    var r1t = BigInt(0)
    var nPos, nNeg = 0L
    byV.foreach { case (_, xs) =>
      val c = xs.length.toLong
      val ca = xs.count(_._2).toLong
      cum += c
      r1t += BigInt(ca) * BigInt(2 * cum - c + 1)
      nPos += ca; nNeg += c - ca
    }
    val auc = (r1t - BigInt(nPos) * BigInt(nPos + 1)).toDouble /
      (BigInt(2) * BigInt(nPos) * BigInt(nNeg)).toDouble
    val row = graft.operators.Eval.auc.fn(spark, d).collect()
    assert(row.length == 1)
    assert((row(0).getLong(0), row(0).getLong(1)) == ((nPos, nNeg)))
    assert(row(0).getDouble(2) == auc)
    // the blend contains a length-saturation term, so the score must
    // genuinely rank long docs above short ones
    assert(auc > 0.6)
  }

  test("stat_cramers_v matches a bit-exact serial fold and sits in [0,1]") {
    val d = sf("sf0.001")
    val rows = Tables.documents(spark, d)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toLong
    val o = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rm = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cm = rows.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    // the query's exact tree, folded in (lang, source) order
    val chi2 = o.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (acc, ((l, s), obs)) =>
        val dev = (BigDecimal(obs) * BigDecimal(n) -
          BigDecimal(rm(l)) * BigDecimal(cm(s))).toDouble
        acc + dev * dev /
          (BigDecimal(n) * BigDecimal(rm(l)) * BigDecimal(cm(s))).toDouble
    }
    val k = math.min(rm.size, cm.size).toLong
    val v = math.sqrt(chi2 / (BigDecimal(n) * BigDecimal(k - 1)).toDouble)
    val row = graft.operators.Association.cramersV.fn(spark, d).collect()
    assert(row.length == 1)
    assert(row(0).getDouble(0) == chi2)
    assert((row(0).getLong(1), row(0).getLong(2), row(0).getLong(3)) ==
      ((n, rm.size.toLong, cm.size.toLong)))
    assert(row(0).getDouble(4) == v)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("ev_session_funnel matches a serial sessionize+funnel model") {
    val d = sf("sf0.001")
    val evs = Tables.events(spark, d)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    var nSess, nView, nConv = 0L
    evs.groupBy(_._1).values.foreach { rows =>
      val tl = rows.sortBy(r => (r._2, r._3)).toSeq
      // split on >1800 s gaps (epoch-second difference, the query's cast)
      val sessions = scala.collection.mutable.ListBuffer(
        scala.collection.mutable.ListBuffer(tl.head))
      tl.sliding(2).foreach {
        case Seq(a, b) =>
          if (b._2 / 1000000L - a._2 / 1000000L > 1800L)
            sessions += scala.collection.mutable.ListBuffer(b)
          else sessions.last += b
        case _ =>
      }
      sessions.foreach { sess =>
        nSess += 1
        val fv = sess.collectFirst { case (_, us, _, "view") => us }
        val fp = sess.collectFirst { case (_, us, _, "purchase") => us }
        if (fv.isDefined) nView += 1
        if (fv.isDefined && fp.isDefined && fp.get > fv.get) nConv += 1
      }
    }
    val row = graft.operators.SessionFunnel.sessionFunnel.fn(spark, d).collect()
    assert(row.length == 1)
    assert((row(0).getLong(0), row(0).getLong(1), row(0).getLong(2)) ==
      ((nSess, nView, nConv)))
    assert(row(0).getDouble(3) == nConv.toDouble / nView.toDouble)
    // the fixture must exercise all three states: sessions without a
    // view, viewed-but-unconverted sessions, and converted sessions
    assert(nConv > 0 && nView > nConv && nSess > nView)
  }

  test("eval_dedup_recall cross-checks its own pair sets; LSH verify gives precision 1") {
    val d = sf("sf0.001")
    val exact = graft.operators.Dedup.ngramJaccard.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.operators.Dedup.minhashLsh.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 < 1000L).toSet
    val row = graft.operators.Eval.dedupRecall.fn(spark, d).collect()
    assert(row.length == 1)
    val (ne, nl, nc) = (row(0).getLong(0), row(0).getLong(1), row(0).getLong(2))
    assert((ne, nl, nc) ==
      ((exact.size.toLong, lsh.size.toLong, (exact & lsh).size.toLong)))
    assert(row(0).getDouble(3) == nc.toDouble / ne.toDouble)
    // exact verification after banding ⇒ every LSH pair is a true pair
    assert(row(0).getDouble(4) == 1.0, "LSH pair set must have precision 1")
    assert(lsh.subsetOf(exact))
    // banding at 16 hashes / 4×4 must catch most ≥0.5-Jaccard pairs here
    assert(row(0).getDouble(3) >= 0.5, s"banding recall ${row(0).getDouble(3)}")
  }

  test("emb_drift_psi: null split is calibrated near zero; cells match the assignment") {
    val d = sf("sf0.001")
    // cells must partition the corpus across the same k=8 assignment
    // the kmeans entry computes
    val assign = graft.operators.Clustering.kmeansAssign.fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val wantCounts = assign.groupBy(_._2).map { case (c, xs) =>
      c -> (xs.count(_._1 % 2 == 0).toLong, xs.count(_._1 % 2 != 0).toLong)
    }
    val got = graft.operators.Clustering.driftPsi.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.map(g => g._1 -> ((g._2, g._3))).toMap == wantCounts)
    // even/odd vec_id is a null split: total PSI must sit well under the
    // 0.1 "no shift" dashboard threshold (each term tiny)
    val psi = got.map(_._4).sum
    assert(psi >= 0.0 && psi < 0.1, s"null-split PSI $psi")
  }

  test("emb_norm_histogram matches a bit-exact serial bucket model") {
    val d = sf("sf0.001")
    val norms = Tables.embeddings(spark, d)
      .select(col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](0)
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
        math.sqrt(s)
      }
    val (mn, mx) = (norms.min, norms.max)
    val expected = norms
      .groupBy(v => math.min(19L,
        math.floor((v - mn) * 20.0 / math.max(mx - mn, 1e-12)).toLong))
      .toSeq.map { case (b, xs) =>
        (b, mn + b.toDouble * (mx - mn) / 20.0, xs.length.toLong)
      }.sortBy(_._1)
    val got = graft.operators.Clustering.normHistogram.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == norms.length.toLong)
  }

  test("eval_langid_confusion matches a serial join of prediction and truth") {
    val d = sf("sf0.001")
    val pred = graft.operators.TextAnalysis.langid.fn(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = truth.groupBy(t => (t._2, pred(t._1))).toSeq
      .map { case ((l, p), xs) =>
        (l, p, xs.length.toLong, if (l == p) xs.length.toLong else 0L)
      }.sortBy(t => (t._1, t._2))
    val got = graft.operators.Eval.langidConfusion.fn(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // every document lands in exactly one cell, and the heuristic beats
    // chance by a wide margin on the synthetic multilingual corpus
    val total = got.map(_._3).sum
    assert(total == truth.length.toLong)
    val acc = got.map(_._4).sum.toDouble / total.toDouble
    assert(acc > 0.2, s"langid accuracy $acc")
  }
}
