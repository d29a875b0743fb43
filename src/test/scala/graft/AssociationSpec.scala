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
}
