package graft

import org.apache.spark.sql.functions._
import graft.operators.Anonymity

/** Serial-model + suppression-fixture specs for the k-anonymity gate. */
class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  test("curate_k_anonymity matches a serial generalization-hierarchy model") {
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3) / 100L))
    val n0 = docs.groupBy(x => (x._2, x._3, x._4)).map { case (k, xs) => k -> xs.length }
    val n1 = docs.groupBy(x => (x._2, x._3)).map { case (k, xs) => k -> xs.length }
    val n2 = docs.groupBy(_._2).map { case (k, xs) => k -> xs.length }
    val n3 = docs.length
    val K = Anonymity.K
    val got = SparkEntry.queries("curate_k_anonymity")(spark, d).collect()
    assert(got.length == docs.length && got.nonEmpty)
    val byId = docs.map(x => x._1 -> x).toMap
    got.foreach { r =>
      val (id, lang, src, bkt) = byId(r.getLong(0))
      val (lvl, gn) =
        if (n0((lang, src, bkt)) >= K) (0, n0((lang, src, bkt)))
        else if (n1((lang, src)) >= K) (1, n1((lang, src)))
        else if (n2(lang) >= K) (2, n2(lang))
        else (3, n3)
      assert(r.getInt(1) == lvl, s"doc $id level")
      assert(r.getString(2) == (if (lvl <= 2) lang else "*"))
      assert(r.getString(3) == (if (lvl <= 1) src else "*"))
      assert(r.getString(4) == (if (lvl == 0) bkt.toString else "*"))
      assert(r.getLong(5) == gn.toLong, s"doc $id group size")
      // the k-anonymity contract: every non-suppressed release sits in a
      // population group of at least K
      if (lvl < 3) assert(r.getLong(5) >= K)
    }
    // the corpus exercises generalization (some docs do NOT release the
    // full tuple) while most docs release something
    assert(got.exists(_.getInt(1) > 0))
  }

  test("a singleton quasi-identifier is suppressed, not leaked") {
    // 9 docs of one (lang, source, bkt) cell — they clear K=8 at level 0;
    // one doc with a unique lang — nothing short of '*' protects it
    val rows = (0L until 9L).map(i => (i, "en", "web", 3L)) :+
      ((99L, "xx", "rare", 7L))
    val got = Anonymity.kAnonymityOf(
      rows.toDF("doc_id", "lang", "source", "bkt")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5)))).toMap
    (0L until 9L).foreach { i =>
      assert(got(i) == ((0, "en", "web", "3", 9L)), s"doc $i")
    }
    assert(got(99L) == ((3, "*", "*", "*", 10L)), "singleton not suppressed")
  }

  test("curate_l_diversity matches a serial model and separates k-ok-but-l-poor groups") {
    val d = sf("sf0.001")
    val rows = Tables.documents(spark, d)
      .select(col("lang"), (col("n_chars") / 100L).cast("long"),
        col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((lang, bkt), xs) =>
        val n = xs.length.toLong
        val ls = xs.map(_._3).distinct.length.toLong
        (lang, bkt, n, ls,
          if (n >= Anonymity.K) 1L else 0L,
          if (ls >= Anonymity.L) 1L else 0L)
      }.sortBy(t => (t._1, t._2))
    val got = Anonymity.lDiversity.fn(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the homogeneity-attack case must exist in the fixture: at least
    // one group passes k-anonymity yet fails the diversity floor, and
    // at least one passes both — otherwise the l criterion adds nothing
    assert(got.exists(g => g._5 == 1L && g._6 == 0L),
      "no k-anonymous but l-poor group in the fixture")
    assert(got.exists(g => g._5 == 1L && g._6 == 1L))
  }

  test("curate_t_closeness matches a serial EMD model") {
    val d = sf("sf0.001")
    val rows = Tables.documents(spark, d)
      .select(col("lang"), (col("n_chars") / 100L).cast("long"),
        col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val values = rows.map(_._3).distinct.sorted
    val m = values.length
    val n = rows.length.toLong
    val globCum = values.scanLeft(0L)((acc, v) =>
      acc + rows.count(_._3 == v)).tail
    val expected = rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((lang, bkt), xs) =>
        val gn = xs.length.toLong
        val gCum = values.scanLeft(0L)((acc, v) =>
          acc + xs.count(_._3 == v)).tail
        val num = values.indices.map(i =>
          (BigInt(gCum(i)) * n - BigInt(globCum(i)) * gn).abs).sum
        val emd =
          if (m <= 1) 0.0
          else num.toDouble / ((m - 1).toDouble * gn.toDouble * n.toDouble)
        (lang, bkt, gn, emd, if (emd <= Anonymity.TClose) 1L else 0L)
      }.sortBy(t => (t._1, t._2))
    val got = Anonymity.tCloseness.fn(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._5)) ==
      expected.map(t => (t._1, t._2, t._3, t._5)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-12, s"${g._1}/${g._2} emd drift")
    }
  }

  test("skewness attack: an l-diverse group still fails t-closeness") {
    // group A exposes 6 DISTINCT sources (l-diversity passes at L=6)
    // but 95% of its mass sits on one value; group B mirrors the
    // near-uniform global distribution. l-diversity cannot tell them
    // apart — the EMD audit must.
    // B carries most of the corpus so the GLOBAL distribution is
    // near-uniform (hand-checked: A's EMD = 0.403, B's = 0.067 —
    // both sides of the 0.2 gate with margin)
    val srcs = (0 until 6).map(i => s"s$i")
    val a = (0 until 94).map(_ => ("en", 0L, "s0")) ++
      (1 until 6).map(i => ("en", 0L, s"s$i"))
    val b = (0 until 600).map(i => ("en", 1L, srcs(i % 6)))
    val docs = (a ++ b).toDF("lang", "bkt", "source")
    // both groups are l-diverse under the lDiversity criterion
    val lDiv = docs.groupBy(col("lang"), col("bkt"))
      .agg(countDistinct(col("source")).as("ls")).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(lDiv.values.forall(_ >= Anonymity.L),
      s"fixture groups must all be l-diverse: $lDiv")
    val got = Anonymity.tClosenessOf(docs).collect()
      .map(r => r.getLong(1) -> ((r.getDouble(3), r.getLong(4)))).toMap
    assert(got(0L)._2 == 0L,
      s"skewed-but-diverse group must FAIL t-closeness: ${got(0L)}")
    assert(got(1L)._2 == 1L,
      s"uniform group must pass: ${got(1L)}")
    assert(got(0L)._1 > got(1L)._1)
  }
}
