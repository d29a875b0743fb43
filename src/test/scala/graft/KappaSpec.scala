package graft

import org.apache.spark.sql.functions._

/** `eval_kappa` — the serial-formula guard (r13 verdict item 9): the
  * entry's single output row must equal Cohen's κ recomputed on the
  * driver with BigInt arithmetic from the two gates' own outputs. */
class KappaSpec extends SparkSpec {

  test("eval_kappa equals the serial BigInt formula over the two gates") {
    val d = sf("sf0.001")
    val ka = graft.operators.TextScoring.qualityTrain.fn(spark, d)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kb = graft.operators.Eval.keepCalibrated.fn(spark, d)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ids = ka.keySet & kb.keySet
    assert(ids.nonEmpty)
    val n11 = ids.count(i => ka(i) == 1 && kb(i) == 1).toLong
    val n10 = ids.count(i => ka(i) == 1 && kb(i) == 0).toLong
    val n01 = ids.count(i => ka(i) == 0 && kb(i) == 1).toLong
    val n00 = ids.count(i => ka(i) == 0 && kb(i) == 0).toLong
    val n = ids.size.toLong
    val pe = BigInt(n11 + n10) * BigInt(n11 + n01) +
      BigInt(n01 + n00) * BigInt(n10 + n00)
    val den = BigInt(n) * BigInt(n) - pe
    val num = BigInt(n) * BigInt(n11 + n00) - pe
    val got = graft.operators.Eval.kappa.fn(spark, d).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((n, n11, n10, n01, n00)))
    if (den == 0) assert(r.isNullAt(5))
    else {
      val want = num.toDouble / den.toDouble
      assert(r.getDouble(5) == want,
        s"kappa ${r.getDouble(5)} != serial $want")
      // the two gates are built from correlated signals; agreement must
      // at least beat chance on the driver corpus
      assert(r.getDouble(5) > 0.0)
      info(f"kappa = ${r.getDouble(5)}%.3f " +
        f"(agree ${(n11 + n00).toDouble / n}%.3f)")
    }
  }
}
