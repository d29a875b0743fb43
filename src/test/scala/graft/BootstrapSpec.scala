package graft

import org.apache.spark.sql.functions._
import graft.operators.Bootstrap

/** Serial re-derivation of the Poisson-bootstrap CI plus the statistical
  * sanity checks (coverage of the point estimate, replica mass). */
class BootstrapSpec extends SparkSpec {

  private val P = Bootstrap.P
  private val cdf = Bootstrap.Cdf.map(_.toDouble)

  private def mult(key: Long): Long = {
    val h = ((key % P) * (key % P) % P * 1103515245L % P +
      key * 12345L % P + 104729L) % P
    val u = h.toDouble / P.toDouble
    val k = cdf.indexWhere(u < _)
    if (k < 0) 7L else k.toLong
  }

  test("stat_bootstrap_ci matches a serial Poisson-bootstrap model") {
    val d = sf("sf0.001")
    val rows = Tables.orders(spark, d)
      .select(col("o_orderkey").cast("long"),
        col("o_totalprice").cast("decimal(12,2)")).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1))
    val reps = (0 until Bootstrap.B).map { b =>
      var sum = java.math.BigDecimal.ZERO
      var n = 0L
      rows.foreach { case (k, p) =>
        val m = mult(k * Bootstrap.B + b)
        if (m > 0) {
          sum = sum.add(p.multiply(java.math.BigDecimal.valueOf(m)))
          n += m
        }
      }
      (sum.doubleValue() / n.toDouble, n)
    }
    val means = reps.map(_._1).sorted
    val got = SparkEntry.queries("stat_bootstrap_ci")(spark, d).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == Bootstrap.B.toLong)
    assert(r.getLong(1) == reps.map(_._2).min)
    assert(r.getDouble(2) == means(1), "ci_lo is the 2nd order statistic")
    assert(r.getDouble(3) == means(Bootstrap.B - 2),
      "ci_hi is the 63rd order statistic")
    // statistical sanity: the interval is proper and covers the point
    // estimate (it would take a pathological corpus to violate this)
    val exact = {
      val s = rows.map(_._2.doubleValue()).sum
      s / rows.length
    }
    assert(r.getDouble(2) < r.getDouble(3))
    assert(exact >= r.getDouble(2) && exact <= r.getDouble(3),
      s"mean $exact outside [${r.getDouble(2)}, ${r.getDouble(3)}]")
    // Poisson(1) mass: every replica resamples ~n rows (±5 sigma)
    val n = rows.length.toDouble
    reps.foreach { case (_, ne) =>
      assert(math.abs(ne - n) < 5 * math.sqrt(n), s"replica mass $ne vs $n")
    }
  }
}
