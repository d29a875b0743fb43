package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Quantiles

/** Property check for the two-level prefix-sum discrete selection
  * (`Quantiles.valueAtRanks`): on ARBITRARY value multisets — negatives,
  * duplicates, heavy tails, single-element — the value returned for rank
  * k must equal `sorted(values)(k)`. Same fixed-seed ScalaCheck setup as
  * QuantilesPropertySpec. */
class SelectionPropertySpec extends SparkSpec {

  private val valueGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-1000.0, 1000.0),
    Gen.choose(-1.0, 1.0),
    Gen.oneOf(0.0, -0.0, 1.0, -1.0, 1e7, -1e7, 3.14),
    Gen.choose(1, 20).map(_.toDouble)) // dense duplicates

  private def dataset(seed: Long): List[Double] = {
    val gen = Gen.chooseNum(1, 400).flatMap(n => Gen.listOfN(n, valueGen))
    gen(Gen.Parameters.default, Seed(seed)).get
  }

  test("valueAtRanks equals a local sort at sampled ranks on arbitrary multisets") {
    import spark.implicits._
    for (seed <- 0L until 12L) {
      val vs = dataset(seed)
      val sorted = vs.sorted
      val n = vs.size.toLong
      val ks = Seq(0L, n / 4, n / 2, (3 * n) / 4, n - 1).distinct
      val ranks = ks.map(k => s"r$k" -> lit(k).cast("double"))
      // widths deliberately varied: fractional, unit, and coarse buckets
      for (width <- Seq(0.37, 1.0, 250.0)) {
        val row = Quantiles.valueAtRanks(
          vs.toDF("v"), "v", width, ranks).collect().head
        ks.zipWithIndex.foreach { case (k, i) =>
          val got = row.getDouble(i)
          val want = sorted(k.toInt)
          assert(got == want,
            s"seed=$seed width=$width rank=$k: got $got want $want (n=$n)")
        }
      }
    }
  }
}
