package graft

import graft.operators.Quantiles
import graft.operators.Quantiles.Spec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check: the iterative narrowing percentile must be bit-equal
  * to the built-in whole-group `percentile` on ARBITRARY distributions —
  * duplicates, negatives, heavy tails, tiny groups, any p. The example
  * specs pin known paths; this pins the rest of the space. (Plain
  * ScalaCheck generators driven from fixed seeds: the offline cache has
  * no scalatest bridge, and fixed seeds keep failures reproducible.) */
class QuantilesPropertySpec extends SparkSpec {

  private val valueGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-1000.0, 1000.0),
    Gen.choose(-1.0, 1.0),
    Gen.oneOf(0.0, 1.0, -1.0, 1e9, -1e9, 3.14),
    Gen.choose(1L, 20L).map(_.toDouble)) // heavy duplicate mass

  private val caseGen: Gen[(List[(String, Double)], Double)] = for {
    groups <- Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("a", "b", "c", "d")
      n <- Gen.choose(1, 40)
      vs <- Gen.listOfN(n, valueGen)
    } yield (g, vs))
    p <- Gen.choose(0.0, 1.0)
  } yield (groups.flatMap { case (g, vs) => vs.map(g -> _) }, p)

  test("exactPercentiles == builtin percentile on random distributions") {
    import spark.implicits._
    val params = Gen.Parameters.default.withSize(12)
    for (i <- 0 until 8) {
      val (rows, p) = caseGen.pureApply(params, Seed(42L + i))
      val df = rows.toDF("g", "v")
      // tiny sortThreshold + few buckets force the narrowing rounds to
      // do real work instead of short-circuiting to the sort
      val ours = Quantiles.exactPercentiles(df, "g",
          Seq(Spec("v", p, "q")), buckets = 4, sortThreshold = 3L)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val ref = df.groupBy(col("g"))
        .agg(expr(s"percentile(v, $p)").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(ours.keySet == ref.keySet, s"case $i: group sets differ")
      ref.foreach { case (g, want) =>
        assert(ours(g) == want,
          s"case $i group $g: got ${ours(g)}, builtin $want (p=$p)")
      }
    }
  }
}
