package graft

import graft.core.{MapReduce, MapReduceJob}
import graft.apps.NumberCount
import scala.util.Random

/** Properties of the MapReduce layer (SURVEY.md §5): the generic full-list
  * reduce path must agree with Spark's native aggregation, and the
  * Aggregator fast path must agree with a serial fold. Property-style
  * trials use seeded generators (scalatestplus bridge unavailable offline). */
class MapReduceSpec extends SparkSpec {
  import spark.implicits._

  test("MR(count) == groupBy().count() on seeded number_count data") {
    val ints = NumberCount.genInts(spark, 100000L, seed = 1000)
    val mr = NumberCount.runMapReduce(ints.select($"value").as[Int])
      .collect().toMap
    val native = NumberCount.runIdiomatic(ints)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(mr == native)
    assert(mr.values.sum == 100000L)
  }

  test("MR full-list reduce sees every value exactly once (flatMap semantics)") {
    val data = Seq((1, 2.0), (1, 3.0), (2, 5.0), (3, 7.0), (1, 11.0))
    val job = new MapReduceJob[(Int, Double), Int, Double, Double] {
      def map(in: (Int, Double)) = Iterator(in)
      def reduce(key: Int, vals: Iterator[Double]) =
        Iterator.single(vals.sum) // consumes the one-shot iterator fully
    }
    val out = MapReduce.run(data.toDS(), job).collect().toMap
    assert(out == Map(1 -> 16.0, 2 -> 5.0, 3 -> 7.0))
  }

  test("map may emit zero or many pairs per element (firebird flatMap contract)") {
    val job = new MapReduceJob[Int, Int, Int, Int] {
      def map(in: Int) = // 0 emissions for odds, 2 for evens
        if (in % 2 == 0) Iterator((in, 1), (in, 1)) else Iterator.empty
      def reduce(key: Int, vals: Iterator[Int]) = Iterator.single(vals.length)
    }
    val out = MapReduce.run((1 to 10).toDS(), job).collect().toMap
    assert(out == Map(2 -> 2, 4 -> 2, 6 -> 2, 8 -> 2, 10 -> 2))
  }

  test("runAggregated(min) == serial fold-min (property trials)") {
    val rnd = new Random(7)
    for (_ <- 1 to 5) {
      val xs = List.fill(1 + rnd.nextInt(500))(
        (rnd.nextInt(20), rnd.nextDouble() * 100 - 50))
      val ds = xs.toDS()
      val got = MapReduce.runAggregated[(Int, Double), Int, Double, Double](
        ds, p => Iterator(p), MapReduce.minAgg).collect().toMap
      val want = xs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      assert(got == want)
    }
  }

  test("runAggregated(count) == groupBy size (property trials)") {
    val rnd = new Random(11)
    for (_ <- 1 to 5) {
      val xs = List.fill(1 + rnd.nextInt(500))(rnd.nextInt(30))
      val got = MapReduce.runAggregated[Int, Int, Int, Long](
        xs.toDS(), x => Iterator((x, 1)), MapReduce.countAgg[Int])
        .collect().toMap
      val want = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == want)
    }
  }
}
