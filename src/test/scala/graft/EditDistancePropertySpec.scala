package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.EditDistanceAscii.distance

/** Property check for the byte-DP edit distance: metric axioms plus
  * parity with an independent reference implementation on arbitrary
  * ASCII strings. (Plain ScalaCheck generators driven from fixed seeds,
  * same setup as QuantilesPropertySpec — offline cache has no scalatest
  * bridge; fixed seeds keep failures reproducible.) */
class EditDistancePropertySpec extends SparkSpec {

  private val asciiGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i =>
      asciiGen(Gen.Parameters.default, Seed(i.toLong)))

  /** Independent reference: full-matrix recursive definition, memoized. */
  private def ref(a: String, b: String): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) dp(i)(0) = i
    for (j <- 0 to b.length) dp(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("edit_dist equals an independent full-matrix reference on 300 arbitrary ASCII pairs") {
    val ss = samples(600)
    ss.grouped(2).foreach { case Seq(a, b) =>
      assert(distance(a.getBytes, b.getBytes) == ref(a, b),
        s"mismatch on ${a.take(40)} vs ${b.take(40)}")
    case _ => ()
    }
  }

  test("edit_dist satisfies the metric axioms on sampled triples") {
    val ss = samples(90)
    ss.grouped(3).foreach { case Seq(a, b, c) =>
      val ab = distance(a.getBytes, b.getBytes)
      val ba = distance(b.getBytes, a.getBytes)
      val bc = distance(b.getBytes, c.getBytes)
      val ac = distance(a.getBytes, c.getBytes)
      assert(ab == ba, "symmetry")
      assert(distance(a.getBytes, a.getBytes) == 0, "identity")
      assert(ac <= ab + bc, s"triangle inequality: $ac > $ab + $bc")
      assert(ab >= math.abs(a.length - b.length), "length lower bound")
      assert(ab <= math.max(a.length, b.length), "length upper bound")
    case _ => ()
    }
  }
}
