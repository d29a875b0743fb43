package graft

import graft.operators.Mis
import org.apache.spark.sql.functions._

/** Luby MIS: serial round-parity, independence, maximality, and the
  * unrolled-oracle convergence headroom. */
class MisSpec extends SparkSpec {

  private val n = Mis.N
  private def edges: Seq[(Long, Long)] = {
    val base = (0L until n).flatMap(i =>
      Seq((i, (i + 1) % n), (i, (i * 7 + 11) % n)))
    base.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2)
  }

  private def serialLuby(): (Set[Long], Int) = {
    val nbr = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var alive = (0L until n).toSet
    var mis = Set.empty[Long]
    var rounds = 0
    while (alive.nonEmpty) {
      rounds += 1
      def p(id: Long) = ((id + 131L * rounds) * 2654435761L) % 1000000007L
      val sel = alive.filter { v =>
        nbr.getOrElse(v, Seq.empty).filter(alive).forall(u => p(v) < p(u))
      }
      mis ++= sel
      alive --= sel
      alive --= sel.flatMap(v => nbr.getOrElse(v, Seq.empty))
    }
    (mis, rounds)
  }

  test("graph_mis equals the serial Luby simulation; independent and maximal") {
    val got = Mis.mis.fn(spark, "unused").collect().map(_.getLong(0)).toSet
    val (want, rounds) = serialLuby()
    assert(got == want)
    // convergence headroom vs the unrolled oracle bound
    assert(rounds <= Mis.MisRounds - 2,
      s"converged in $rounds; oracle unrolls ${Mis.MisRounds} — need headroom")
    // independence: no edge inside the set
    val nbr = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.forall(v => nbr.getOrElse(v, Set.empty).intersect(got).isEmpty))
    // maximality: every excluded node has a MIS neighbor
    assert(((0L until n).toSet -- got)
      .forall(v => nbr.getOrElse(v, Set.empty).exists(got)))
    assert(got.nonEmpty)
  }
}
