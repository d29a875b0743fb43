package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog wiring invariants: duplicate names or dangling bench entries
  * would silently shadow queries in the SparkEntry maps the driver
  * consumes. */
class CatalogSpec extends AnyFunSuite {

  test("query names are unique across all modules") {
    val names = graft.queries.Registry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate catalog names: ${dups.mkString(", ")}")
  }

  test("bench set is a subset of the query map; oracles are non-empty SQL") {
    val qs = SparkEntry.queries
    SparkEntry.benchQueries.foreach(n => assert(qs.contains(n), n))
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(qs.contains(n), n)
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH"), s"$n oracle looks malformed")
    }
  }

  test("catalog counts match the documented contract") {
    val all = graft.queries.Registry.all
    assert(all.size == 285, s"catalog size ${all.size}")
    assert(all.count(_.oracle.isDefined) == 283,
      s"oracle-backed ${all.count(_.oracle.isDefined)}")
    assert(all.count(_.bench) == 262, s"bench ${all.count(_.bench)}")
    // the only rows-only entries are the two engine-specific sketches
    assert(all.filter(_.oracle.isEmpty).map(_.name).toSet ==
      Set("q24_approx_distinct", "q49_approx_percentile"))
  }
}
