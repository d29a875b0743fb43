package graft

import org.apache.spark.sql.functions._

/** The two catalog entries without a DuckDB oracle are engine-specific
  * sketches (`q24_approx_distinct`, `q49_approx_percentile`). This suite
  * bounds each against its oracle-exact twin on sf0.01, turning
  * "unverifiable" into "CI-asserted ε-bounded":
  *  - HLL++ distinct counts within 5 % relative error of
  *    `q20_count_distinct` (Spark's default rsd is 5 %);
  *  - Greenwald-Khanna percentiles within rank-ε of the target rank,
  *    ε = 1/accuracy = 1/1000 (the GK guarantee), checked by ranking the
  *    sketch's answer back in the actual column.
  */
class SketchBoundsSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("q24_approx_distinct is within 5% of exact q20_count_distinct") {
    val approx = SparkEntry.queries("q24_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("q20_count_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((flag, ex) <- exact) {
      val ap = approx(flag)
      val relErr = math.abs(ap - ex).toDouble / ex
      assert(relErr <= 0.05,
        s"flag $flag: approx $ap vs exact $ex (relErr $relErr)")
    }
  }

  test("q49_approx_percentile is within rank-eps of the exact target rank") {
    val eps = 1.0 / 1000 // the accuracy passed to approx_percentile
    val approx = SparkEntry.queries("q49_approx_percentile")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("double").as("p"))
      .cache()
    try {
      for ((flag, (medQty, p90Price)) <- approx;
           (valueCol, pct, v) <- Seq(("q", 0.5, medQty), ("p", 0.9, p90Price))) {
        val grp = li.filter(col("l_returnflag") === flag &&
          col(valueCol).isNotNull)
        val n = grp.count()
        val lt = grp.filter(col(valueCol) < v).count()
        val le = grp.filter(col(valueCol) <= v).count()
        val target = pct * (n - 1)
        val slack = eps * n + 1
        // the sketch value occupies ranks [lt, le-1]; that interval must
        // come within eps*n of the exact target rank
        assert(lt - slack <= target && target <= le - 1 + slack,
          s"flag $flag $valueCol p$pct: value $v ranks [$lt,${le - 1}], " +
            s"target $target, slack $slack")
      }
    } finally li.unpersist()
  }
}
