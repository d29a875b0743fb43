package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc A/B timer: `sbt "runMain graft.tools.TimeQuery name [name ...]"`
  * runs each named catalog query against SPARK_GRAFT_SF_DIR with one
  * untimed warm-up pass (JIT/codegen) and three timed passes, printing
  * min/median — the harness used for the measure-don't-guess decisions
  * recorded at cache/plan choice points (e.g. the `.cache()` A/Bs in
  * Dedup/TextAnalysis). Cache is cleared between passes so queries that
  * cache internally can't carry state across runs. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = graft.SparkEntry.queries
    args.foreach { n =>
      val fn = fns(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite")
          .format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        sec
      }
      once() // warm-up
      val runs = Seq.fill(3)(once()).sorted
      println(f"TIMEQ $n%-28s min=${runs.head}%.3f median=${runs(1)}%.3f sf=$sfDir")
    }
    spark.stop()
  }
}
