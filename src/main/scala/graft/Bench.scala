package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline queries at SPARK_GRAFT_SF_DIR (sf0.1),
  * one JSON result line on stdout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = SparkEntry.queries
    // JIT/codegen/IO warmup outside the timed loop, so the first timed
    // query doesn't absorb one-time JVM startup cost
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      fns(SparkEntry.benchQueries.head)(spark, sfDir).write
        .mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }
    val results = SparkEntry.benchQueries.map { name =>
      val t0 = System.nanoTime()
      try { fns(name)(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable =>
        try { fns(name)(spark, sfDir).count() } catch { case _: Throwable => () }
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
