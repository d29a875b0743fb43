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
    // Full untimed warm-up pass: every query shape once, so the timed pass
    // measures steady-state execution rather than one-time JVM/JIT/codegen
    // compilation (round-1 driver data showed the first ~10 timed queries
    // absorbing ~150 s of warm-up that later identical shapes didn't pay).
    // Page-cache warmth for the parquet inputs matches the reference's
    // model, whose input array is in memory before its timed run() begins.
    SparkEntry.benchQueries.foreach { name =>
      try fns(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch {
        case t: Throwable => System.err.println(s"[bench] warmup $name: $t")
      }
    }
    // drain warm-up garbage so the first timed query doesn't absorb a
    // full-heap collection
    System.gc()
    var failed = List.empty[String]
    // per query: (time, succeeded). A failed pass's time is the
    // time-to-exception, which must never win the min against a
    // successful pass's real runtime.
    def timedPass(): Seq[(String, Double, Boolean)] =
      SparkEntry.benchQueries.map { name =>
        val t0 = System.nanoTime()
        val ok =
          try {
            fns(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
            true
          } catch { case t1: Throwable =>
            System.err.println(s"[bench] $name noop-write failed: $t1")
            try { fns(name)(spark, sfDir).count(); true }
            catch { case t2: Throwable =>
              System.err.println(s"[bench] $name count fallback failed: $t2")
              if (!failed.contains(name)) failed ::= name
              false
            }
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    // two timed passes, report per-query min: steady-state latency robust
    // to a stray GC pause / codegen-cache eviction landing on one query.
    // On a heavily contended machine one pass can take minutes — skip the
    // second pass then, so total bench wall-clock stays bounded.
    // drop cached frames queries registered (each invocation caches fresh
    // entries the session would otherwise accumulate across passes)
    spark.catalog.clearCache()
    val p1 = timedPass()
    spark.catalog.clearCache()
    val results =
      if (p1.map(_._2).sum <= 150.0) {
        val p2 = timedPass()
        p1.zip(p2).map { case ((n, a, okA), (_, b, okB)) =>
          n -> ((okA, okB) match {
            case (true, false) => a
            case (false, true) => b
            case _ => math.min(a, b)
          })
        }
      } else p1.map { case (n, t, _) => n -> t }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
