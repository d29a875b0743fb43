package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** High-tier timings for the pair-output dedup family on the
  * MUTATED-replica corpus ([[ScaleSmoke.buildMutatedDir]] — r12 verdict
  * item 3): twin-pair replicas keep planted near-dup pairs LINEAR in the
  * corpus, so these entries finally get honest 64×/512× rows (the
  * verbatim-replica sweep had to exclude them — quadratic pair output by
  * corpus construction).
  *
  * Per tier and entry: min-of-3 wall time plus the OUTPUT ROW COUNT, so
  * the linear-output claim is measured, not asserted — expected rows ≈
  * capture_rate · |docs| · mult/2 (+ organic near-dups × mult/2 groups),
  * both linear in mult.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.DedupTier [mult ...]"   (defaults 8 64 512)
  */
object DedupTier {

  val Entries = Seq("dedup_minhash_lsh", "dedup_simhash",
    "dedup_winnowing", "dedup_edit_verify")

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 64, 512)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = SparkEntry.queries
    // SPARK_GRAFT_ONLY=a,b restricts the sweep (the Verify convention)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val entries = Entries.filter(n => only.forall(_.contains(n)))
    mults.foreach { mult =>
      val srcKey = src.replaceAll("[^A-Za-z0-9.]", "_")
      val dir = s"/tmp/graft_mutated_${srcKey}_x$mult"
      ScaleSmoke.buildMutatedDir(spark, src, dir, mult)
      entries.foreach { n =>
        val fn = fns(n)
        fn(spark, dir).write.mode("overwrite").format("noop").save() // warm-up
        spark.catalog.clearCache()
        val runs = Seq.fill(3) {
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          val el = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          el
        }
        val rows = fn(spark, dir).count()
        spark.catalog.clearCache()
        println(f"MUTDUP x$mult%-4d $n%-22s min=${runs.min}%8.3f rows=$rows")
      }
    }
    spark.stop()
  }
}
