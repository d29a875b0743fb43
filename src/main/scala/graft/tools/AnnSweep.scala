package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Recall/latency trade-off sweep for the IVF-PQ composite index
  * (`emb_ivfpq_topk`): nprobe ∈ {1,2,4} × shortlist ∈ {20,50,100} against
  * the replica-scaled corpus tiers — the tuning table a 100 TB deployment
  * reads before picking its operating point (recorded in BASELINE.md).
  *
  * recall@10 is measured against the exact brute-force top-10 for the
  * same query (vec_id 0, squared-L2 ascending, ties on id — identical
  * conventions to the entry's re-rank stage). Timing is one warmed pass
  * per configuration; these are tuning-table numbers, not gate numbers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.AnnSweep [mult ...]"    (default: 8 64)
  */
object AnnSweep {

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(8, 64)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    val out = mults.map { mult =>
      val srcKey = src.replaceAll("[^A-Za-z0-9.]", "_")
      val dir = s"/tmp/graft_scale_${srcKey}_x$mult"
      ScaleSmoke.buildScaledDir(spark, src, dir, mult)
      // ground truth: exact top-10 for query 0 over everything else
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("emb"))
        .withColumn("xx", expr("dot_f64(emb, emb)"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("emb").as("q_emb"), col("xx").as("qq"))
      val truth = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          (col("xx") - lit(2.0) * expr("dot_f64(emb, q_emb)") + col("qq"))
            .as("d2"))
        .orderBy(col("d2"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      val cells = for {
        nprobe <- Seq(1, 2, 4)
        shortlist <- Seq(20, 50, 100)
      } yield {
        def run() = graft.operators.Semantic
          .ivfPqSearch(spark, dir, nprobe, shortlist)
          .collect().map(_.getLong(0)).toSet
        run() // warm-up (JIT + page cache), result discarded
        val t0 = System.nanoTime()
        val got = run()
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (got & truth).size / 10.0
        System.err.println(
          f"[ann] x$mult nprobe=$nprobe shortlist=$shortlist " +
            f"recall@10=$recall%.2f ${sec}%.2f s")
        s"""{"nprobe":$nprobe,"shortlist":$shortlist,""" +
          s""""recall10":$recall,"sec":$sec}"""
      }
      s""""x$mult":[${cells.mkString(",")}]"""
    }
    println(s"""{"metric":"ann_sweep","sf":"$src",${out.mkString(",")}}""")
    spark.stop()
  }
}
