package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.apps.ShortestPath

/** Timing harness for the iterative SSSP app on the reference's syn.graph
  * (18,263 nodes / 23,797 undirected edges — its own scale workload).
  * `sbt "runMain graft.tools.SsspBench [path]"` */
object SsspBench {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      "/root/reference/sample_apps/shortest_path/syn.graph")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = ShortestPath.loadGraph(spark, path)
    println(s"edges: ${edges.count()}")
    val t0 = System.nanoTime()
    val dist = ShortestPath.sssp(edges, 0L)
    val n = dist.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SSSP_RESULT nodes=$n time=$secs%.1fs")
    dist.orderBy(col("node")).show(5)
    spark.stop()
  }
}
