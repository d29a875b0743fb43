package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.apps.ShortestPath

/** Scratch profiler for the sssp_synthetic loop: per-job wall + stage/task
  * counts. Measurement tooling only. */
object SsspProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SSSP_PROFILE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var stages = 0
    @volatile var tasks = 0
    val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobT0.put(j.jobId, System.nanoTime())
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
        lines.add(f"  stage ${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%3d ${s.stageInfo.name.take(80)}")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobT0.get(j.jobId)).getOrElse(0L)
        lines.add(f"job ${j.jobId}%3d wall=${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      }
    })
    // warm-up
    ShortestPath.distributedSssp(
      ShortestPath.syntheticGraph(spark, 1000L), 0L).count()
    Thread.sleep(500)
    lines.clear(); stages = 0; tasks = 0
    val t0 = System.nanoTime()
    val n = ShortestPath.distributedSssp(
      ShortestPath.syntheticGraph(spark, 1000L), 0L).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.forEach(l => println(l))
    println(f"TOTAL nodes=$n wall=$wall%.2f s stages=$stages tasks=$tasks")
    spark.stop()
  }
}
