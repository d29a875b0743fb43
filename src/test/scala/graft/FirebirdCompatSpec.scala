package graft

import graft.core.FirebirdCompat
import scala.util.Random

/** The reference's number_count app ported literally through the compat
  * facade (same call shape as sample_apps/number_count/main.cpp:32-53). */
class FirebirdCompatSpec extends SparkSpec {
  import FirebirdCompatSpec.NumberCountJob

  def newJob(): NumberCountJob = new NumberCountJob(spark)

  test("number_count through the firebird-shaped API") {
    val rnd = new Random(1000)
    val ints = Seq.fill(100000)(rnd.nextInt(100))
    val job = newJob()
    job.set_input(ints)          // ≅ main.cpp:38
    job.set_unit_size(10)        // ≅ firebird.h default unit size
    job.set_num_map_thread(8)    // ≅ firebird.h:139-164 (advisory)
    job.run()                    // ≅ main.cpp:42
    val out = job.get_output().toMap // ≅ main.cpp:45
    val want = ints.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out == want)
    assert(out.values.sum == 100000L)
  }

  test("empty input produces empty output, not an error") {
    val job = newJob()
    job.set_input(Seq.empty)
    job.run()
    assert(job.get_output().isEmpty)
  }
}

object FirebirdCompatSpec {
  import org.apache.spark.sql.SparkSession

  /** Top-level (serializable closure) port of the number_count app. */
  class NumberCountJob(s: SparkSession)
      extends FirebirdCompat[Int, Int, Int, Long](s)(
        s.implicits.newIntEncoder, scala.reflect.classTag[Int],
        s.implicits.newIntEncoder,
        s.implicits.newProductEncoder[(Int, Int)],
        s.implicits.newProductEncoder[(Int, Long)]) {
    def map(in: Int): IterableOnce[(Int, Int)] = Iterator((in, 1))
    def reduce(key: Int, vals: Iterator[Int]): IterableOnce[Long] = {
      var n = 0L
      while (vals.hasNext) { vals.next(); n += 1 }
      Iterator.single(n)
    }
  }
}
