package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Pins the degenerate-input contract of the shared text primitives:
  * documents SHORTER than the shingle width must produce zero shingles —
  * matching the DuckDB oracle spelling (`range(1, len-(n-2))` is empty),
  * not Spark's raw `sequence(1, size-(n-1))`, which descends below 1 and
  * silently reads tokens from the array END via negative `element_at`
  * indexes. The corpus fixtures never exercise short docs, so only a
  * direct test keeps the seven shinglesSql call sites honest. */
class TextFunctionsSpec extends SparkSpec {

  private def shingleCounts(n: Int): Map[Int, Seq[String]] = {
    import spark.implicits._
    (0 to 9)
      .map(k => (k, (1 to k).map(i => s"w$i").mkString(" ")))
      .toDF("k", "text")
      .select(col("k"),
        expr(TextFunctions.shinglesSql("split(text, ' ')", n)).as("sh"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1))
      .toMap
  }

  test("shinglesSql yields exactly max(0, size-n+1) shingles, never junk") {
    for (n <- Seq(2, 3, 8)) {
      val got = shingleCounts(n)
      for (k <- 0 to 9) {
        // k=0 is the empty-string doc: split gives [""], size 1
        val size = math.max(k, 1)
        val expected = math.max(0, size - n + 1)
        assert(got(k).size == expected,
          s"n=$n, $k-token doc: got ${got(k).size} shingles ${got(k)}")
      }
      // spot-check content: first shingle of the 9-token doc
      assert(got(9).head == (1 to n).map(i => s"w$i").mkString(" "))
    }
  }

  test("shingle guard does not disturb full-width documents") {
    import spark.implicits._
    val sh = Seq("a b c d").toDF("text")
      .select(expr(TextFunctions.shinglesSql("split(text, ' ')", 2)).as("s"))
      .collect().head.getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
  }

  test("roll_hash61 matches a serial BigInt fold, interpreted AND codegen") {
    import spark.implicits._
    graft.functions.HashExpressions.register(spark)
    val M = BigInt(graft.functions.RollingHashMersenne61.Mod61)
    def serial(s: String): Long =
      s.getBytes("UTF-8").foldLeft(BigInt(0)) { (h, b) =>
        (h * 131 + (b & 0xff)) % M
      }.toLong
    // adversarial inputs: long runs of 0xFF-ish high bytes push the
    // intermediate h toward 2^61 so the multiplyHigh reduction's carry
    // paths all fire; plus randoms and the empty string
    val rnd = new scala.util.Random(61)
    val inputs = Seq("", "a", "~" * 200, "5139.82|1-URGENT") ++
      (1 to 50).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      (1 to 20).map(i => ("ÿ" * i) + "x") // 2-byte UTF-8, still bytes
    val got = inputs.toDF("s")
      .select(col("s"), expr("roll_hash61(s)").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s =>
      assert(got(s) == serial(s), s"input ${s.take(20)}…")
    }
    // interpreted path (nullSafeEval) agrees with codegen
    inputs.foreach { s =>
      val e = graft.functions.RollingHashMersenne61(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType))
      assert(e.eval(null) == serial(s), s"eval path, input ${s.take(20)}…")
    }
  }
}
