package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Pins the engine-parity assumptions the BPE oracle rests on, and proves
  * the Spark merge loop against an independent in-memory reference
  * implementation (plain greedy BPE on scala collections). */
class BpeSpec extends SparkSpec {

  val d = sf("sf0.001")

  test("replace() greedy-merge semantics match the BPE contract") {
    // the two cases that distinguish leftmost non-overlapping replacement:
    // overlapping identical pairs collapse left-first; consecutive
    // disjoint matches chain through the shared separator
    val rows = spark.sql(
      """SELECT replace('  a  a  a  ', ' a  a ', ' aa ') AS overlap,
                replace('  a  b  a  b  ', ' a  b ', ' ab ') AS chain""")
      .head()
    assert(rows.getString(0) == "  aa  a  ")
    assert(rows.getString(1) == "  ab  ab  ")
  }

  /** Independent reference: greedy BPE on scala collections. */
  private def referenceBpe(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    val words = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(w => words(w) = words.getOrElse(w, 0L) + 1))
    var states: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (k <- 1 to n) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      states.foreach { case (w, syms) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + words(w)
        }
      }
      if (pc.nonEmpty) {
        val ((a, b), c) = pc.minBy { case ((x, y), m) => (-m, x, y) }
        merges += ((k, a, b, c))
        states = states.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    merges.result()
  }

  test("text_bpe_vocab matches an independent reference implementation") {
    val texts = Tables.documents(spark, d).select(col("text"))
      .collect().map(_.getString(0)).toSeq
    val expected = referenceBpe(texts, Bpe.NumMerges)
    val got = Bpe.vocabQuery.fn(spark, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("text_bpe_encode token counts are consistent with the learned merges") {
    val enc = Bpe.encodeQuery.fn(spark, d).collect()
    assert(enc.nonEmpty)
    // every doc's token count is positive and no greater than its
    // character count (merges only shrink) and at least its word count
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { r =>
      val words = docs(r.getLong(0)).split(" ").filter(_.nonEmpty)
      val n = r.getLong(1)
      assert(n >= words.length, "merges cannot cross word boundaries")
      assert(n <= words.map(_.length).sum, "encoding cannot exceed chars")
    }
  }

  /** Independent byte-level reference: greedy BPE over UTF-8 byte atoms
    * with the '_'-joined merged-atom rendering the operator uses. */
  private def referenceByteBpe(
      texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    val words = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(w => words(w) = words.getOrElse(w, 0L) + 1))
    var states: Map[String, Vector[String]] = words.keys.map { w =>
      w -> w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => (b & 0xff).toString).toVector
    }.toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (k <- 1 to n) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      states.foreach { case (w, syms) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + words(w)
        }
      }
      if (pc.nonEmpty) {
        val ((a, b), c) = pc.toSeq.sortBy { case ((l, r), cnt) =>
          (-cnt, l, r) }.head
        merges += ((k, a, b, c))
        states = states.view.mapValues { syms =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += s"${a}_$b"; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result()
        }.toMap
      }
    }
    merges.result()
  }

  test("text_bpe_bytes matches an independent byte-level reference") {
    val texts = Tables.documents(spark, d).select(col("text"))
      .collect().map(_.getString(0)).toSeq
    val expected = referenceByteBpe(texts, Bpe.NumMerges)
    val got = Bpe.bytesVocabQuery.fn(spark, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("byte-BPE round-trips arbitrary UTF-8 (byte fallback: nothing is OOV)") {
    import spark.implicits._
    val merges = Bpe.bytesVocabQuery.fn(spark, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(merges.size == Bpe.NumMerges)
    // none of these words can appear in the ASCII corpus — byte fallback
    // must decompose multi-byte code points and round-trip them exactly
    val exotic = Seq("naïve", "Übermaß", "日本語テキスト", "emoji🙂🚀", "żółć",
      "הַצָּלָה", "mixedASCIIと日本語", "the", "a")
    val out = Bpe.encodeByteWords(exotic.toDF("word"), merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    exotic.foreach { w =>
      val toks = out(w)
      assert(toks.nonEmpty)
      assert(Bpe.decodeByteTokens(toks) == w, s"round-trip failed for $w")
      // every atom decodes to valid byte ids (0..255)
      toks.foreach(_.split("_").foreach { id =>
        val v = id.toInt; assert(v >= 0 && v <= 255, s"bad byte id $id")
      })
    }
    // corpus words actually compress: at least one merge applies somewhere
    val corpusWords = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "").distinct()
    val encoded = Bpe.encodeByteWords(corpusWords, merges)
      .select(col("word"), size(col("tokens")).as("n")).collect()
    val compressed = encoded.count(r => r.getInt(1) < r.getString(0)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
    assert(compressed > 0, "no corpus word compressed — merges inert")
  }
}
