package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

/** `text_unigram_vocab` / `text_unigram_encode` — the unigram-LM
  * tokenizer's BpeSpec-class guards: the MaxPos unroll envelope
  * (asserted loudly, the Triangles deg < 2^30 convention), hand-checked
  * Viterbi segmentations, the char-fallback encode→decode identity on
  * the exotic-script fixture, and exact full-coverage accounting of the
  * learned segmentation on the driver corpus. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("MaxPos envelope: corpus word lengths fit the unrolled DP") {
    Seq("sf0.001", "sf0.01").foreach { sfn =>
      val mx = Tables.documents(spark, sf(sfn))
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .agg(max(length(col("w")))).head().getInt(0)
      assert(mx <= Unigram.MaxPos,
        s"$sfn max word length $mx exceeds the ${Unigram.MaxPos}-stage unroll")
    }
  }

  test("viterbi picks fewest-cheapest pieces on a hand-checked vocab") {
    // 'ab' frequent, single chars rare: cost(ab) < cost(a)+cost(b) and
    // one piece beats two at equal counts, so "abab" → [ab, ab],
    // "ba" → [b, a] (no multi-char piece matches), "cab" → [c, ab]
    val vocab = Seq(("ab", 100L), ("a", 2L), ("b", 2L), ("c", 2L))
      .toDF("piece", "cnt")
    val words = Seq("abab", "ba", "cab").toDF("word")
    val got = Unigram.segmentWords(words, vocab).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("abab") == List("ab", "ab"), got.toString)
    assert(got("ba") == List("b", "a"), got.toString)
    assert(got("cab") == List("c", "ab"), got.toString)
  }

  test("char fallback: encode→decode identity on the exotic-script fixture") {
    // the BpeSpec exotic fixture (CJK, combining marks, emoji incl.
    // surrogate pairs): pieces are substrings, so concatenating the
    // path must reproduce the word EXACTLY — chars absent from the
    // vocab enter as cnt-0 fallback pieces, total for any word
    val exotic = Seq("naïve", "Übermaß", "日本語テキスト", "emoji🙂🚀", "żółć",
      "הַצָּלָה", "mixedASCIIと日本語", "the", "a")
    val vocab = Seq(("th", 10L), ("e", 5L), ("ix", 3L)).toDF("piece", "cnt")
    val got = Unigram.segmentWords(exotic.toDF("word"), vocab).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    exotic.foreach { w =>
      assert(got.contains(w), s"'$w' produced no segmentation")
      assert(got(w).mkString("") == w,
        s"decode identity broken for '$w': ${got(w)}")
      assert(got(w).forall(_.nonEmpty))
    }
  }

  test("EM output: full coverage, exact count accounting, pruned width") {
    val d = sf("sf0.001")
    val w = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("len", length(col("word")).cast("long"))
    val (vocab, used) = Unigram.emLearn(w)
    val vRows = vocab.collect().map(r => r.getString(0) -> r.getLong(1))
    // pruned width: all single chars + at most TargetPieces multi-char
    val (chars, multi) = vRows.partition(_._1.length == 1)
    assert(multi.length <= Unigram.TargetPieces,
      s"${multi.length} multi-char pieces survive the prune")
    assert(chars.nonEmpty)
    // full coverage: the chosen pieces tile each word exactly
    val cover = used.groupBy(col("word"))
      .agg(sum(length(col("piece"))).as("cov"))
      .join(w, "word")
      .filter(col("cov") =!= col("len")).count()
    assert(cover == 0L, s"$cover words not exactly tiled")
    // count accounting: vocab counts are EXACTLY the freq-weighted
    // usage of each piece on the E2 paths
    val usage = used.groupBy(col("piece")).agg(sum(col("freq")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vRows.foreach { case (p, c) =>
      assert(c == usage.getOrElse(p, 0L), s"piece '$p' count drift")
    }
    // the trainer learned something: at least one multi-char piece is
    // actually used (cnt > 0)
    assert(multi.exists(_._2 > 0L), "no multi-char piece in use")
  }

  test("pre-chunking: >MaxPos words segment with full coverage accounting") {
    // r14 verdict item 3: words longer than the MaxPos unroll are
    // pre-chunked into ≤ MaxPos-char pieces before the DP, so they
    // segment totally instead of silently producing no rows. Fixtures
    // cross chunk boundaries at 20, 2·MaxPos+5 and 3·MaxPos chars.
    val long1 = "internationalization"          // 20 chars: chunks 16+4
    val long2 = "ab" * (Unigram.MaxPos) + "cdefg" // 37 chars: 16+16+5
    val long3 = "x" * (3 * Unigram.MaxPos)      // exact multiple: 16·3
    val words = Seq(long1, long2, long3, "short")
    val vocab = Seq(("inte", 50L), ("rnat", 30L), ("tion", 40L),
      ("ab", 25L), ("sh", 10L), ("ort", 10L)).toDF("piece", "cnt")
    val got = Unigram.segmentWords(words.toDF("word"), vocab).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      assert(got.contains(w), s"'$w' produced no segmentation")
      // decode identity == exact full-coverage accounting: the pieces
      // tile the word with no gap and no overlap
      assert(got(w).mkString("") == w, s"coverage broken for '$w': ${got(w)}")
      assert(got(w).forall(p => p.nonEmpty && p.length <= Unigram.MaxPiece))
    }
    // chunk boundaries are respected: no piece of long2 straddles
    // position 16, so the frequent 'ab' piece tiles each chunk interior
    assert(got(long2).count(_ == "ab") >= 14, got(long2).toString)
  }

  test("deterministic: two independent runs produce identical vocab") {
    val d = sf("sf0.001")
    val a = graft.operators.Unigram.vocabQuery.fn(spark, d).collect().toSeq
    val b = graft.operators.Unigram.vocabQuery.fn(spark, d).collect().toSeq
    assert(a == b)
  }
}
