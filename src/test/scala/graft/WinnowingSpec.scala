package graft

import org.apache.spark.sql.functions._
import graft.operators.Winnowing

/** Serial-model and guarantee specs for winnowing fingerprints. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def rh(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xffL)) % 1000000007L)

  /** Serial winnow: distinct minima of every full w-window of k-gram
    * hashes (no frequency cull — callers apply it). */
  private def serialFp(text: String): Set[Long] = {
    val t = text.split(" ", -1)
    if (t.length < Winnowing.K) return Set.empty
    val gh = (0 to t.length - Winnowing.K)
      .map(j => rh(t.slice(j, j + Winnowing.K).mkString(" ")))
    if (gh.length < Winnowing.W) return Set.empty
    gh.sliding(Winnowing.W).map(_.min).toSet
  }

  test("fingerprintsOf matches the serial winnow model per document") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "an entirely different text with its own words flowing here nicely"),
      (3L, "short doc below gram size"),
      (4L, "one two three four five six seven eight nine")
    )
    val got = Winnowing.fingerprintsOf(
      docs.toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("t")))
      .collect().groupBy(_.getLong(0))
      .map { case (k, xs) => k -> xs.map(_.getLong(1)).toSet }
    // no fingerprint here is shared by >64 docs, so the cull is a no-op
    // and the serial model applies directly
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) == serialFp(text), s"doc $id")
    }
    // the 4-token-minus doc yields nothing; 9 tokens → 6 grams → 2 windows
    assert(!got.contains(3L) && got(4L).nonEmpty)
  }

  test("shared substring of length >= w+k-1 guarantees a shared fingerprint") {
    // 8 shared tokens (= W+K-1) embedded in otherwise-disjoint documents
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val a = s"red green blue $passage cyan magenta yellow black white"
    val b = s"north south east west up $passage down left right forward"
    val fa = serialFp(a)
    val fb = serialFp(b)
    assert((fa & fb).nonEmpty, "winnowing guarantee violated serially")
    val got = Winnowing.fingerprintsOf(
      Seq((10L, a), (11L, b)).toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("t")))
      .collect().groupBy(_.getLong(0))
      .map { case (k, xs) => k -> xs.map(_.getLong(1)).toSet }
    assert((got(10L) & got(11L)).nonEmpty, "guarantee violated in-plan")
    assert(got(10L) == fa && got(11L) == fb)
  }

  test("over-common fingerprints are culled (MOSS boilerplate rule)") {
    // 70 docs (> MaxDocFreq) all opening with the same 9-token banner,
    // each followed by a long unique tail that yields its own prints
    val banner = "this document is confidential property of acme corporation"
    val docs = (0 until 70).map { i =>
      val tail = (0 until 12).map(j => s"tail${i}w$j").mkString(" ")
      (i.toLong, s"$banner $tail")
    }
    val got = Winnowing.fingerprintsOf(
      docs.toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("t")))
      .collect().groupBy(_.getLong(0))
      .map { case (k, xs) => k -> xs.map(_.getLong(1)).toSet }
    // banner-only fingerprints (grams fully inside the banner) appear in
    // all 70 docs -> culled everywhere
    val bannerFp = serialFp(banner)
    got.values.foreach(s => assert((s & bannerFp).isEmpty, "banner survived"))
    // but every doc keeps its unique-tail fingerprints
    assert(got.size == 70 && got.values.forall(_.nonEmpty))
  }

  test("dedup_winnowing surfaces corpus near-dups with exact Jaccard algebra") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("dedup_winnowing")(spark, d).collect()
    assert(got.nonEmpty, "no winnowing pairs at sf0.001")
    got.foreach { r =>
      val (a, b, sh, sa, sb, j) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a < b && sh >= Winnowing.MinShared)
      assert(sh <= math.min(sa, sb))
      assert(j == sh.toDouble / (sa + sb - sh).toDouble)
    }
    // descending-shared order with (a, b) tie-break
    val keys = got.map(r => (-r.getLong(2), r.getLong(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted))
  }
}
