package graft

import org.apache.spark.sql.functions._
import graft.operators.HtmlExtract

/** Fixture specs for HTML main-content extraction: a hand-built page
  * where boilerplate ≠ main text exercises every classifier branch, and
  * the corpus entry must recover each document's original article. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  test("classifier branches: length floor, link density, inline-link tolerance") {
    val page = Seq(
      // long, link-free article paragraph — KEPT
      """<p>The committee published its annual findings on water quality across the region today</p>""",
      // long paragraph with a short inline link — KEPT (density below 1/3)
      """<p>Reservoir levels recovered strongly after the wet winter season <a href="/ref">see also</a></p>""",
      // long enough but all link text — DROPPED by density alone
      """<div class="ad"><a href="?ref=ad">Subscribe to our newsletter today</a></div>""",
      // short and link-free — DROPPED by the length floor alone
      """<p>Short note</p>""",
      // short AND link-dominated (nav) — DROPPED by both
      """<div class="nav"><a href="/">Home</a> <a href="/about">About</a></div>""",
      // mixed footer: passes length, fails density — DROPPED
      """<div class="footer"><a href="/tos">Terms of Service</a> <a href="/privacy">Privacy Policy</a> All rights reserved</div>"""
    ).mkString("\n")
    val got = HtmlExtract.extractMainOf(
      Seq((1L, page)).toDF("doc_id", "html")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 6 && r.getLong(2) == 2, "6 blocks, 2 kept")
    val want = "The committee published its annual findings on water " +
      "quality across the region today Reservoir levels recovered " +
      "strongly after the wet winter season see also"
    assert(r.getString(4) == want)
    assert(r.getLong(3) == want.length.toLong)
  }

  test("tag strip collapses attribute-bearing and nested tags to clean text") {
    val page = """<p><b>Bold</b> and <i>italic</i> words survive the strip with single spaces between them</p>"""
    val got = HtmlExtract.extractMainOf(
      Seq((7L, page)).toDF("doc_id", "html")).collect().head
    assert(got.getString(4) ==
      "Bold and italic words survive the strip with single spaces between them")
  }

  test("text_extract_main recovers exactly the original article text") {
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("text_extract_main")(spark, d).collect()
    assert(got.length == docs.size && got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val toks = docs(id).split(" ", -1)
      // serial model of the wrapper + extractor: paragraphs of ≤25 tokens
      // all survive (save sub-25-char tail fragments); every boilerplate
      // block dies; the see-also anchor text rides along on 1-in-3 docs
      val paras = toks.grouped(25).zipWithIndex.map { case (c, i) =>
        c.mkString(" ") + (if (i == 0 && id % 3 == 0) " see also" else "")
      }.toSeq
      val kept = paras.filter(_.length >= HtmlExtract.MinBlockChars)
      assert(r.getString(4) == kept.mkString(" "), s"doc $id main text")
      val nBoiler = if (id % 2 == 0) 4L else 3L // nav [ad] related footer
      assert(r.getLong(1) == nBoiler + paras.length, s"doc $id n_blocks")
      assert(r.getLong(2) == kept.length.toLong, s"doc $id n_kept")
      assert(r.getLong(3) == kept.mkString(" ").length.toLong)
    }
    // fixture honesty: at least one doc carries the inline link, and no
    // boilerplate block ever leaks into any main text
    assert(got.exists(r => r.getLong(0) % 3 == 0 &&
      r.getString(4).endsWith("see also") || r.getString(4).contains("see also")))
    got.foreach { r =>
      val m = r.getString(4)
      assert(!m.contains("Home") && !m.contains("Subscribe") &&
        !m.contains("Related story") && !m.contains("rights reserved"),
        s"boilerplate leaked into doc ${r.getLong(0)}")
    }
  }
}
