package graft

import org.apache.spark.sql.functions._

/** Serial-model specs for the round-11 curation entries: stupid-backoff
  * trigram LM scoring re-derived doc-by-doc in plain Scala, and the URL
  * normalizer checked against an independent serial RFC-3986 cleanup of
  * the raw URLs the query itself emits. */
class UrlTrigramSpec extends SparkSpec {

  /** Same polynomial rolling hash as the `roll_hash` codegen expression
    * (ASCII corpus ⇒ byte == codepoint == DuckDB `unicode`). */
  private def rh(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xffL)) % 1000000007L)

  test("text_trigram_backoff matches a serial stupid-backoff model") {
    // sf0.01, not sf0.001: the smaller corpus never leaves the bigram
    // level (every held-out (w2,w3) bigram is in training), so only
    // sf0.01 exercises the unigram floor the fixture assertions demand
    val d = sf("sf0.01")
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val train = docs.filter(_._1 % 5 != 0).map(_._2)
    def grams(t: Seq[String], n: Int): Seq[String] =
      if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
    def counts(gs: Seq[String]): Map[Long, Long] =
      gs.groupBy(rh).map { case (k, xs) => k -> xs.length.toLong }
    val c3 = counts(train.flatMap(grams(_, 3)))
    val c2 = counts(train.flatMap(grams(_, 2)))
    val c1 = counts(train.toSeq.flatten)
    val nTok = c1.values.sum
    val vUni = c1.size.toLong
    val model = docs.filter(_._2.length >= 3).map { case (id, t) =>
      val terms = (0 until t.length - 2).map { j =>
        val (w1, w2, w3) = (t(j), t(j + 1), t(j + 2))
        val h3 = rh(s"$w1 $w2 $w3")
        if (c3.contains(h3)) {
          (3, Math.log(c3(h3).toDouble / c2(rh(s"$w1 $w2")).toDouble))
        } else if (c2.contains(rh(s"$w2 $w3"))) {
          (2, Math.log((0.4 * c2(rh(s"$w2 $w3")).toDouble) /
            c1(rh(w2)).toDouble))
        } else {
          (1, Math.log((0.16 * (c1.getOrElse(rh(w3), 0L) + 1L).toDouble) /
            (nTok + vUni).toDouble))
        }
      }
      // position-order left fold — the query's sorted-struct aggregate order
      val score = terms.foldLeft(0.0)((a, x) => a + x._2)
      id -> (terms.length.toLong, terms.count(_._1 == 3).toLong,
        terms.count(_._1 == 2).toLong, terms.count(_._1 == 1).toLong, score)
    }.toMap
    val got = SparkEntry.queries("text_trigram_backoff")(spark, d).collect()
    assert(got.length == model.size && got.nonEmpty)
    got.foreach { r =>
      val (n, h3, h2, h1, s) = model(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == h3 &&
        r.getLong(3) == h2 && r.getLong(4) == h1, s"counts of ${r.getLong(0)}")
      assert(r.getDouble(5) == s, s"score of ${r.getLong(0)}")
    }
    // the held-out 1-in-5 docs genuinely exercise every backoff level —
    // otherwise the lvl-2/lvl-1 branches are dead code in this fixture
    assert(model.values.map(_._2).sum > 0, "no trigram hits")
    assert(model.values.map(_._3).sum > 0, "backoff-to-bigram never taken")
    assert(model.values.map(_._4).sum > 0, "unigram floor never taken")
    // and training docs score strictly through the trigram level somewhere
    val trainScored = docs.filter(t => t._1 % 5 != 0 && t._2.length >= 3)
    assert(trainScored.forall(t => model(t._1)._2 > 0),
      "a training doc has zero trigram hits against its own counts")
  }

  /** Independent serial normalizer (RFC 3986 §6 + utm strip) applied to
    * the messy URL the query emits alongside its own normalization. */
  private def serialNorm(url: String): (String, String) = {
    val scheme = "^([A-Za-z]+)://".r.findFirstMatchIn(url).get.group(1)
      .toLowerCase
    val hostport = "^[A-Za-z]+://([^/?#]+)".r.findFirstMatchIn(url).get
      .group(1).toLowerCase
    val dePorted =
      if ((scheme == "https" && hostport.endsWith(":443")) ||
        (scheme == "http" && hostport.endsWith(":80")))
        hostport.replaceAll(":[0-9]+$", "")
      else hostport
    val host = dePorted.replaceFirst("^www\\.", "")
    val rawPath = ("^[A-Za-z]+://[^/?#]+([^?#]*)").r
      .findFirstMatchIn(url).get.group(1)
    val collapsed = (if (rawPath.isEmpty) "/" else rawPath)
      .replaceAll("/{2,}", "/")
    val path = if (collapsed.endsWith("/") && collapsed.length > 1)
      collapsed.dropRight(1) else collapsed
    val q = "\\?([^#]*)".r.findFirstMatchIn(url).map(_.group(1)).getOrElse("")
    val q2 = q.split("&", -1).filter(x => x.nonEmpty && !x.startsWith("utm_"))
      .mkString("&")
    val labels = host.replaceAll(":[0-9]+$", "").split("\\.")
    val domain = labels.takeRight(2).mkString(".")
    (s"$scheme://$host$path" + (if (q2.isEmpty) "" else s"?$q2"), domain)
  }

  test("url_normalize matches a serial RFC-3986 normalizer on every row") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("url_normalize")(spark, d).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (id, url, norm, dom) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
      val (wantNorm, wantDom) = serialNorm(url)
      assert(norm == wantNorm, s"doc $id: $url -> $norm != $wantNorm")
      assert(dom == wantDom, s"doc $id domain")
      // normalized invariants
      assert(!norm.contains(":443") && !norm.contains("#") &&
        !norm.contains("utm_") && !norm.contains("://www."))
      assert(norm.replaceFirst("://", "").contains("//") == false)
      assert(norm.takeWhile(_ != ':') == norm.takeWhile(_ != ':').toLowerCase)
    }
    // the fixture really covers the mess: raw URLs exhibit each defect
    val raws = got.map(_.getString(1))
    assert(raws.exists(_.startsWith("HTTPS://")))
    assert(raws.exists(_.contains("://WWW.")))
    assert(raws.exists(_.contains(":443/")))
    assert(raws.exists(_.contains("docs//")))
    assert(raws.exists(_.contains("utm_source=")))
    assert(raws.exists(_.endsWith("#sec2")) || raws.exists(_.contains("#sec2")))
  }

  test("url_domain_manifest matches a serial budget-fill model") {
    val d = sf("sf0.001")
    val doms = SparkEntry.queries("url_normalize")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val pool = Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"), col("text")).collect()
      .map { r =>
        val id = r.getLong(0)
        val nTok = r.getString(2).split(" ", -1).length.toLong
        val pr = (rh(id.toString) % 2000L * 2000L) /
          math.min(r.getLong(1), 2000L)
        (id, doms(id), nTok, pr)
      }
    val byDom = pool.groupBy(_._2).map { case (k, xs) => k -> xs.map(_._3).sum }
    val mx = byDom.values.max
    val budget = byDom.map { case (k, tok) =>
      k -> math.floor(0.6 * Math.sqrt(tok.toDouble) *
        Math.sqrt(mx.toDouble)).toLong
    }
    val model = pool.groupBy(_._2).toSeq.flatMap { case (dom, xs) =>
      var cum = 0L
      xs.sortBy(x => (x._4, x._1)).flatMap { x =>
        cum += x._3
        if (cum <= budget(dom)) Some((dom, x._1, x._3, cum, budget(dom)))
        else None
      }
    }.sortBy(t => (t._1, t._4))
    val got = SparkEntry.queries("url_domain_manifest")(spark, d).collect()
    assert(got.length == model.length && got.nonEmpty)
    got.zip(model).foreach { case (g, (dom, id, nt, cum, b)) =>
      assert(g.getString(0) == dom && g.getLong(1) == id &&
        g.getLong(2) == nt && g.getLong(3) == cum && g.getLong(4) == b,
        s"row for doc $id")
    }
    // budgets genuinely bite: at least one domain is capped below its
    // supply, and at least one keeps everything (the α=0.5 shape)
    val keptTok = model.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._3).sum }
    assert(byDom.exists { case (k, tok) => keptTok.getOrElse(k, 0L) < tok })
    assert(byDom.exists { case (k, tok) => keptTok.getOrElse(k, 0L) == tok })
  }

  test("url_domain_stats agrees with url_normalize's domains and mix algebra") {
    val d = sf("sf0.001")
    val byDom = SparkEntry.queries("url_normalize")(spark, d).collect()
      .groupBy(_.getString(3)).map { case (k, xs) => k -> xs.length.toLong }
    val got = SparkEntry.queries("url_domain_stats")(spark, d).collect()
    assert(got.map(_.getString(0)).toSet == byDom.keySet && got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == byDom(r.getString(0)),
      s"n_docs of ${r.getString(0)}"))
    val pSum = got.map(_.getDouble(3)).sum
    assert(Math.abs(pSum - 1.0) < 1e-9, s"p_uniform sums to $pSum")
    assert(Math.abs(got.map(_.getDouble(4)).max - 1.0) < 1e-12,
      "largest domain's temperature weight is 1")
    assert(got.forall(r => r.getDouble(4) > 0 && r.getDouble(4) <= 1.0))
  }
}
