package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Guards the SimHash pigeonhole-banding rewrite: the banded pair
  * generation must produce exactly the pair set the quadratic all-pairs
  * join defines. */
class DedupSpec extends SparkSpec {

  test("incremental dedup == the cross-boundary subset of the full self-join") {
    // the batch-vs-index probe must reach exactly the same verified pairs
    // the bootstrap self-join finds across the batch boundary (same bands,
    // same verify): aggregate minhashPairs' cross-boundary pairs per batch
    // doc and compare decisions exactly
    val d = sf("sf0.001")
    def isBatch(id: Long) = id % 8 == 7
    val full = Dedup.minhashPairs(Tables.documents(spark, d))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = full
      .flatMap { case (a, b, j) =>
        if (isBatch(a) && !isBatch(b)) Some((a, b, j))       // batch, index
        else if (isBatch(b) && !isBatch(a)) Some((b, a, j))  // batch, index
        else None
      }
      .groupBy(_._1)
      .map { case (bdoc, ms) =>
        (bdoc, ms.map(_._2).min, ms.map(_._3).max) }
      .toSeq.sortBy(_._1)
    val got = Dedup.incremental.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected,
      s"incremental decisions diverge from the self-join's cross-boundary subset")
    assert(got.nonEmpty, "fixture should contain cross-boundary near-dups")
  }

  test("mutated-replica corpus plants exactly the twin pairs; pair output linear in mult") {
    // the generator behind the dedup family's honest high tiers (r12
    // verdict item 3): copies come in twin pairs — near-dup pairs grow
    // LINEARLY in the copy count, unlike the verbatim-replica corpus
    // whose pair output is quadratic by construction
    val OFF = 1000000000L
    def pairsAt(mult: Int): (Set[(Long, Long)], Set[(Long, Long)]) = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_mutated_x$mult").toString
      graft.tools.ScaleSmoke.buildMutatedDir(spark, sf("sf0.001"), dir, mult)
      val got = Dedup.minhashPairs(Tables.documents(spark, dir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val baseIds = Tables.documents(spark, sf("sf0.001"))
        .select(col("doc_id")).collect().map(_.getLong(0))
      val planted = (0 until mult / 2).flatMap { g =>
        baseIds.map(id => (id + 2L * g * OFF, id + (2L * g + 1) * OFF))
      }.toSet
      (got, planted)
    }
    val (got2, planted2) = pairsAt(2)
    // every planted twin that LSH catches is a (base, twin) pair; no
    // cross-group pair can exist (groups share zero shingles)
    val crossGroup2 = got2.filterNot { case (a, b) =>
      a / OFF / 2 == b / OFF / 2 // same twin-pair group
    }
    assert(crossGroup2.isEmpty, s"cross-group pairs: ${crossGroup2.take(5)}")
    // banding is probabilistic per pair, but at twin Jaccard ≈ 0.8 the
    // capture rate is high; require most planted pairs caught
    val caught2 = got2.intersect(planted2).size.toDouble / planted2.size
    assert(caught2 >= 0.5, s"planted-pair capture rate $caught2")
    // linearity: at 4× the copies, output is ~2× (same per-group sets),
    // never quadratic (which would be ~4× here)
    val (got4, planted4) = pairsAt(4)
    assert(got4.size <= got2.size * 5 / 2,
      s"pair output grew super-linearly: ${got2.size} -> ${got4.size}")
    assert(got4.intersect(planted4).size >= got2.intersect(planted2).size,
      "second group lost its planted twins")
  }

  test("leakage-safe split: no near-dup pair straddles train/test") {
    val d = sf("sf0.001")
    val split = graft.operators.Components.splitLeakageSafe.fn(spark, d)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = Dedup.minhashLsh.fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"near-dup pair ($a, $b) straddles the split: ${split(a)} vs ${split(b)}")
    }
    // and the split is a real split, not a constant
    val counts = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "test"), s"splits: $counts")
  }

  test("banded simhash pairs == quadratic all-pairs definition (sf0.001)") {
    val banded = SparkEntry.queries("dedup_simhash")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // reference definition: every pair, Hamming ≤ 1
    val sigs = Dedup.simhashSignatures(spark, sf("sf0.001"))
    val quadratic = sigs.alias("x")
      .join(sigs.alias("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming",
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("int"))
      .filter(col("hamming") <= 1)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(banded.toSet == quadratic.toSet)
    assert(banded.length == quadratic.length, "banding emitted duplicates")
    assert(banded.nonEmpty)
  }

  test("substring dedup catches boundary-straddling spans; merge math exact") {
    import spark.implicits._
    val W = 10
    // unique token vocabularies so only the authored spans collide:
    // doc 0 holds the original; doc 1 embeds 12 of doc 0's tokens (a
    // 12-token verbatim span = three overlapping 10-windows) at offset 5 —
    // deliberately NOT aligned to dedup_paragraph's disjoint 8-blocks;
    // doc 2 repeats its own 10-token span twice (within-doc dup);
    // doc 3 is shorter than W and must report zeros.
    val a = (0 until 30).map(i => s"a$i")
    val span = a.slice(4, 16) // 12 tokens of doc 0
    val b = (0 until 5).map(i => s"b$i") ++ span ++ (5 until 12).map(i => s"b$i")
    val c0 = (0 until 10).map(i => s"c$i")
    val c = c0 ++ Seq("cx", "cy") ++ c0
    val docs = Seq(
      (0L, a.mkString(" ")), (1L, b.mkString(" ")),
      (2L, c.mkString(" ")), (3L, "tiny doc under width"))
      .toDF("doc_id", "text")
    val got = Dedup.substringDedupOf(docs, W)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: every window is the global first occurrence → nothing removed
    assert(got(0) == ((0L, 30L, 0L, 0L)))
    // doc 1: exactly the three windows inside the copied 12-token span are
    // flagged (positions 5,6,7) and they merge to 12 removed tokens —
    // min(W, next-start gap) twice + W for the last = 1+1+10
    assert(got(1) == ((1L, 24L, 3L, 12L)))
    // doc 2: the second copy of the 10-token span is one flagged window
    // (its windows straddling cx/cy are unique) → 10 removed
    assert(got(2) == ((2L, 22L, 1L, 10L)))
    // doc 3: shorter than W — zero windows, zero removed, still reported
    // (doc 1's span is exactly the case dedup_paragraph's disjoint
    // 8-blocks cannot catch: the copy sits at a different offset, so no
    // block of doc 1 equals any block of doc 0)
    assert(got(3) == ((3L, 4L, 0L, 0L)))

    // the APPLY stage must agree with the report's closed-form merge:
    // tokens kept == n_tokens − n_removed, doc by doc (the token-level
    // running-max removal and the Σ min(W, gap) arithmetic are two
    // independent spellings of the same span algebra) — and the cleaned
    // text itself drops exactly the authored spans
    val applied = Dedup.substringApplyOf(docs, W).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    applied.zip(got).foreach { case ((id, nt, nk, _), (_, _, _, removed)) =>
      assert(nk == nt - removed,
        s"doc $id: apply kept $nk but report implies ${nt - removed}")
    }
    assert(applied(1)._4 ==
      ((0 until 5).map(i => s"b$i") ++ (5 until 12).map(i => s"b$i"))
        .mkString(" "),
      "doc 1's cleaned text must be exactly its own tokens, span stripped")
    assert(applied(0)._4 == a.mkString(" "),
      "the first occurrence keeps its text verbatim")

    // the batch-vs-index probe: doc 1 as the incoming batch against
    // doc 0 as the stored corpus must report exactly the copied span
    // (12 tokens via 3 flagged windows) — and unlike the global report,
    // the probe flags by PRESENCE in the index, not id order (an index
    // hit condemns the batch window even if the batch doc's id is lower)
    val probed = Dedup.substringProbe(
        docs.filter(col("doc_id") === 1), docs.filter(col("doc_id") === 0), W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(probed.toSeq == Seq((1L, 24L, 3L, 12L)))
  }

  test("incremental component labels == from-scratch star on the union") {
    import graft.operators.Components
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)
    val isBatch = col("doc_id") % 8 === 7
    // the incremental path: stored labels over the old corpus, then the
    // batch's new edges folded in with only touched components recomputed
    val stored = Components.connectedComponentsStar(
      Dedup.minhashClassEdges(docs.filter(!isBatch)))
    val newEdges = Dedup.minhashPairs(docs.filter(isBatch))
      .select(col("a"), col("b"))
      .unionAll(Dedup.crossPairs(docs.filter(isBatch), docs.filter(!isBatch))
        .select(col("a"), col("b")))
    val incr = Components.incrementalLabels(stored, newEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the from-scratch definition on the union graph
    val scratch = Components.connectedComponentsStar(
      Dedup.minhashClassEdges(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr == scratch,
      s"incremental labels diverge: only-incr=${(incr -- scratch).take(5)} " +
      s"only-scratch=${(scratch -- incr).take(5)}")
    assert(incr.nonEmpty, "fixture should contain near-dup components")
    // and the batch really changed something (otherwise the test is void)
    val storedSet = stored.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr != storedSet, "fixture batch should touch some component")
  }

  test("stored component maintenance == derived twin (store/reload round trip)") {
    import graft.operators.Components
    val d = sf("sf0.001")
    val derived = Components.componentsIncremental.fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val stored = Components.componentsIncrementalStored.fn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stored == derived)
    assert(stored.nonEmpty)
  }

  test("sorted_intersect_count kernel equals the set model and the builtin on arbitrary sorted arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_intersect, expr, size}
    graft.functions.HashExpressions.register(spark)
    val rnd = new scala.util.Random(7)
    def arr() =
      Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toString).distinct.sorted
    val rows = Seq.fill(300)((arr(), arr()))
    val got = rows.toDF("a", "b")
      .withColumn("kern", expr("sorted_intersect_count(a, b)"))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
      .collect()
    got.zip(rows).foreach { case (r, (a, b)) =>
      assert(r.getInt(2) == a.toSet.intersect(b.toSet).size)
      assert(r.getInt(2) == r.getInt(3))
    }
  }

  test("containment join: directional, catches the small-doc-in-big-page case, matches all-pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vocab = (0 until 400).map(i => s"w$i")
    val big = Seq.fill(300)(vocab(rnd.nextInt(vocab.size)))
    val quote = big.slice(40, 60).distinct          // fully inside doc 0
    val partial = (quote.take(17) ++ Seq("zzz", "yyy", "xxx")).distinct
    val docs = Seq(
      (0L, big.mkString(" ")),
      (1L, quote.mkString(" ")),                    // containment 1.0 in 0
      (2L, partial.mkString(" ")),                  // 17/20 = 0.85 ≥ τ
      (3L, Seq.fill(40)("qqq").mkString(" ")))      // disjoint
      .toDF("doc_id", "text")
    val got = Dedup.containmentOf(docs, 0.8).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // serial all-pairs oracle
    val sets = Seq(0L -> big, 1L -> quote, 2L -> partial,
      3L -> Seq.fill(40)("qqq")).map { case (id, t) => id -> t.toSet }
    val want = sets.flatMap { case (a, ta) =>
      val qs = sets.filter { case (b, tb) =>
        b != a && (ta & tb).size.toDouble / ta.size >= 0.8 }
      if (qs.isEmpty) None
      else Some(a -> ((qs.size.toLong, qs.map(_._1).min,
        qs.map { case (_, tb) => (ta & tb).size.toDouble / ta.size }.max)))
    }.toMap
    assert(got == want, s"got $got\nwant $want")
    // the headline case really is asymmetric: doc 1 flagged, doc 0 not
    assert(got.contains(1L) && got(1L)._3 == 1.0 && !got.contains(0L))
    assert(got.contains(2L) && got(2L)._2 == 0L)
    assert(!got.contains(3L))
    // and Jaccard would have missed it (the structural claim)
    val j = (sets(0)._2 & sets(1)._2).size.toDouble /
      (sets(0)._2 | sets(1)._2).size
    assert(j < 0.2, s"fixture jaccard $j should be tiny")
  }

  /** Serial model of text_cdc_chunk: same rolling hashes, cut rule,
    * chunk content hash, and first-occurrence keeper. */
  private def serialCdc(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long)] = {
    val M = 1000000007L
    def rh(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c) % M)
    // (doc, chunkStart, chunkTokenCount, chunkHash) for every chunk
    val chunks = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      val cutAfter = (0 to t.length - 4).filter { p =>
        rh(t.slice(p, p + 4).mkString(" ")) % 16 == 0
      }.map(_ + 3).toSet
      val bounds = t.indices.foldLeft(Vector(Vector.empty[Int])) { (acc, p) =>
        val acc2 = acc.init :+ (acc.last :+ p)
        if (cutAfter(p)) acc2 :+ Vector.empty[Int] else acc2
      }.filter(_.nonEmpty)
      bounds.map { ps =>
        val ch = ps.foldLeft(0L)((h, p) => (h * 1000003L + rh(t(p))) % M)
        (id, ps.head.toLong, ps.length.toLong, ch)
      }
    }
    val first = chunks.groupBy(_._4).map { case (ch, cs) =>
      ch -> cs.minBy(c => (c._1, c._2))
    }
    docs.map { case (id, text) =>
      val mine = chunks.filter(_._1 == id)
      val dups = mine.filter(c => first(c._4) != c)
      id -> (text.split(" ", -1).length.toLong, mine.size.toLong,
        dups.size.toLong, dups.map(_._3).sum)
    }.toMap
  }

  test("text_cdc_chunk matches the serial CDC model; boundaries survive a prefix edit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
    val base = Seq.fill(120)(words(rnd.nextInt(words.size)))
    val shifted = Seq("inserted", "tokens") ++ base   // prefix edit
    val docs = Seq(
      (0L, base.mkString(" ")),
      (1L, shifted.mkString(" ")),
      (2L, "tiny doc"))
    val got = graft.operators.Chunking.cdcChunkOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val want = serialCdc(docs)
    assert(got == want, s"got $got\nwant $want")
    // the CDC property: after the 2-token prefix insertion, every chunk
    // of doc 1 past the first re-synchronized boundary is content-equal
    // to a doc-0 chunk → most of doc 1's tokens sit in duplicate chunks.
    // A fixed-size chunker re-aligns nothing (every window shifts by 2).
    val (n1, _, dupChunks1, dupTok1) = got(1L)
    assert(dupChunks1 > 0, "prefix-shifted doc must re-sync to dup chunks")
    assert(dupTok1.toDouble / n1 > 0.5,
      s"expected majority of shifted doc in dup chunks, got $dupTok1/$n1")
    // sanity: doc 0 is all first occurrences, tiny doc is one clean chunk
    assert(got(0L)._3 == 0 && got(2L) == ((2L, 1L, 0L, 0L)))
  }
}
