package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Mixture, Triangles}

/** Invariant tests for the round-4 additions: triangle counting, mixture
  * sampling, and the chunk round-trip (the oracle rows prove value
  * parity; these pin the algorithmic properties the oracle can't see). */
class MixtureGraphSpec extends SparkSpec {

  test("triangle top-20 matches a brute-force enumeration of the same graph") {
    // brute-force ground truth by id-ordering (a < b < c) on the small graph
    val e = Triangles.simpleEdges(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val perNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var triTotal = 0L
    for ((a, bs) <- adj; b <- bs; c <- adj.getOrElse(b, Set.empty))
      if (e.contains((a, c))) {
        triTotal += 1
        Seq(a, b, c).foreach(n => perNode(n) += 1)
      }
    assert(triTotal >= Triangles.N, "ring+skip2 closes every consecutive triple")

    val expectedTop = perNode.toSeq.map { case (n, t) => (t, n) }
      .sortBy(p => (-p._1, p._2)).take(20)
    val top = Triangles.triangles.fn(spark, "").collect()
      .map(r => (r.getLong(1), r.getLong(0))).toSeq
    assert(top == expectedTop,
      "degree-ordered distributed enumeration must agree with brute force")
  }

  test("weighted sample is deterministic and respects the cap semantics") {
    val d = sf("sf0.001")
    val a = Mixture.weightedSample.fn(spark, d).collect()
    val b = Mixture.weightedSample.fn(spark, d).collect()
    assert(a.sameElements(b), "hash-driven sampling must be run-stable")
    a.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept >= 0 && kept <= n)
    }
    assert(a.map(_.getLong(2)).sum > 0, "a length-weighted sample keeps something")
  }

  test("temperature mixture: weights in (0,1], max source at 1, oversampling favors small sources") {
    val rows = Mixture.temperatureMix.fn(spark, sf("sf0.001")).collect()
    val w = rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(w.forall { case (_, _, wt, _) => wt > 0.0 && wt <= 1.0 })
    assert(w.count { case (_, _, wt, _) => wt == 1.0 } >= 1, "largest source has weight 1")
    val largest = w.maxBy(_._2)
    val smallest = w.minBy(_._2)
    assert(smallest._4 >= largest._4,
      "alpha=0.5 must oversample the smallest source at least as much as the largest")
  }

  test("Misra-Gries candidates are a superset of all true heavy hitters") {
    import graft.operators.HeavyHitters
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val cand = HeavyHitters.candidateFrame(spark, docs)
      .collect().map(_.getString(0)).toSet
    assert(cand.size <= spark.sparkContext.defaultParallelism * HeavyHitters.K * 4,
      "candidate set must stay sketch-sized, not vocabulary-sized")
    // exact frequencies (small corpus): every token above n/(K+1) must be
    // in the candidate set — the guarantee the exactness proof rests on
    val exact = docs.select(explode(org.apache.spark.sql.functions.split(
        col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = exact.map(_._2).sum
    val mustCatch = exact.filter(_._2 * (HeavyHitters.K + 1) > n).map(_._1)
    val missed = mustCatch.filterNot(cand)
    assert(missed.isEmpty, s"MG guarantee violated for: ${missed.mkString(", ")}")
  }

  test("weighted Misra-Gries over pre-aggregated counts keeps the superset guarantee") {
    import graft.operators.HeavyHitters
    // same logical stream three ways: raw occurrences, fully
    // pre-aggregated, and chunked partial counts (the streaming shard
    // path) — every fold must keep each token above n/(k+1)
    val k = 8
    val raw = Seq.fill(500)("hot") ++ (1 to 400).map(i => s"t$i") ++
      Seq.fill(120)("warm")
    val n = raw.length
    val must = raw.groupBy(identity).collect {
      case (t, os) if os.length * (k + 1) > n => t
    }.toSet
    assert(must == Set("hot", "warm")) // the fixture plants exactly these
    def surviving(entries: Iterator[(String, Long)]): Set[String] = {
      val c = scala.collection.mutable.HashMap.empty[String, Long]
      HeavyHitters.mgFoldWeighted(c, entries, k)
      assert(c.size <= k, s"over capacity: ${c.size}")
      c.keySet.toSet
    }
    val viaRaw = surviving(raw.iterator.map(_ -> 1L))
    val viaAgg = surviving(
      raw.groupBy(identity).map { case (t, os) => t -> os.length.toLong }
        .iterator)
    val viaChunks = surviving(
      HeavyHitters.chunkedCounts(raw.iterator, chunkTokens = 64))
    Seq(viaRaw, viaAgg, viaChunks).foreach { got =>
      assert(must.subsetOf(got), s"lost a guaranteed heavy hitter: $got")
    }
    // chunkedCounts itself is lossless partial aggregation
    val rebuilt = HeavyHitters.chunkedCounts(raw.iterator, chunkTokens = 64)
      .toSeq.groupBy(_._1).map { case (t, es) => t -> es.map(_._2).sum }
    assert(rebuilt == raw.groupBy(identity)
      .map { case (t, os) => t -> os.length.toLong })
  }

  test("Misra-Gries summary on a known stream keeps the majority element") {
    import graft.operators.HeavyHitters
    val stream = Iterator.fill(500)("hot") ++ (1 to 400).iterator.map(i => s"t$i")
    val sum = HeavyHitters.mgSummary(stream)
    assert(sum.size <= HeavyHitters.K)
    assert(sum.contains("hot"), "majority element must survive any MG run")
    assert(sum("hot") >= 500 - (900 / (HeavyHitters.K + 1)) - 1,
      "counter deficit must respect the n/(K+1) bound")
  }

  test("power iteration: engine output is bit-exact vs a local replay; Rayleigh quotient non-decreasing") {
    import graft.operators.Spectral
    // local ground-truth replay in plain loops over the same quantization
    val X: Array[Array[Long]] = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(x =>
        math.floor(x.toDouble * Spectral.QScale + 0.5).toLong))
    def step(v: Array[Long]): Array[Long] = {
      val y = Array.fill(Spectral.Dim)(0L)
      X.foreach { row =>
        var sv = 0L
        var j = 0
        while (j < Spectral.Dim) { sv += row(j) * v(j); j += 1 }
        j = 0
        while (j < Spectral.Dim) { y(j) += row(j) * sv; j += 1 }
      }
      val sc = math.max(y.map(math.abs).max / Spectral.VScale, 1L)
      y.map(yj => (if (yj < 0) -1L else 1L) * (math.abs(yj) / sc))
    }
    def rayleigh(v: Array[Long]): Double = {
      val num = X.map { row =>
        val s = row.indices.map(j => row(j).toDouble * v(j)).sum
        s * s
      }.sum
      num / v.map(x => x.toDouble * x).sum
    }
    var v = Array.fill(Spectral.Dim)(Spectral.VScale)
    var rPrev = rayleigh(v)
    for (k <- 1 to Spectral.Rounds) {
      v = step(v)
      val r = rayleigh(v)
      assert(r >= rPrev * (1 - 1e-9),
        s"Rayleigh quotient decreased at round $k: $rPrev -> $r")
      rPrev = r
    }
    val engine = Spectral.powerIteration.fn(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(engine.map(_._1).sameElements(1L to Spectral.Dim.toLong))
    assert(engine.map(_._2).sameElements(v),
      "distributed integer power iteration must replay bit-exactly")
  }

  test("deflated power iteration: bit-exact replay, near-orthogonal to v1, Rayleigh ordered") {
    import graft.operators.Spectral
    val X: Array[Array[Long]] = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(x =>
        math.floor(x.toDouble * Spectral.QScale + 0.5).toLong))
    def step(v: Array[Long]): Array[Long] = {
      val y = Array.fill(Spectral.Dim)(0L)
      X.foreach { row =>
        var sv = 0L
        var j = 0
        while (j < Spectral.Dim) { sv += row(j) * v(j); j += 1 }
        j = 0
        while (j < Spectral.Dim) { y(j) += row(j) * sv; j += 1 }
      }
      val sc = math.max(y.map(math.abs).max / Spectral.VScale, 1L)
      y.map(yj => (if (yj < 0) -1L else 1L) * (math.abs(yj) / sc))
    }
    def rayleigh(v: Array[Long]): Double = {
      val num = X.map { row =>
        val s = row.indices.map(j => row(j).toDouble * v(j)).sum
        s * s
      }.sum
      num / v.map(x => x.toDouble * x).sum
    }
    var v1 = Array.fill(Spectral.Dim)(Spectral.VScale)
    for (_ <- 1 to Spectral.Rounds) v1 = step(v1)
    var w = Array.tabulate(Spectral.Dim)(i =>
      if ((i + 1) % 2 == 1) Spectral.VScale else -Spectral.VScale)
    for (_ <- 1 to Spectral.Rounds) {
      val u = step(w)
      val o = u.zip(v1).map { case (a, b) => a * b }.sum
      val n1 = math.max(v1.map(x => x * x).sum, 1L)
      // truncating division — the engine/oracle-shared rounding
      w = u.zip(v1).map { case (a, b) => a - (o * b) / n1 }
    }
    val engine = Spectral.powerDeflate.fn(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(engine.map(_._1).sameElements(1L to Spectral.Dim.toLong))
    assert(engine.map(_._2).sameElements(w),
      "deflated integer power iteration must replay bit-exactly")
    // near-orthogonality (quantization-limited, not exact)
    val dotD = w.zip(v1).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val cos = math.abs(dotD) /
      (math.sqrt(w.map(x => x.toDouble * x).sum) *
        math.sqrt(v1.map(x => x.toDouble * x).sum))
    assert(cos < 0.05, s"v2 not orthogonal to v1: |cos| = $cos")
    // the synthetic embeddings' covariance spectrum is near-flat
    // (Marchenko–Pastur: λ1 ≈ λ2), so after 3 rounds the two Rayleigh
    // quotients are only guaranteed to be COMPARABLE, not ordered —
    // assert the deflated direction lands in the same top-of-spectrum
    // band rather than a strict ordering the spectrum cannot support
    assert(rayleigh(w) <= rayleigh(v1) * 1.05,
      "Rayleigh of the deflated direction left the top-spectrum band")
    assert(rayleigh(w) > 0.0)
    // the outlier report is the serial top-10 |projection| onto v1
    // (fresh id-paired collect — X above is unordered, fine for sums)
    val projs = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val q = r.getSeq[Float](1).toArray.map(x =>
          math.floor(x.toDouble * Spectral.QScale + 0.5).toLong)
        r.getLong(0) -> q.indices.map(j => q(j) * v1(j)).sum
      }
    val want = projs.sortBy { case (id, p) => (-math.abs(p), id) }.take(10)
      .toSeq
    val gotOut = Spectral.spectralOutliers.fn(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotOut == want, "spectral outliers must replay serially")
    // and the 2-D map is the exact per-vector (v1, v2) projection pair
    val gotMap = Spectral.spectralMap.fn(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val c1ById = projs.toMap
    assert(gotMap.length == projs.length)
    gotMap.foreach { case (id, c1, _) =>
      assert(c1 == c1ById(id), s"vec $id c1 projection mismatch")
    }
    // c2 column checked against a fresh serial projection onto w
    val c2Serial = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val q = r.getSeq[Float](1).toArray.map(x =>
          math.floor(x.toDouble * Spectral.QScale + 0.5).toLong)
        r.getLong(0) -> q.indices.map(j => q(j) * w(j)).sum
      }.toMap
    gotMap.foreach { case (id, _, c2) =>
      assert(c2 == c2Serial(id), s"vec $id c2 projection mismatch")
    }
  }

  test("edit_dist: textbook values, edge cases, and parity with builtin levenshtein on corpus prefixes") {
    import graft.functions.EditDistanceAscii.distance
    def d(a: String, b: String) = distance(a.getBytes, b.getBytes)
    assert(d("kitten", "sitting") == 3)
    assert(d("", "abc") == 3 && d("abc", "") == 3 && d("", "") == 0)
    assert(d("same", "same") == 0)
    assert(d("flaw", "lawn") == 2)
    // cross-check the codegen path against Spark's builtin on real
    // (ASCII) corpus prefixes — 120-char texts, 200 adjacent pairs
    graft.functions.HashExpressions.register(spark)
    val diff = graft.Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") < 201)
      .select(col("doc_id"), substring(col("text"), 1, 120).as("p"))
      .withColumn("q", expr("lead(p, 1) over (order by doc_id)"))
      .filter(col("q").isNotNull)
      .withColumn("native", expr("edit_dist(p, q)"))
      .withColumn("builtin", levenshtein(col("p"), col("q")))
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(diff == 0, s"$diff prefix pairs disagree with builtin levenshtein")
  }

  test("chunk round-trip is lossless for every document") {
    val r = Chunking.reassemble.fn(spark, sf("sf0.001")).collect().head
    assert(r.getLong(0) == r.getLong(1),
      s"${r.getLong(0) - r.getLong(1)} documents corrupted by chunk/reassemble")
  }
}
