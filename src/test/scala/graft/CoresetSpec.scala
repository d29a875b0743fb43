package graft

import org.apache.spark.sql.functions._

/** Serial-model spec for the Gonzalez k-center coreset: the greedy
  * selection re-derived in plain Scala with the query's exact float
  * tree (in-order dot fold, n2x + n2c − 2·dot, order-free min,
  * integer-tie-broken argmax). */
class CoresetSpec extends SparkSpec {

  test("curate_coreset_kcenter matches a serial greedy model bit-exactly") {
    val d = sf("sf0.001")
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    assert(vecs.nonEmpty)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val n2 = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    val emb = vecs.toMap
    var centers = Seq(vecs.head._1)
    var picks = Seq((1, vecs.head._1, 0.0))
    for (r <- 2 to graft.operators.Coreset.K) {
      val cands = vecs.map { case (id, v) =>
        val md = centers.map(c =>
          n2(id) + n2(c) - 2.0 * dot(v, emb(c))).min
        (id, md)
      }
      val best = cands.minBy { case (id, md) => (-md, id) }
      centers :+= best._1
      picks :+= ((r, best._1, best._2))
    }
    val got = graft.operators.Coreset.kCenter.fn(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == picks)
    // covering-radius curve: monotone non-increasing after round 1,
    // centers distinct, and the selection genuinely spreads (last pick
    // still strictly positive on this corpus)
    val ds = got.drop(1).map(_._3)
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => b <= a })
    assert(got.map(_._2).distinct.length == got.length)
    assert(ds.last > 0.0)
  }
}
