package graft

import org.apache.spark.sql.functions._
import graft.operators.TextScoring

/** `text_quality_train` — the trained hashed-linear quality classifier
  * (round-11 verdict item 3). Three properties the DuckDB hash check
  * cannot express:
  *
  *  1. SERIAL PARITY: the distributed fixed-point GD (broadcast-join
  *     supersteps + driver weight state) computes EXACTLY the model a
  *     straight-line serial implementation computes — scores, optimal
  *     cut, and keep decisions all integer-equal;
  *  2. the trained model SEPARATES: AUC well above the scrambled
  *     fixed-weight baseline ([[TextScoring.qualityModel]]'s kernel) on
  *     the same labels — the "training beats faking it" claim;
  *  3. the fitted intercept is USEFUL: accuracy at the cut beats the
  *     keep-everything baseline by a wide margin.
  */
class QualityTrainSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def entryRows() =
    TextScoring.qualityTrain.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))

  test("distributed fixed-point GD == serial reimplementation (scores, cut, keeps)") {
    graft.functions.HashExpressions.register(spark)
    // features and labels collected via the SAME Spark expressions the
    // entry uses (labels are oracle-proven through text_quality); only
    // the TRAINING is reimplemented serially
    val bx = Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        expr(s"roll_hash(w) % ${TextScoring.QtBuckets}").as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lab = graft.operators.TextAnalysis.quality.fn(spark, d)
      .select(col("doc_id"),
        when(col("quality") >= 0.68, 1L).otherwise(-1L).as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = bx.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap

    // N = label-relation count (one row per document), the entry's rule
    val etaDen = BigInt(
      math.max(1L, lab.size.toLong * TextScoring.QtEtaPerDoc))
    var w = Map.empty[Long, Long]
    for (_ <- 0 until TextScoring.QtRounds) {
      val g = scala.collection.mutable.Map.empty[Long, BigInt]
      byDoc.foreach { case (doc, feats) =>
        val s = feats.map { case (b, c) => c * w.getOrElse(b, 0L) }.sum
        val r = s - lab(doc) * TextScoring.QtScale
        feats.foreach { case (b, c) =>
          g(b) = g.getOrElse(b, BigInt(0)) + BigInt(c * r)
        }
      }
      w = g.foldLeft(w) { case (acc, (b, gg)) =>
        acc.updated(b, acc.getOrElse(b, 0L) - (gg / etaDen).toLong)
      }
    }
    val scores = byDoc.map { case (doc, feats) =>
      doc -> feats.map { case (b, c) => c * w.getOrElse(b, 0L) }.sum
    }
    // accuracy-optimal cut: candidates = distinct scores + keep-all
    // sentinel, predict + when score > t, ties to the smaller t
    val ys = scores.keys.toSeq.sorted.map(dId => (scores(dId), lab(dId)))
    val tp = ys.count(_._2 == 1L).toLong
    val cands = (ys.map(_._1).min - 1) +: ys.map(_._1).distinct
    val cut = cands.map { t =>
      val acc = ys.count { case (s, y) =>
        (s > t && y == 1L) || (s <= t && y == -1L) }.toLong
      (t, acc)
    }.sortBy { case (t, acc) => (-acc, t) }.head._1
    assert(tp > 0 && tp < ys.size) // both classes present

    val rows = entryRows()
    assert(rows.length == scores.size)
    rows.foreach { case (doc, score, keep, label) =>
      assert(score == scores(doc), s"doc $doc score $score vs ${scores(doc)}")
      assert(label == lab(doc))
      assert(keep == (if (score > cut) 1 else 0),
        s"doc $doc keep $keep vs cut $cut")
    }
  }

  test("trained AUC beats the scrambled-weight baseline; cut beats keep-all") {
    val rows = entryRows()
    def auc(scored: Seq[(Double, Boolean)]): Double = {
      val sorted = scored.sortBy(_._1)
      // midrank over ties
      val ranks = scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean)]
      var i = 0
      var r1 = 0.0
      val arr = sorted.toArray
      while (i < arr.length) {
        var j = i
        while (j + 1 < arr.length && arr(j + 1)._1 == arr(i)._1) j += 1
        val mid = (i + j) / 2.0 + 1
        (i to j).foreach(k => if (arr(k)._2) r1 += mid)
        i = j + 1
      }
      val np = arr.count(_._2).toDouble
      val nn = arr.length - np
      (r1 - np * (np + 1) / 2) / (np * nn)
    }
    val trained = auc(rows.toSeq.map(r => (r._2.toDouble, r._4 == 1L)))
    val lab = rows.map(r => r._1 -> (r._4 == 1L)).toMap
    val base = TextScoring.scoreQuality(Tables.documents(spark, d))
      .select(col("doc_id"), col("logit")).collect()
      .map(r => (r.getDouble(1), lab(r.getLong(0)))).toSeq
    val baseline = auc(base)
    info(f"trained AUC $trained%.3f vs scrambled baseline $baseline%.3f")
    assert(trained >= 0.85, f"trained AUC $trained%.3f below 0.85")
    assert(trained >= baseline + 0.2,
      f"trained $trained%.3f not clearly above baseline $baseline%.3f")
    val acc = rows.count(r => (r._3 == 1) == (r._4 == 1L)).toDouble / rows.length
    val allKeep = rows.count(_._4 == 1L).toDouble / rows.length
    info(f"accuracy at cut $acc%.3f vs keep-everything $allKeep%.3f")
    assert(acc >= 0.8, f"accuracy $acc%.3f below 0.8")
    assert(acc > allKeep + 0.1, "cut no better than keeping everything")
  }
}
