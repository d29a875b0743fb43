package graft

import org.apache.spark.sql.functions._
import graft.operators.{Semantic, Similarity}

/** Guards the round-11 verdict's one scale finding: the trained-ANN
  * training stages (`sim_ann_ivf_trained`, `emb_pq_topk_trained`) fold
  * each cluster's members inside ONE aggregation buffer (the ordered
  * mean that buys bit-exact cross-engine parity), so their INPUT must be
  * bounded. This spec pins the bound mechanically:
  *
  *  1. the training sample is a top-n (`TakeOrderedAndProject` — per-task
  *     n-row heap, no full sort, no data-scaled state);
  *  2. the sample size stays EXACTLY `TrainSampleN` when the corpus grows
  *     8× (keys-offset replicas, the ScaleSmoke construction) — the cap
  *     is independent of corpus scale, so the fold buffers are too;
  *  3. the sample is deterministic (same ids on re-evaluation — the
  *     property the DuckDB oracle mirror depends on);
  *  4. both trainers still return full-size, well-formed models when fed
  *     the grown corpus (nothing in the loop re-introduces a corpus-
  *     scaled stage).
  */
class TrainingBoundSpec extends SparkSpec {

  private val d = sf("sf0.001")

  test("training sample is a top-n: TakeOrderedAndProject, exact cap, deterministic") {
    val e = Tables.embeddings(spark, d)
    val samp = Similarity.trainingSample(e, Similarity.TrainSampleN)
    val plan = samp.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"training sample must be a top-n, not a global sort:\n$plan")
    assert(samp.count() == Similarity.TrainSampleN)
    val ids1 = samp.select("vec_id").collect().map(_.getLong(0)).sorted
    val ids2 = Similarity.trainingSample(e, Similarity.TrainSampleN)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2), "sample must be deterministic")
    // the hash order is not the id order — the sample is corpus-
    // representative, not a prefix
    val prefix = e.orderBy(col("vec_id")).limit(Similarity.TrainSampleN)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(!ids1.sameElements(prefix),
      "hash-ordered sample degenerated to the vec_id prefix")
  }

  test("sample cap holds under 8x corpus growth; trainers stay well-formed") {
    // keys-offset replicas — the ScaleSmoke scale-tier construction
    val e = Tables.embeddings(spark, d)
    val n = e.count()
    val grown = (0 until 8).map(i =>
        e.select((col("vec_id") + lit(i.toLong * n)).as("vec_id"),
          col("embedding")))
      .reduce(_ unionAll _)
    assert(grown.count() == 8 * n)
    val samp = Similarity.trainingSample(grown, Similarity.TrainSampleN)
    assert(samp.count() == Similarity.TrainSampleN,
      "training-sample cap must be independent of corpus scale")

    val cents = Similarity.trainCentroids(
      grown, Similarity.IvfK, Similarity.IvfRounds)
    assert(cents.size == Similarity.IvfK)
    assert(cents.forall(_._2.length == 64))
    val book = Semantic.trainPqCodebooks(grown, Semantic.PqRounds)
    assert(book.size == Semantic.PqM * Semantic.PqK)
    assert(book.forall(_._3.length == Semantic.PqDim))
  }
}
