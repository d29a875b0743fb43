package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.tools.ContainmentZipfSweep

/** Machine-checks `dedup_containment`'s PPJoin cost-model claim on a
  * power-law vocabulary — the property the catalog's uniform 31-token
  * corpus cannot exercise (there the prefix filter has zero selectivity
  * by corpus construction, measured head-on in BASELINE.md): on Zipfian
  * text the rarest-⌊(1−τ)·|A|⌋+1-token prefix filter admits candidate
  * pairs ORDERS OF MAGNITUDE below the all-pairs bound, while the
  * operator still finds every planted containment (the filter is a
  * pigeonhole-exact superset — selectivity never costs recall). The
  * large-tier numbers live in BASELINE.md (ContainmentZipfSweep); this
  * spec pins the property at CI scale. */
class ContainmentSelectivitySpec extends SparkSpec {

  test("Zipfian vocabulary: prefix-filter candidates << all pairs, recall intact") {
    val n = 4000L
    val tau = 0.8
    val docs = ContainmentZipfSweep.corpus(spark, n).localCheckpoint()
    val nDocs = docs.count()
    assert(nDocs == n + n / 4) // containers + every-4th contained twin
    val classes = docs
      .select(col("doc_id"),
        array_sort(array_distinct(split(col("text"), " "))).as("ts"))
      .groupBy(col("ts")).agg(min(col("doc_id")).as("rep"))
    val nClasses = classes.count()
    val allPairs = nClasses * (nClasses - 1)
    val nCand = Dedup.containmentCandidates(classes, tau).count()
    // the candidate join is the cheap stage: < 1% of the directed
    // all-pairs bound (measured ~0.06% at the 75k tier; CI corpus is
    // smaller so the bound is looser but still decisive)
    assert(nCand.toDouble / allPairs.toDouble < 0.01,
      s"prefix filter admitted $nCand of $allPairs pairs")
    assert(nCand > 0, "sweep found no candidates — filter walk is broken")
    // recall: every planted contained doc (ids >= n) is flagged
    val flagged = Dedup.containmentOf(docs, tau)
      .where(col("doc_id") >= n).count()
    assert(flagged == n / 4, s"flagged $flagged of ${n / 4} planted docs")
  }
}
