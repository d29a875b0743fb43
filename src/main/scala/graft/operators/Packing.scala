package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Sequence packing: concatenate the corpus in doc_id order and cut it
  * into fixed-token-budget training sequences (GPT-style packing — a doc
  * may straddle a sequence boundary; every sequence except the last holds
  * exactly `Budget` tokens).
  *
  * The core primitive is a GLOBAL prefix sum over token counts, which a
  * naive window (`ORDER BY doc_id` with no partition) computes on a
  * single task — the classic scale cliff. This implementation uses the
  * two-level decomposition a 1000-executor cluster needs:
  *
  *   1. docs are grouped into coarse buckets (`doc_id DIV 100`; at real
  *      scale the bucket is the input split id),
  *   2. per-bucket token subtotals — a relation with ~N/100 rows — get
  *      their running totals via one tiny unpartitioned window (the only
  *      serial step, over thousands of rows, not billions),
  *   3. the bucket offsets broadcast-join back and a window PARTITIONED
  *      by bucket supplies the intra-bucket running sum in parallel.
  *
  * PlanShapeSpec asserts exactly that shape: the doc-level window is
  * partitioned, and the bucket-offset join is a broadcast.
  */
object Packing {

  /** Tokens per packed training sequence. */
  val Budget = 128L

  /** Docs per prefix-sum bucket (stand-in for the input-split id). */
  val BucketDocs = 100L

  def all: Seq[QueryDef] = Seq(packSequences)

  val packSequences = QueryDef("pack_sequences",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n"),
          expr(s"doc_id DIV $BucketDocs").as("bucket"))
      // level 1+2: per-bucket subtotals, then running offsets over the
      // tiny bucket relation (~N/100 rows) — the only serial window, by
      // construction (declared in CatalogPlanSweepSpec's allowlist)
      val bucketOffsets = docs.groupBy(col("bucket"))
        .agg(sum(col("n")).as("bt"))
        .withColumn("bp", coalesce(sum(col("bt")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("bucket"), col("bp"))
      // level 3: intra-bucket running sum, parallel across buckets
      val wIntra = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = docs
        .join(broadcast(bucketOffsets), "bucket")
        .withColumn("o", col("bp") + coalesce(sum(col("n")).over(wIntra),
          lit(0L)))
      // each doc spans sequences floor(o/B) .. floor((o+n-1)/B)
      offsets
        .select(col("doc_id"), col("n"), col("o"),
          explode(expr(s"sequence(o DIV $Budget, (o + n - 1) DIV $Budget)"))
            .as("seq_id"))
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least((col("seq_id") + 1) * Budget, col("o") + col("n")) -
            greatest(col("seq_id") * Budget, col("o"))).as("n_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("seq_id"))
    },
    Some(s"""WITH docs AS (SELECT doc_id,
        CAST(len(string_split(text,' ')) AS BIGINT) AS n FROM documents),
      off AS (SELECT doc_id, n, CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS o
        FROM docs),
      spans AS (SELECT doc_id, n, o,
          unnest(range(o // $Budget, (o + n - 1) // $Budget + 1)) AS seq_id
        FROM off)
      SELECT seq_id, COUNT(*) AS n_docs,
        CAST(SUM(LEAST((seq_id + 1) * $Budget, o + n) -
          GREATEST(seq_id * $Budget, o)) AS BIGINT) AS n_tokens,
        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM spans GROUP BY seq_id ORDER BY seq_id"""))
}
