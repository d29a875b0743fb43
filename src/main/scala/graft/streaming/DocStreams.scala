package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming surface of the corpus-curation operators: documents arrive as
  * an unbounded stream (file source in production) and are checked against
  * a STATIC holdout n-gram set — the shape an ingestion pipeline actually
  * runs decontamination in (the benchmark set is fixed; the corpus is not).
  *
  * Scale design: the stream-static left-semi join is stateless (no
  * watermark or store needed for the join itself — the static side is
  * broadcastable at any realistic benchmark size), so throughput is
  * map-like. The only state is the per-doc flag dedup.
  */
object DocStreams {

  /** Flag every streaming document that shares at least one distinct
    * 8-gram with the static holdout set. Accepts batch or streaming input
    * (same function both ways — FileStreamSpec proves parity); returns
    * one row per contaminated doc_id. */
  def flagContaminated(docs: DataFrame, holdoutHashes: DataFrame): DataFrame =
    graft.operators.Curation.ngramHashes(docs)
      .join(holdoutHashes, Seq("h"), "left_semi")
      .select(col("doc_id"))
      .dropDuplicates("doc_id")

  /** Streaming quality gate: score every arriving document with the
    * hashed linear classifier ([[graft.operators.TextScoring.scoreQuality]]).
    * Stateless per-row work — identical code batch or streaming, no
    * watermark, no state store; throughput is map-like at any rate.
    * FileStreamSpec proves stream==batch on the same files. */
  def scoreQuality(docs: DataFrame): DataFrame =
    graft.operators.TextScoring.scoreQuality(docs)

  /** Refreshable-holdout decontamination — the shape ingestion actually
    * runs: the benchmark/holdout set GROWS while the corpus stream is
    * live (new eval sets get added), and documents must be checked
    * against the holdout as of their own microbatch.
    *
    * A plain stream-static join freezes the static side's file listing at
    * query start; re-reading the holdout directory inside `foreachBatch`
    * re-lists and re-plans it per microbatch instead, so n-grams added
    * between batches flag all subsequent documents (and only those — a
    * doc processed before the update legitimately passes; re-screening
    * history is a batch backfill, not the stream's job).
    *
    * Scale notes: per-batch cost is one directory listing + one
    * broadcastable distinct-hash build over the holdout — the same
    * stateless left-semi as the static variant, just rebuilt per batch.
    * For a holdout too big to rebuild per batch, swap the re-read for a
    * slowly-refreshed cached table keyed by holdout version. Flags are
    * deduplicated within a batch only; cross-batch dedup (a doc spanning
    * two files) is the downstream sink's merge, keeping the stream
    * stateless.
    *
    * @param sink called once per microbatch with (flagged doc_ids, batchId)
    */
  def flagContaminatedRefreshing(
      docs: DataFrame, holdoutDir: String, checkpoint: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val holdout = graft.operators.Curation
          .ngramHashes(batch.sparkSession.read.parquet(holdoutDir)
            .select(col("doc_id"), col("text")))
          .select(col("h")).distinct()
        sink(flagContaminated(batch, holdout), batchId)
      }
      .start()
}
