package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
