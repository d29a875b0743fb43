package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Deduplication operators over `documents` / `embeddings` (north-star
  * extensions, SURVEY.md §2.4): exact (hash-groupBy), MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design:
  *   - exact dedup is one hash aggregation — the canonical 100 TB shape.
  *   - MinHash+LSH: shingle → 16 permuted min-hashes → 4 bands × 4 rows →
  *     candidates only from band-bucket self-joins → exact Jaccard verify
  *     on candidates. All-pairs work never happens; cost is
  *     O(docs × shingles × K) + O(candidate pairs), the standard
  *     web-dedup recipe.
  *   - SimHash: 32-bit signature per doc; pair generation here is a
  *     bounded self-join (the sf tables are small); at 100 TB you'd band
  *     the signature bits exactly like MinHash-LSH.
  *   - n-gram Jaccard all-pairs is intentionally the *naive* baseline the
  *     LSH variant replaces — kept oracle-checked to prove the LSH result
  *     is a superset filter of the same measure.
  *   - embedding near-dup: exact double-precision cosine; bounded
  *     self-join here, IVF/LSH variant in graft.operators.Similarity.
  *
  * All hash arithmetic is mod 1e9+7 in BIGINT (see TextFunctions) so the
  * DuckDB oracles reproduce results bit-exactly.
  */
object Dedup {

  def all: Seq[QueryDef] =
    Seq(exact, minhashLsh, simhash, ngramJaccard, embeddingNearDup,
      embeddingNearDupLsh, paragraph, substringDedup, substringApply,
      substringIncremental, substringIncrementalStored, editVerify,
      prefixJaccard, containment, incremental, incrementalStored)

  /** Exact substring dedup — the suffix-array-class curation operator
    * ([[paragraph]]'s doc comment concedes its disjoint 8-word blocks
    * miss boundary-straddling spans; this closes that gap): flag every
    * token span of length ≥ W that appears verbatim ANYWHERE else in the
    * corpus (another document, or earlier in the same one), keeping only
    * the global first occurrence. A span of length ≥ W appears verbatim
    * elsewhere iff every one of its length-W subwindows does, so the
    * OVERLAPPING W-token windows are the complete detector: window
    * instances key by rolling hash, the global first occurrence
    * (min doc_id, then min position within it) is the keeper, and every
    * other instance marks its W tokens for removal. Per document the
    * flagged windows merge into disjoint spans by the sorted-starts
    * closed form Σ min(W, next_start − start) (no per-token explode —
    * a verbatim-copy doc costs O(windows), not O(windows × W)).
    *
    * Scale shape: one corpus scan → overlapping-window fan-out (≈1 row
    * per token) → ONE shuffle keyed by the window hash → first-occurrence
    * agg → join back on the same key → per-doc merge. Linear end to end;
    * no self-join, no candidate pairs (the `text_ngram_novelty` machinery
    * extended to removal). The per-window hash here re-folds W words
    * (O(L·W) character work per doc); the production upgrade at fixed
    * plan shape is an O(L) character-level rolling-hash expression —
    * plan structure, shuffle keys, and output are identical.
    *
    * Output per document: token count, duplicated-window count, merged
    * removed-token count, and the removed fraction — the cleaner's
    * report. W = 50 (the standard "drop ≥50-token verbatim spans"
    * curation setting); docs shorter than W have no windows and report
    * zero removed. */
  /** Tokenized corpus + duplicated-window starts — the shared front of
    * the substring-dedup pair: returns (docs = `(doc_id, t)`,
    * flagged = `(doc_id, pos)` window starts whose W-gram occurs earlier
    * corpus-wide). */
  private def substringFlags(docsIn: DataFrame, W: Int)
      : (DataFrame, DataFrame) = {
      graft.functions.HashExpressions.register(docsIn.sparkSession)
      val docs = docsIn
        .withColumn("t", tokens(col("text")))
        .select(col("doc_id"), col("t"))
        .localCheckpoint(false) // shared by the window fan-out + final join
      // materialize the hashed window instances ONCE: three consumers
      // (first-doc agg, first-pos agg, the flag join) would otherwise
      // each re-run the W-word gram assembly + hash — the dominant cost
      // (O(L·W) character work per pass; the A/B is in BASELINE.md).
      // The materialized relation is compact: (doc_id, pos, gh) ≈ 20 B
      // per corpus token, RDD-owned like every other localCheckpoint.
      val w = docs
        .select(col("doc_id"), posexplode(expr(shinglesSql("t", W))))
        .withColumnRenamed("pos", "pos0")
        .withColumn("gh", rollHash("col"))
        .select(col("doc_id"), col("pos0").as("pos"), col("gh"))
        .localCheckpoint(false)
      val firsts = w.groupBy(col("gh")).agg(min(col("doc_id")).as("fd"))
      val firstPos = w.join(firsts, "gh")
        .where(col("doc_id") === col("fd"))
        .groupBy(col("gh")).agg(min(col("pos")).as("fp"))
      val flagged = w.join(firsts, "gh").join(firstPos, "gh")
        .where(!(col("doc_id") === col("fd") && col("pos") === col("fp")))
        .select(col("doc_id"), col("pos"))
      (docs, flagged)
  }

  /** [[substringDedup]]'s core over an arbitrary `(doc_id, text, ...)`
    * frame with a configurable span width — the library entry point (and
    * what DedupSpec drives with authored fixtures). */
  def substringDedupOf(docsIn: DataFrame, W: Int): DataFrame =
    spanReport(substringFlags(docsIn, W), W)

  /** Per-document span report from a tokenized corpus + flagged window
    * starts: merged removed-token counts via the sorted-starts closed
    * form Σ min(W, gap). Shared by the self-contained report
    * ([[substringDedupOf]]) and the batch-vs-index probe
    * ([[substringProbe]]). */
  private def spanReport(docsFlags: (DataFrame, DataFrame), W: Int)
      : DataFrame = {
      val (docs, flagged) = docsFlags
      val wl = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val perDoc = flagged
        .withColumn("nxt", lead(col("pos"), 1).over(wl))
        .withColumn("cover",
          least(lit(W.toLong), coalesce(col("nxt") - col("pos"), lit(W.toLong))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("ndw"), sum(col("cover")).as("nrt"))
      docs.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("ndw"), lit(0L)).as("n_dup_windows"),
          coalesce(col("nrt"), lit(0L)).as("n_removed_tokens"),
          (coalesce(col("nrt"), lit(0L)).cast("double") / col("n_tokens"))
            .as("removed_frac"))
        .orderBy(col("doc_id"))
  }

  val substringDedup = QueryDef("dedup_substring",
    (s, d) => substringDedupOf(Tables.documents(s, d), 50),
    Some("""WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      w AS (
        SELECT doc_id, i - 1 AS pos,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(array_to_string(t[i:i+49], ' '), ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (h, c) -> (h*31+c) % 1000000007) AS gh
        FROM docs, UNNEST(range(1, len(t) - 48)) AS r(i)
        WHERE len(t) >= 50),
      firsts AS (SELECT gh, MIN(doc_id) AS fd FROM w GROUP BY gh),
      fpos AS (SELECT w.gh, MIN(pos) AS fp FROM w JOIN firsts USING (gh)
        WHERE doc_id = fd GROUP BY w.gh),
      flagged AS (SELECT doc_id, pos
        FROM w JOIN firsts USING (gh) JOIN fpos USING (gh)
        WHERE NOT (doc_id = fd AND pos = fp)),
      cov AS (SELECT doc_id, COUNT(*) AS ndw,
          SUM(LEAST(50, COALESCE(nxt - pos, 50))) AS nrt
        FROM (SELECT doc_id, pos,
            LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
          FROM flagged)
        GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        CAST(COALESCE(c.ndw, 0) AS BIGINT) AS n_dup_windows,
        CAST(COALESCE(c.nrt, 0) AS BIGINT) AS n_removed_tokens,
        CAST(COALESCE(c.nrt, 0) AS DOUBLE) / len(d.t) AS removed_frac
      FROM docs d LEFT JOIN cov c USING (doc_id)
      ORDER BY d.doc_id"""))

  /** Batch-vs-index substring probe — [[substringDedup]]'s daily steady
    * state (the [[incremental]] story at span granularity): the incoming
    * batch's overlapping W-token windows are checked against the EXISTING
    * corpus's stored window-hash index (one distinct-BIGINT relation,
    * 8 B/row in production, bucketed by hash so the probe shuffles the
    * batch only); a batch window whose gram exists anywhere in the index
    * is flagged, flags merge into spans by the same closed form, and
    * only batch docs get reports. Per-ingest cost ∝ batch tokens +
    * matched hashes — never the corpus. Here the index derives from one
    * scan to stay oracle-checkable, like the band index of
    * `dedup_incremental`. */
  def substringProbe(batchDocs: DataFrame, indexDocs: DataFrame, W: Int)
      : DataFrame =
    spanReport(probeFlags(batchDocs, indexDocs, W), W)

  /** Tokenized batch + its window starts flagged by PRESENCE in the
    * index corpus's window-hash set — the probe-side front shared by the
    * span report ([[substringProbe]]) and span-level decontamination
    * (strip-the-span apply over a holdout index). */
  private[operators] def probeFlags(batchDocs: DataFrame,
      indexDocs: DataFrame, W: Int): (DataFrame, DataFrame) = {
      graft.functions.HashExpressions.register(batchDocs.sparkSession)
      val b = batchDocs
        .withColumn("t", tokens(col("text")))
        .select(col("doc_id"), col("t"))
        .localCheckpoint(false)
      val bw = b
        .select(col("doc_id"), posexplode(expr(shinglesSql("t", W))))
        .withColumnRenamed("pos", "pos0")
        .withColumn("gh", rollHash("col"))
        .select(col("doc_id"), col("pos0").as("pos"), col("gh"))
      val idx = indexDocs
        .withColumn("t", tokens(col("text")))
        .select(posexplode(expr(shinglesSql("t", W))))
        .withColumn("gh", rollHash("col"))
        .select(col("gh")).distinct()
      val flagged = bw.join(idx, Seq("gh"), "left_semi")
        .select(col("doc_id"), col("pos"))
      (b, flagged)
  }

  /** Catalog entry for [[substringProbe]]: the `doc_id % 8 = 7` batch
    * probed against the rest of the corpus, `W = 50` — the report the
    * ingest pipeline reads before running the apply stage on the day's
    * crawl. */
  val substringIncremental = QueryDef("dedup_substring_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isBatch = col("doc_id") % 8 === 7
      substringProbe(docs.filter(isBatch), docs.filter(!isBatch), 50)
    },
    Some("""WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      w AS (
        SELECT doc_id, i - 1 AS pos,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(array_to_string(t[i:i+49], ' '), ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (h, c) -> (h*31+c) % 1000000007) AS gh
        FROM docs, UNNEST(range(1, len(t) - 48)) AS r(i)
        WHERE len(t) >= 50),
      idx AS (SELECT DISTINCT gh FROM w WHERE doc_id % 8 <> 7),
      flagged AS (SELECT doc_id, pos FROM w
        WHERE doc_id % 8 = 7 AND gh IN (SELECT gh FROM idx)),
      cov AS (SELECT doc_id, COUNT(*) AS ndw,
          SUM(LEAST(50, COALESCE(nxt - pos, 50))) AS nrt
        FROM (SELECT doc_id, pos,
            LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
          FROM flagged)
        GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        CAST(COALESCE(c.ndw, 0) AS BIGINT) AS n_dup_windows,
        CAST(COALESCE(c.nrt, 0) AS BIGINT) AS n_removed_tokens,
        CAST(COALESCE(c.nrt, 0) AS DOUBLE) / len(d.t) AS removed_frac
      FROM docs d LEFT JOIN cov c USING (doc_id)
      WHERE d.doc_id % 8 = 7
      ORDER BY d.doc_id"""))

  /** [[substringIncremental]] with the window-hash index actually
    * STORED — the `dedup_incremental_stored` pattern at span
    * granularity: the corpus's distinct window-hash relation (one
    * BIGINT per distinct W-gram, 8 B/row in production) is WRITTEN as
    * a parquet table bucketed on `gh`, and the batch probe semi-joins
    * the RE-READ table. The stored bucketing reaches the probe join
    * from the table catalog (PlanShapeSpec asserts the index side of
    * the semi join carries no shuffle), so the per-ingest cost is the
    * batch's windows + one bucketed table read — the steady state the
    * derived entry's doc comment promises. Same oracle as the derived
    * twin: equal hashes prove the store/reload round trip. */
  val substringIncrementalStored = QueryDef("dedup_substring_stored",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val docs = Tables.documents(s, d)
      val isBatch = col("doc_id") % 8 === 7
      // bootstrap (amortized across ingests in production)
      docs.filter(!isBatch)
        .withColumn("t", tokens(col("text")))
        .select(posexplode(expr(shinglesSql("t", 50))))
        .withColumn("gh", rollHash("col"))
        .select(col("gh")).distinct()
        .write.mode("overwrite")
        .bucketBy(16, "gh").sortBy("gh")
        .option("path", s"${sinkBase(d)}/graft_substr_idx").format("parquet")
        .saveAsTable("graft_substr_idx")
      // steady state: probe the re-read index
      spanReport(probeFlagsStored(docs.filter(isBatch),
        "graft_substr_idx", 50), 50)
    },
    substringIncremental.oracle)

  /** [[substringProbe]] against a STORED window-hash index table —
    * the probe half of `dedup_substring_stored` as a library entry
    * point, reused by the multi-day incremental pipeline
    * ([[PipelineE2E.pipelineIncrementalE2E]]). */
  def substringProbeStored(batchDocs: DataFrame, idxTable: String,
      W: Int): DataFrame =
    spanReport(probeFlagsStored(batchDocs, idxTable, W), W)

  /** [[probeFlags]] against a STORED window-hash index table: the
    * batch side is tokenized/windowed here; the index side costs one
    * bucketed table read. */
  private[graft] def probeFlagsStored(batchDocs: DataFrame,
      idxTable: String, W: Int): (DataFrame, DataFrame) = {
    val s = batchDocs.sparkSession
    graft.functions.HashExpressions.register(s)
    val b = batchDocs
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"), col("t"))
      .localCheckpoint(false)
    val bw = windowHashesOfTok(b, W)
    val flagged = bw.join(s.table(idxTable), Seq("gh"), "left_semi")
      .select(col("doc_id"), col("pos"))
    (b, flagged)
  }

  /** `(doc_id, pos, gh)` W-token window hashes of a tokenized
    * `(doc_id, t)` frame — the probe-side front of the span machinery,
    * factored so the multi-day pipeline computes it once per batch and
    * shares it between the span probe and the window-hash store append. */
  private[graft] def windowHashesOfTok(tok: DataFrame, W: Int): DataFrame =
    tok
      .select(col("doc_id"), posexplode(expr(shinglesSql("t", W))))
      .withColumnRenamed("pos", "pos0")
      .withColumn("gh", rollHash("col"))
      .select(col("doc_id"), col("pos0").as("pos"), col("gh"))

  /** [[substringProbeStored]] from precomputed tokenized (`tok`) and
    * window-hash (`bw`) frames — the multi-day pipeline's span probe. */
  private[graft] def substringProbeStoredFromWindows(tok: DataFrame,
      bw: DataFrame, idxTable: String, W: Int): DataFrame = {
    val s = tok.sparkSession
    val flagged = bw.join(s.table(idxTable), Seq("gh"), "left_semi")
      .select(col("doc_id"), col("pos"))
    spanReport((tok, flagged), W)
  }

  /** [[substringApply]]'s core: the CLEANED corpus — every token covered
    * by a duplicated ≥W-token span dropped, survivors re-joined in
    * order. The coverage test is a single per-doc running max: flag
    * events (a duplicated window starting at `pos` covers up to
    * `pos + W`) merge-sort with the token stream by position (flags
    * first on ties), and a token at `p` survives iff the running max of
    * flag limits is absent or ≤ `p`. One window per doc partition over
    * ~2 rows per token — linear, no per-token×W explode, no join
    * against span lists. */
  def substringApplyOf(docsIn: DataFrame, W: Int): DataFrame =
    spanApply(substringFlags(docsIn, W), W)

  /** Cleaned-text assembly from a tokenized corpus + flagged window
    * starts — the merge-sort/running-max removal shared by the
    * whole-corpus apply ([[substringApplyOf]]) and the span-level
    * decontamination probe ([[graft.operators.Curation]]'s
    * `text_decontaminate_spans`). */
  private[operators] def spanApply(docsFlags: (DataFrame, DataFrame), W: Int)
      : DataFrame = {
      val (docs, flagged) = docsFlags
      val toks = docs
        .select(col("doc_id"), posexplode(col("t")).as(Seq("p", "tok")))
      val ev = flagged.select(col("doc_id"), col("pos").as("p"),
          lit(0).as("kind"), lit(null).cast("string").as("tok"),
          (col("pos") + lit(W)).as("lim"))
        .unionByName(toks.select(col("doc_id"), col("p"),
          lit(1).as("kind"), col("tok"), lit(null).cast("int").as("lim")))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("p"), col("kind"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val kept = ev
        .withColumn("carry", max(col("lim")).over(wc))
        .filter(col("kind") === 1 &&
          (col("carry").isNull || col("carry") <= col("p")))
      val agg = kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nk"),
          array_join(expr(
            "transform(sort_array(collect_list(struct(p, tok))), x -> x.tok)"),
            " ").as("ct"))
      docs.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("nk"), lit(0L)).as("n_kept"),
          coalesce(col("ct"), lit("")).as("clean_text"))
        .orderBy(col("doc_id"))
  }

  /** The apply stage of [[substringDedup]] — not the report but the
    * CLEANED CORPUS itself (doc_id, token counts, rebuilt text with
    * every duplicated ≥W-token span stripped), the artifact the next
    * pipeline stage actually consumes. A verbatim-copy document comes
    * out empty; the first occurrence keeps its text verbatim. Same
    * linear shape as the report plus one ordered per-doc re-join. */
  val substringApply = QueryDef("dedup_substring_apply",
    (s, d) => substringApplyOf(Tables.documents(s, d), 50),
    Some("""WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      w AS (
        SELECT doc_id, i - 1 AS pos,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(array_to_string(t[i:i+49], ' '), ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (h, c) -> (h*31+c) % 1000000007) AS gh
        FROM docs, UNNEST(range(1, len(t) - 48)) AS r(i)
        WHERE len(t) >= 50),
      firsts AS (SELECT gh, MIN(doc_id) AS fd FROM w GROUP BY gh),
      fpos AS (SELECT w.gh, MIN(pos) AS fp FROM w JOIN firsts USING (gh)
        WHERE doc_id = fd GROUP BY w.gh),
      flagged AS (SELECT doc_id, pos
        FROM w JOIN firsts USING (gh) JOIN fpos USING (gh)
        WHERE NOT (doc_id = fd AND pos = fp)),
      toks AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
        FROM docs, UNNEST(range(1, len(t) + 1)) AS r(i)),
      ev AS (SELECT doc_id, pos AS p, 0 AS kind,
          CAST(NULL AS VARCHAR) AS tok, pos + 50 AS lim FROM flagged
        UNION ALL
        SELECT doc_id, p, 1, tok, NULL FROM toks),
      kept AS (SELECT doc_id, p, tok FROM (
          SELECT doc_id, p, kind, tok,
            MAX(lim) OVER (PARTITION BY doc_id ORDER BY p, kind
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
          FROM ev)
        WHERE kind = 1 AND (carry IS NULL OR carry <= p)),
      agg AS (SELECT doc_id, COUNT(*) AS nk,
          array_to_string(list(tok ORDER BY p), ' ') AS ct
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        CAST(COALESCE(a.nk, 0) AS BIGINT) AS n_kept,
        COALESCE(a.ct, '') AS clean_text
      FROM docs d LEFT JOIN agg a USING (doc_id)
      ORDER BY d.doc_id"""))

  /** Sub-document dedup: whole-document near-dup passes keep one copy of a
    * page, but production corpus cleaning also strips CONTENT repeated
    * across different pages (boilerplate headers, licence blocks, quoted
    * passages). Granularity here is disjoint 8-word blocks — the windowed
    * flavor of paragraph dedup, which needs no delimiter convention in the
    * corpus. Every block is hashed with the portable rolling hash, the
    * global first occurrence (min (doc_id, blk_idx)) is the keeper, and
    * each document reports how many of its blocks a cleaner would drop.
    *
    * Scale shape: one corpus scan → block fan-out (size/W rows per doc) →
    * one shuffle keyed by block hash (well-distributed by construction;
    * a pathological hot block — think empty boilerplate — is exactly what
    * [[graft.core.Skew.saltedJoin]] handles) → per-doc re-aggregation.
    * No self-join, no candidate explosion: cost is linear in corpus size,
    * unlike pairwise near-dup. ScaleSmoke covers linearity at 8×. */
  val paragraph = QueryDef("dedup_paragraph",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val W = 8
      val blocks = Tables.documents(s, d)
        .withColumn("t", tokens(col("text")))
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, cast(ceil(size(t) / $W.0) as int) - 1, 1), " +
            s"i -> array_join(slice(t, i * $W + 1, $W), ' '))")))
        .withColumnRenamed("pos", "blk_idx")
        .withColumnRenamed("col", "blk")
        .withColumn("bhash", rollHash("blk"))
      val firstSeen = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bhash")).orderBy(col("doc_id"), col("blk_idx"))
      blocks.withColumn("rn", row_number().over(firstSeen))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_removed"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      blocks AS (
        SELECT doc_id, i AS blk_idx,
          array_to_string(t[(i*8+1):least((i+1)*8, len(t))], ' ') AS blk
        FROM docs, UNNEST(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS r(i)),
      hashed AS (
        SELECT doc_id, blk_idx, list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(blk, ''), c -> CAST(unicode(c) AS BIGINT))),
          (h, c) -> (h*31+c) % 1000000007) AS bhash
        FROM blocks),
      ranked AS (
        SELECT doc_id, ROW_NUMBER() OVER (
          PARTITION BY bhash ORDER BY doc_id, blk_idx) AS rn
        FROM hashed)
      SELECT doc_id, COUNT(*) AS n_blocks,
        CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
      FROM ranked GROUP BY doc_id ORDER BY doc_id"""))

  /** Exact dedup on bag-of-words normal form: groupBy(normalized text) →
    * keeper = min doc_id, group size. */
  val exact = QueryDef("dedup_exact",
    (s, d) => Tables.documents(s, d)
      .withColumn("norm", array_join(array_sort(tokens(col("text"))), " "))
      .groupBy(col("norm"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
      .select(col("keeper"), col("n_dups"))
      .orderBy(col("keeper")),
    Some("""SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_dups
      FROM (SELECT doc_id,
        array_to_string(list_sort(string_split(text,' ')),' ') AS norm
        FROM documents)
      GROUP BY norm ORDER BY keeper"""))

  /** (doc_id, ss) distinct word-3-gram shingle sets of an arbitrary
    * `(doc_id, text, ...)` frame — the shared front of every MinHash
    * path (self-join, incremental probe, streaming probe). */
  private def shingleSetsOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("t", tokens(col("text")))
      .filter(size(col("t")) >= 3)
      .withColumn("ss", array_distinct(expr(shinglesSql("t", 3))))
      .select(col("doc_id"), col("ss"))

  private def shingleSets(s: SparkSession, d: String): DataFrame =
    shingleSetsOf(Tables.documents(s, d))

  /** String-set Jaccard — the exact all-pairs yardstick's spelling
    * ([[ngramJaccard]] keeps literal string shingles so the recall
    * eval has an unhashed ground truth). */
  private val jaccardExpr =
    (size(array_intersect(col("a_ss"), col("b_ss"))).cast("double") /
      (size(col("a_ss")) + size(col("b_ss")) -
        size(array_intersect(col("a_ss"), col("b_ss")))))

  /** (doc_id, hs) SORTED DISTINCT HASHED word-3-gram shingle sets — the
    * r14 representation of the whole MinHash family (r13 verdict item
    * 1): shingles roll-hash to BIGINTs at extraction, so every verify
    * join carries 8 B/shingle sorted long arrays instead of ~25-char
    * strings (the r13 512× tier's 1.4×-over-linear residue was exactly
    * those materialized string sets spilling at 2.56 M docs), and the
    * Jaccard verify becomes [[graft.functions.SortedIntersectCount]]'s
    * primitive-long merge walk. Hash collisions merge shingles
    * IDENTICALLY in both engines (same rollHash both sides), so the
    * hashed-shingle Jaccard is itself oracle-exact; the unhashed
    * string-set Jaccard survives as [[ngramJaccard]]'s yardstick. */
  private def hashedShingleSetsOf(docs: DataFrame): DataFrame =
    hashedShingleSetsOfTok(docs.withColumn("t", tokens(col("text"))))

  /** [[hashedShingleSetsOf]] from an already-tokenized `(doc_id, t)`
    * frame — the multi-day pipeline tokenizes each batch ONCE and feeds
    * the same `t` to every per-doc derivation (r16: the first cut
    * re-tokenized the batch in every helper). Identical expression tree
    * from `t` onward, so values cannot drift from the docs-frame path. */
  private[graft] def hashedShingleSetsOfTok(tok: DataFrame): DataFrame =
    tok
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(shinglesSql("t", 3))).as("sh"))
      .withColumn("th", rollHash("sh"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("th"))).as("hs"))

  /** Hashed-set Jaccard over `(a_hs, b_hs)` sorted long arrays: the
    * intersection size is computed ONCE per pair by the codegen merge
    * walk (Catalyst CSE dedups the two spellings below). */
  private val jaccardHashedExpr =
    (expr("sorted_intersect_count(a_hs, b_hs)").cast("double") /
      (size(col("a_hs")) + size(col("b_hs")) -
        expr("sorted_intersect_count(a_hs, b_hs)")))

  /** (doc_id, band, bkey) LSH band keys from a `(doc_id, hs)` hashed
    * shingle-set relation: K=16 minhashes as 16 `min` aggregates in ONE
    * groupBy over the exploded hash rows (one shuffle, full map-side
    * partials — and no re-hashing: the stored hashes ARE the permuted
    * inputs), then 4 bands × 4 rows unpivoted by `stack` without
    * leaving codegen. Shared by the self-join path ([[minhashPairs]])
    * and the batch-vs-index probe ([[incremental]]). */
  private[graft] def minhashBands(sets: DataFrame): DataFrame = {
    val minCols = (0 until 16).map(i =>
      min(expr(minhashPermSql("th", i.toString))).as(s"m$i"))
    val mh = sets
      .select(col("doc_id"), explode(col("hs")).as("th"))
      .groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until 4).map { b =>
      concat_ws(",", (0 until 4).map(r => col(s"m${4 * b + r}").cast("string")): _*)
        .as(s"bkey$b")
    }
    mh.select(col("doc_id") +: bandCols: _*)
      .selectExpr("doc_id",
        "stack(4, 0, bkey0, 1, bkey1, 2, bkey2, 3, bkey3) AS (band, bkey)")
  }

  /** Shared DuckDB CTE block for the hashed-shingle MinHash machinery
    * over `fromRel` (any relation exposing `doc_id` and
    * `t = string_split(text, ' ')`): CTEs `sets(doc_id, hs)`, `thr`,
    * `mh`, `bands(doc_id, band, bkey)` — ONE definition reused by every
    * minhash oracle (Dedup, Components, PipelineE2E) so the hash, the
    * permutations, and the banding cannot drift between entries. */
  def minhashCtesSqlDuck(fromRel: String): String =
    s"""sets AS (SELECT doc_id, list_sort(list_distinct(list_transform(
        list_transform(range(1, len(t)-1),
          j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2]),
        sh -> list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(sh,''),
            c -> CAST(unicode(c) AS BIGINT))),
          (h,c) -> (h*31+c) % 1000000007)))) AS hs
      FROM $fromRel WHERE len(t) >= 3),
    thr AS (SELECT doc_id, unnest(hs) AS th FROM sets),
    mh AS (SELECT doc_id, i, MIN(((2*i+1)*th + (7*i+3)) % 1000000007) AS mh
      FROM thr, range(0,16) r(i) GROUP BY doc_id, i),
    bands AS (SELECT doc_id, CAST(i // 4 AS INT) AS band,
        array_to_string(list_transform(list_sort(list({'i': i, 'mh': mh})),
          x -> CAST(x.mh AS VARCHAR)), ',') AS bkey
      FROM mh GROUP BY doc_id, band)"""

  /** DuckDB hashed-set Jaccard over two BIGINT-list columns. */
  def jaccardSqlDuck(a: String, b: String): String =
    s"""CAST(len(list_intersect($a, $b)) AS DOUBLE) /
      (len($a) + len($b) - len(list_intersect($a, $b)))"""

  /** MinHash + LSH near-dup: K=16 signature, 4 bands × 4 rows, candidates
    * from band buckets, verified at Jaccard ≥ 0.5.
    *
    * All 16 min-hashes are computed as 16 `min` aggregates in ONE groupBy
    * over the shingle rows — one shuffle with full map-side partial
    * aggregation. (The first cut crossJoined each shingle with
    * `range(16)`, multiplying the shuffled rows 16×; at 100 TB that factor
    * is the difference between one corpus-sized shuffle and sixteen.) */
  /** MinHash+LSH near-dup pairs over an arbitrary `(doc_id, text, ...)`
    * corpus frame — the reusable core of [[minhashLsh]], also the
    * near-dup stage of the end-to-end curation pipeline
    * ([[PipelineE2E]]). Returns `(a, b, jaccard)` with `a < b`,
    * Jaccard ≥ 0.5 on distinct word-3-gram shingles. */
  def minhashPairs(docs: DataFrame): DataFrame = {
      val s = docs.sparkSession
      graft.functions.HashExpressions.register(s)
      // Materialize the shingle sets ONCE for the 3 uses below — A/B at
      // sf0.1: recompute min 4.50 s vs materialized min 1.27 s (the
      // distinct-shingle build dominates, unlike the langid/decontaminate
      // pipelines where recompute won). But .cache() left a CacheManager
      // entry per invocation (a per-call leak for library callers, only
      // papered over by the harnesses' clearCache); localCheckpoint keeps
      // the same one-shot materialization with blocks owned by the RDD —
      // the ContextCleaner frees them on GC, no session-lifetime state.
      // CacheHygieneSpec pins the no-cache-entry invariant catalog-wide.
      // Lazy (false): materializes with the first action instead of at
      // query-construction time, so plan-only callers (Explain) stay free.
      val sets = hashedShingleSetsOf(docs).localCheckpoint(false)
      minhashPairsFromSets(sets, minhashBands(sets))
  }

  /** [[minhashPairs]]' verify stage from precomputed shingle-set and
    * band frames — shared with the multi-day pipeline, which computes
    * `sets`/`bands` once per batch and reuses them across the stored
    * probe, the in-batch self-join and the store append. */
  private[graft] def minhashPairsFromSets(sets: DataFrame,
      bands: DataFrame): DataFrame = {
      val cands = bands.alias("x").join(bands.alias("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      cands
        .join(sets.select(col("doc_id").as("a"), col("hs").as("a_hs")), "a")
        .join(sets.select(col("doc_id").as("b"), col("hs").as("b_hs")), "b")
        .withColumn("jaccard", jaccardHashedExpr)
        .filter(col("jaccard") >= 0.5)
        .select(col("a"), col("b"), col("jaccard"))
  }

  val minhashLsh = QueryDef("dedup_minhash_lsh",
    (s, d) => minhashPairs(Tables.documents(s, d))
      .orderBy(col("a"), col("b")),
    Some(s"""WITH ${minhashCtesSqlDuck(
        "(SELECT doc_id, string_split(text,' ') AS t FROM documents)")},
      cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      SELECT a, b, ${jaccardSqlDuck("sa.hs", "sb.hs")} AS jaccard
      FROM cands JOIN sets sa ON sa.doc_id = a JOIN sets sb ON sb.doc_id = b
      WHERE ${jaccardSqlDuck("sa.hs", "sb.hs")} >= 0.5
      ORDER BY a, b"""),
    bench = true)

  /** Incremental ingest dedup — the shape a 100 TB corpus actually runs
    * DAILY: an incoming batch (docs with `doc_id % 8 = 7` stand in for
    * today's crawl) is probed against the EXISTING corpus's LSH band
    * index; only band-bucket collisions are verified, and only batch
    * docs get drop decisions. The full self-join ([[minhashLsh]]) is the
    * bootstrap; this is the steady state, where per-ingest cost is
    * proportional to the batch and its matched buckets — NOT the corpus:
    * in production the `(bkey, doc_id)` index side is precomputed and
    * stored bucketed by band key (see `sink_bucketed_roundtrip` for the
    * layout machinery), so the probe join shuffles the batch only. Here
    * both sides derive from one scan (the testdata has no stored index),
    * which keeps the entry oracle-checkable end to end; the plan's join
    * structure is identical either way.
    *
    * Output: one row per batch doc that near-duplicates an index doc
    * (Jaccard ≥ 0.5 on word-3-gram shingles) — its keeper (min matching
    * index id) and the strongest similarity that condemned it. */
  val incremental = QueryDef("dedup_incremental",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val sets = hashedShingleSetsOf(Tables.documents(s, d))
        .localCheckpoint(false)
      val bands = minhashBands(sets)
      val isBatch = col("doc_id") % 8 === 7
      val cands = bands.filter(isBatch).alias("x")
        .join(bands.filter(!isBatch).alias("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
        .select(col("x.doc_id").as("b"), col("y.doc_id").as("a"))
        .distinct()
      cands
        .join(sets.select(col("doc_id").as("a"), col("hs").as("a_hs")), "a")
        .join(sets.select(col("doc_id").as("b"), col("hs").as("b_hs")), "b")
        .withColumn("jaccard", jaccardHashedExpr)
        .filter(col("jaccard") >= 0.5)
        .groupBy(col("b"))
        .agg(min(col("a")).as("kept_as"), max(col("jaccard")).as("max_jaccard"))
        .select(col("b").as("doc_id"), col("kept_as"), col("max_jaccard"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ${minhashCtesSqlDuck(
        "(SELECT doc_id, string_split(text,' ') AS t FROM documents)")},
      cands AS (SELECT DISTINCT x.doc_id AS b, y.doc_id AS a
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bkey = y.bkey
        WHERE x.doc_id % 8 = 7 AND y.doc_id % 8 <> 7),
      verified AS (SELECT b, a,
          ${jaccardSqlDuck("sa.hs", "sb.hs")} AS jaccard
        FROM cands JOIN sets sa ON sa.doc_id = a JOIN sets sb ON sb.doc_id = b)
      SELECT b AS doc_id, MIN(a) AS kept_as, MAX(jaccard) AS max_jaccard
      FROM verified WHERE jaccard >= 0.5
      GROUP BY b ORDER BY doc_id"""),
    bench = true)

  /** [[incremental]] with the index actually STORED — the deployment
    * shape [[incremental]]'s doc comment promises: the corpus side's
    * band index and shingle sets are WRITTEN as parquet tables bucketed
    * on their join keys (16 buckets on `bkey` / `doc_id` — the
    * `sink_bucketed_roundtrip` layout machinery), then the batch probes
    * the tables read BACK from disk. The probe join reads the stored
    * bucketing from the table catalog, so only the day's batch shuffles
    * — the per-ingest cost the steady state actually pays; result
    * equality with [[incremental]] (same oracle, hash-compared) IS the
    * proof that the store/reload round-trip preserves the probe.
    *
    * (Index build cost is charged to this entry too — in production it
    * is amortized across ingests; here it keeps the entry one-shot and
    * oracle-checkable.) */
  val incrementalStored = QueryDef("dedup_incremental_stored",
    (s, d) => {
      val isBatch = col("doc_id") % 8 === 7
      val docs = Tables.documents(s, d)
      writeMinhashIndexTables(docs.filter(!isBatch), sinkBase(d),
        "graft_minhash_bands", "graft_minhash_sets")
      crossPairsStored(docs.filter(isBatch),
        "graft_minhash_bands", "graft_minhash_sets")
        .groupBy(col("b"))
        .agg(min(col("a")).as("kept_as"), max(col("jaccard")).as("max_jaccard"))
        .select(col("b").as("doc_id"), col("kept_as"), col("max_jaccard"))
        .orderBy(col("doc_id"))
    },
    incremental.oracle)

  /** Per-sfDir root for stored-index tables (the `sink_bucketed_
    * roundtrip` layout convention): one directory per corpus so
    * different scale factors never clobber each other's tables. */
  private[graft] def sinkBase(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_sink/" +
      d.replaceAll("[^A-Za-z0-9]", "_")

  /** Write `docs`' MinHash index as two parquet TABLES bucketed on
    * their probe-join keys — the band index on `(band, bkey)` and the
    * shingle sets on `doc_id` (16 buckets each). A probe that reads
    * them back picks up the stored bucketing from the table catalog,
    * so only the probing batch shuffles — the steady-state per-ingest
    * cost. Shared by [[incrementalStored]], the stored
    * component-maintenance entry
    * ([[Components.componentsIncrementalStored]]), and (with
    * `mode = "append"`, the daily store-maintenance write) the
    * multi-day pipeline ([[PipelineE2E.pipelineIncrementalE2E]]).
    * Appends keep the declared bucketing: each job's files are
    * bucket-hashed the same way, and Spark unions per-bucket files at
    * read time, so a probe against an appended table still avoids the
    * index-side shuffle. */
  def writeMinhashIndexTables(docs: DataFrame, baseDir: String,
      bandsTable: String, setsTable: String,
      mode: String = "overwrite"): Unit = {
    val s = docs.sparkSession
    graft.functions.HashExpressions.register(s)
    val sets = hashedShingleSetsOf(docs).localCheckpoint(false)
    writeMinhashIndexTablesFromSets(sets, minhashBands(sets), baseDir,
      bandsTable, setsTable, mode)
  }

  /** [[writeMinhashIndexTables]] from precomputed `sets`/`bands` frames
    * (same layout, same bucketing) — the multi-day pipeline's append
    * path reuses the batch frames its probe stage already materialized
    * instead of re-shingling the batch. */
  private[graft] def writeMinhashIndexTablesFromSets(sets: DataFrame,
      bands: DataFrame, baseDir: String,
      bandsTable: String, setsTable: String,
      mode: String = "overwrite"): Unit = {
    bands
      .write.mode(mode)
      .bucketBy(16, "band", "bkey").sortBy("band", "bkey")
      .option("path", s"$baseDir/$bandsTable").format("parquet")
      .saveAsTable(bandsTable)
    sets
      .write.mode(mode)
      .bucketBy(16, "doc_id").sortBy("doc_id")
      .option("path", s"$baseDir/$setsTable").format("parquet")
      .saveAsTable(setsTable)
  }

  /** [[crossPairs]] against a STORED index written by
    * [[writeMinhashIndexTables]]: verified `(a, b, jaccard)` pairs of
    * `batchDocs` (as `b`) vs the stored corpus (as `a`), candidates
    * only from band-bucket collisions against the re-read band table.
    * Only the batch side is shingled/banded here — the stored side
    * costs one bucketed table read. */
  def crossPairsStored(batchDocs: DataFrame,
      bandsTable: String, setsTable: String): DataFrame = {
    val s = batchDocs.sparkSession
    graft.functions.HashExpressions.register(s)
    val bs = hashedShingleSetsOf(batchDocs).localCheckpoint(false)
    crossPairsStoredFromSets(bs, minhashBands(bs), bandsTable, setsTable)
  }

  /** [[crossPairsStored]] from precomputed batch `sets`/`bands` frames —
    * shared with the multi-day pipeline's probe stage. */
  private[graft] def crossPairsStoredFromSets(bs: DataFrame,
      bsBands: DataFrame, bandsTable: String, setsTable: String): DataFrame = {
    val s = bs.sparkSession
    val cands = bsBands.alias("x")
      .join(s.table(bandsTable).alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("b"), col("y.doc_id").as("a"))
      .distinct()
    cands
      .join(s.table(setsTable)
        .select(col("doc_id").as("a"), col("hs").as("a_hs")), "a")
      .join(bs.select(col("doc_id").as("b"), col("hs").as("b_hs")), "b")
      .withColumn("jaccard", jaccardHashedExpr)
      .filter(col("jaccard") >= 0.5)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Connectivity-equivalent near-dup edge set, duplicate-proof by the
    * class construction (the `mm_phash_neardup` discipline applied to
    * MinHash): documents with IDENTICAL shingle sets collapse to one
    * class (key = the sorted set itself — exact identity, no hash
    * collision risk; rep = min doc_id), the edge set is rep→member star
    * edges plus band-verified pairs over REPS ONLY, and connected
    * components over it equal components over the full pair graph:
    *
    *  - same-class docs are mutual Jaccard-1 pairs in the full graph
    *    (identical sets share every band), so a class is one connected
    *    chunk — the star edges reproduce exactly that connectivity;
    *  - a class member has its rep's band keys and Jaccard to everything,
    *    so a cross-class pair exists in the full graph iff the rep pair
    *    exists — rep-level mining loses nothing.
    *
    * Why it matters: a verbatim-duplicated corpus (the common case dedup
    * exists FOR) makes full pair enumeration quadratic in the copy count
    * (64 copies ⇒ 2016 pairs per base doc); the class edge set is linear
    * in members + quadratic only in DISTINCT near-dup content. Measured:
    * `split_leakage_safe` 64×-replica tier 129.7 s → single digits on
    * this edge set, bit-identical components. */
  def minhashClassEdges(docs: DataFrame): DataFrame = {
    graft.functions.HashExpressions.register(docs.sparkSession)
    // the hashed set is ALREADY sorted-distinct, so it IS the class key
    // (hash-collision risk applies to the whole hashed-shingle family
    // identically — see hashedShingleSetsOf)
    val sets = hashedShingleSetsOf(docs).localCheckpoint(false)
    val classes = sets.groupBy(col("hs")).agg(min(col("doc_id")).as("rep"))
    val members = sets.select(col("doc_id"), col("hs"))
      .join(classes, "hs")
      .select(col("doc_id"), col("rep"))
    val memberEdges = members.filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a"), col("doc_id").as("b"))
    val repSets = sets
      .join(classes.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("hs"))
      .localCheckpoint(false)
    val bands = minhashBands(repSets)
    val cands = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val repPairs = cands
      .join(repSets.select(col("doc_id").as("a"), col("hs").as("a_hs")), "a")
      .join(repSets.select(col("doc_id").as("b"), col("hs").as("b_hs")), "b")
      .withColumn("jaccard", jaccardHashedExpr)
      .filter(col("jaccard") >= 0.5)
      .select(col("a"), col("b"))
    memberEdges.union(repPairs)
  }

  /** [[incremental]]'s probe as a two-frame library function — the form
    * the STREAMING ingest path calls per microbatch (DocStreams
    * `dedupAgainstIndexStream`): drop decisions for `batchDocs` probed
    * against `indexDocs`' LSH band index, unordered (streaming sinks
    * impose their own order). Each side is shingled/banded with the same
    * helpers as the catalog entry, so stream-vs-batch parity is exact
    * (pinned in FileStreamSpec). Per-call cost note: this rebuilds the
    * index side's bands — right for tests and small holdouts; production
    * stores the `(bkey, doc_id)` relation and loads it here instead. */
  def probeAgainstIndex(batchDocs: DataFrame, indexDocs: DataFrame): DataFrame =
    crossPairs(batchDocs, indexDocs)
      .groupBy(col("b"))
      .agg(min(col("a")).as("kept_as"), max(col("jaccard")).as("max_jaccard"))
      .select(col("b").as("doc_id"), col("kept_as"), col("max_jaccard"))

  /** Verified MinHash near-dup pairs ACROSS two corpora — `(a, b,
    * jaccard)` with `a` from `indexDocs`, `b` from `batchDocs`, Jaccard
    * ≥ 0.5 on word-3-gram shingles, candidates only from band-bucket
    * collisions. The pair-level core [[probeAgainstIndex]] aggregates
    * into drop decisions, and the edge feed the incremental component
    * maintenance path ([[Components.incrementalLabels]]) unions with
    * the batch's internal pairs. */
  def crossPairs(batchDocs: DataFrame, indexDocs: DataFrame): DataFrame = {
    graft.functions.HashExpressions.register(batchDocs.sparkSession)
    val bs = hashedShingleSetsOf(batchDocs).localCheckpoint(false)
    val is = hashedShingleSetsOf(indexDocs).localCheckpoint(false)
    val cands = minhashBands(bs).alias("x")
      .join(minhashBands(is).alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("b"), col("y.doc_id").as("a"))
      .distinct()
    cands
      .join(is.select(col("doc_id").as("a"), col("hs").as("a_hs")), "a")
      .join(bs.select(col("doc_id").as("b"), col("hs").as("b_hs")), "b")
      .withColumn("jaccard", jaccardHashedExpr)
      .filter(col("jaccard") >= 0.5)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 32-bit SimHash signatures + near-dup pairs at Hamming distance ≤ 1.
    *
    * All 32 bit-majority votes are 32 `sum` aggregates in ONE groupBy over
    * the token rows (plus a count) — one shuffle, map-side partials, no
    * 32× row multiplication (which the first crossJoin-with-range cut
    * paid). The signature is then assembled per doc in a single codegen'd
    * projection. */
  /** 32-bit SimHash signature per document: all 32 bit-majority votes as
    * aggregate columns in one groupBy. Shared by the catalog query and
    * the banding-correctness test. */
  /** Effective signature width: roll_hash values are < HashMod < 2^30, so
    * bits 30/31 of any token hash are identically zero — computing their
    * majority votes would be dead work. The DuckDB oracle spells all 32
    * for clarity; its top two bits are provably 0, so signatures agree. */
  private val SimHashBits = 30

  def simhashSignatures(s: SparkSession, d: String): DataFrame = {
    graft.functions.HashExpressions.register(s)
    val th = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .withColumn("h", rollHash("w"))
    val bitSums = (0 until SimHashBits).map(i =>
      sum(expr(s"(h div ${1L << i}L) % 2")).as(s"s$i"))
    th.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("cnt"), bitSums: _*)
      .select(col("doc_id"),
        (0 until SimHashBits).map(i =>
          when(lit(2) * col(s"s$i") >= col("cnt"), lit(1L << i))
            .otherwise(0L)).reduce(_ + _).as("simhash"))
  }

  val simhash = QueryDef("dedup_simhash",
    (s, d) => {
      // pigeonhole bands: a pair at Hamming ≤ 1 differs in at most one
      // half, so it agrees EXACTLY on the other — equi-joins on the
      // 16-bit low / 14-bit high halves find every qualifying pair with
      // no all-pairs stage. (The quadratic self-join this replaces went
      // 1.25 s → 15.6 s on an 8× corpus in graft.tools.ScaleSmoke; this
      // is the exact same output, found by hash join. DedupSpec proves
      // set equality.)
      val sigs = simhashSignatures(s, d)
        .withColumn("lo", col("simhash") % 65536L)
        .withColumn("hi", expr("simhash div 65536"))
      // the two band joins are disjoint by construction (the hi join only
      // takes pairs whose lo halves differ), so no dedup shuffle is needed
      def half(b: String, extra: Column) = sigs.alias("x").join(sigs.alias("y"),
          col(s"x.$b") === col(s"y.$b") && col("x.doc_id") < col("y.doc_id") &&
            extra)
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      half("lo", lit(true))
        .unionAll(half("hi", col("x.lo") =!= col("y.lo")))
        .withColumn("hamming",
          bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
        .filter(col("hamming") <= 1)
        .select(col("a"), col("b"), col("hamming"))
        .orderBy(col("a"), col("b"))
    },
    Some("""WITH th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(w,''), c -> CAST(unicode(c) AS BIGINT))),
          (h,c) -> (h*31+c) % 1000000007) AS h
        FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)),
      bits AS (SELECT doc_id, i,
          CASE WHEN 2*SUM((h // (1::BIGINT << i)) % 2) >= COUNT(*)
            THEN (1::BIGINT << i) ELSE 0 END AS b
        FROM th, range(0,32) r(i) GROUP BY doc_id, i),
      sigs AS (SELECT doc_id, SUM(b) AS simhash FROM bits GROUP BY doc_id)
      SELECT x.doc_id AS a, y.doc_id AS b,
        CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
      FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 1
      ORDER BY a, b"""))

  /** Prefix-filtering set-similarity join (the PPJoin/AllPairs family) —
    * the third classical near-dup candidate generator beside MinHash-LSH
    * banding and SimHash pigeonholing, and the only EXACT one: if
    * J(x, y) ≥ τ, then under ANY fixed total token order x and y must
    * share a token within each one's first |x| − ⌈τ·|x|⌉ + 1 tokens
    * (drop that whole prefix and too little of x remains to reach τ).
    * Ordering tokens rarest-first makes those prefix tokens the LOW-
    * fan-out join keys: candidates equi-join on tokens that by
    * construction appear in few documents, so the pair explosion a
    * common-token join would cause cannot happen — frequency order is
    * both the correctness-preserving and the skew-killing choice.
    * Exact-Jaccard verification then trims the candidate superset to
    * precisely the qualifying pairs, so both engines agree on the final
    * rows no matter how their candidate sets differ.
    *
    * Plan: token sets → vocabulary frequencies (un-hinted: AQE
    * broadcasts them at runtime while the vocabulary is small, and a
    * 100 TB vocabulary correctly falls back to a shuffle join) → per-doc
    * (freq, token)-ordered prefix via a doc-partitioned window → prefix
    * self-equi-join → distinct pairs → set-intersection scoring. No
    * all-pairs stage anywhere. τ = 0.9 (near-identical dedup): on this
    * synthetic corpus's ~25×-replicated families a looser τ makes the
    * OUTPUT itself quadratic in family size (τ=0.6 produced 73 k pairs
    * from 500 docs) — the threshold, not the algorithm, governs output
    * volume, exactly as in production web dedup. */
  val prefixJaccard = QueryDef("dedup_prefix_jaccard",
    (s, d) => {
      val Tau = 0.9
      val ts = Tables.documents(s, d)
        .select(col("doc_id"), array_distinct(tokens(col("text"))).as("ts"))
      val tok = ts.select(col("doc_id"), size(col("ts")).as("sz"),
        explode(col("ts")).as("w"))
      val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("cnt"), col("w"))
      val pref = tok.join(freq, "w")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <=
          col("sz") - ceil(lit(Tau) * col("sz").cast("double")) + 1)
        .select(col("doc_id"), col("w"))
      val cand = pref.alias("x")
        .join(pref.alias("y"),
          col("x.w") === col("y.w") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      cand
        .join(ts.select(col("doc_id").as("a"), col("ts").as("ta")), "a")
        .join(ts.select(col("doc_id").as("b"), col("ts").as("tb")), "b")
        .withColumn("jaccard",
          size(array_intersect(col("ta"), col("tb"))).cast("double") /
            size(array_union(col("ta"), col("tb"))).cast("double"))
        .where(col("jaccard") >= Tau)
        .select(col("a"), col("b"), col("jaccard"))
        .orderBy(col("a"), col("b"))
    },
    Some("""WITH ts AS (SELECT doc_id,
          list_distinct(string_split(text, ' ')) AS ts FROM documents),
      tok AS (SELECT doc_id, len(ts) AS sz, unnest(ts) AS w FROM ts),
      freq AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
      pref AS (SELECT doc_id, w FROM (
          SELECT t.doc_id, t.w,
            ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY f.cnt, t.w) AS rn,
            t.sz - CEIL(0.9 * t.sz) + 1 AS k
          FROM tok t JOIN freq f USING (w))
        WHERE rn <= k),
      cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM pref x JOIN pref y ON x.w = y.w AND x.doc_id < y.doc_id)
      SELECT a, b,
        CAST(len(list_intersect(xa.ts, xb.ts)) AS DOUBLE) /
          len(list_distinct(list_concat(xa.ts, xb.ts))) AS jaccard
      FROM cand JOIN ts xa ON xa.doc_id = a JOIN ts xb ON xb.doc_id = b
      WHERE CAST(len(list_intersect(xa.ts, xb.ts)) AS DOUBLE) /
          len(list_distinct(list_concat(xa.ts, xb.ts))) >= 0.9
      ORDER BY a, b"""),
    // bench=false: prefix filtering's fan-out bound comes from Zipfian
    // vocabularies (real text: a doc's rarest tokens appear in few other
    // docs). The synthetic corpus draws tokens near-uniformly, so even
    // the rarest prefix tokens recur across whole duplicate families and
    // the candidate join loses its selectivity — same category as the
    // bounded Jaccard yardstick. The ALGORITHM is correct and verified;
    // this CORPUS breaks its cost model, not its answer.
    bench = false)

  /** EXACT containment join (the asymmetric cousin of
    * [[prefixJaccard]]): flag every document ≥ τ-CONTAINED in another —
    * C(A→B) = |A∩B| / |A| over distinct token sets. This is the
    * quote/aggregator/boilerplate-wrapper case MinHash misses
    * structurally: a 100-token doc embedded verbatim in a 10,000-token
    * page has Jaccard ≈ 0.01 (no band ever fires) but containment 1.0.
    *
    * Candidate generation is the DIRECTIONAL prefix filter: under the
    * rarest-first total token order, if C(A→B) ≥ τ then B must share
    * one of A's first ⌊(1−τ)·|A|⌋+1 tokens (pigeonhole — missing ALL of
    * them leaves |A\B| > (1−τ)·|A|, i.e. containment < τ). Only the
    * contained side prunes to a prefix; the container side joins with
    * its FULL token set (it has no small-prefix obligation — the
    * asymmetry is inherent to containment). Exact-verify on candidates,
    * then per-doc aggregation: container count, smallest container id,
    * best containment.
    *
    * Oracle = all-pairs containment in DuckDB: the prefix filter is
    * exact (superset of all qualifying pairs), so filtered-verified ==
    * all-pairs — the same proof obligation the LSH entries discharge by
    * their verify stage. Candidate generation runs CLASS-COLLAPSED
    * (see [[containmentOf]]): the round-9 version joined prefixes at
    * document level and the 8× replica tier ran past 14 minutes —
    * verbatim copies multiplied prefix fan-out quadratically; distinct
    * token sets don't replicate, so the collapsed join re-enters the
    * tier sweep. bench=false retained for [[prefixJaccard]]'s residual
    * reason: even class-level fan-out has no rare tokens to key on in
    * the 31-token uniform vocabulary (real Zipfian text gives the
    * prefix its selectivity; here the bound comes from the class count
    * alone). */
  val containment = QueryDef("dedup_containment",
    (s, d) => containmentOf(Tables.documents(s, d), 0.8),
    Some("""WITH ts AS (SELECT doc_id,
          list_distinct(string_split(text, ' ')) AS ts FROM documents),
      pairs AS (SELECT xa.doc_id AS a, xb.doc_id AS b,
          CAST(len(list_intersect(xa.ts, xb.ts)) AS DOUBLE) / len(xa.ts)
            AS containment
        FROM ts xa JOIN ts xb ON xa.doc_id <> xb.doc_id
        WHERE CAST(len(list_intersect(xa.ts, xb.ts)) AS DOUBLE) / len(xa.ts)
          >= 0.8)
      SELECT a AS doc_id, COUNT(*) AS n_containers,
        CAST(MIN(b) AS BIGINT) AS min_container,
        MAX(containment) AS containment
      FROM pairs GROUP BY a ORDER BY doc_id"""),
    bench = false)

  /** [[containment]]'s core over an arbitrary `(doc_id, text, ...)`
    * frame — the library entry point DedupSpec drives with authored
    * fixtures.
    *
    * CLASS-COLLAPSED for the fan-out bound (the `minhashClassEdges` /
    * `emb_knn_graph` / `mm_phash_neardup` discipline applied to the
    * prefix filter): containment C(A→B) is a function of the token-SET
    * pair alone, so documents with identical sets collapse to one
    * class (key = the sorted set, rep = min doc_id) and the directional
    * prefix join runs over DISTINCT sets only. That is the in-plan
    * bound the round-9 version lacked: a verbatim-duplicated corpus
    * (the case dedup exists for — and exactly what the keys-offset
    * replica tiers construct) multiplies DOCUMENTS per token without
    * adding CLASSES per token, so candidate volume tracks distinct
    * content while the member fan-back stays linear. Pigeonhole
    * exactness is untouched: the filter is still a superset argument
    * over each class's ⌊(1−τ)·sz⌋+1 rarest tokens (rarity measured in
    * CLASSES — the join's actual fan-out metric).
    *
    * Member fan-back, exact by case analysis: a member of class X with
    * |X| = c is contained (containment 1.0) in its c−1 verbatim
    * copies, plus every member of each qualifying class Y (count,
    * min-id = Y's rep, best containment aggregated per X). The only
    * per-member term is the min-container id when the member IS X's
    * rep — covered by X's precomputed second-smallest member id. */
  /** The directional prefix-filter candidate stage of [[containmentOf]],
    * exposed so the cost model is measurable in isolation
    * ([[graft.tools.ContainmentZipfSweep]] counts these against the
    * all-pairs bound on a power-law corpus): given the class relation
    * `(ts: sorted distinct tokens, rep: class id)`, emit every directed
    * class pair (a_rep, b_rep) that survives the pigeonhole prefix
    * filter — if C(A→B) ≥ τ, B shares one of A's ⌊(1−τ)·|A|⌋+1 rarest
    * tokens (rarity = class frequency) — plus the size filter
    * |B| ≥ ⌈τ·|A|⌉ that rides the join. A superset of all qualifying
    * pairs by construction (exactness is never delegated to it). */
  def containmentCandidates(classes: DataFrame, tau: Double): DataFrame = {
    val ctok = classes.select(col("rep"), size(col("ts")).as("sz"),
      explode(col("ts")).as("w"))
    val freq = ctok.groupBy(col("w")).agg(count(lit(1)).as("fcnt"))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("rep")).orderBy(col("fcnt"), col("w"))
    val pref = ctok.join(freq, "w")
      .withColumn("rn", row_number().over(wnd))
      .where(col("rn") <=
        col("sz") - ceil(lit(tau) * col("sz").cast("double")) + 1)
      .select(col("rep").as("a_rep"), col("sz").as("a_sz"), col("w"))
    // size filter rides the candidate join: C(A→B) ≥ τ needs
    // |B| ≥ |A∩B| ≥ τ·|A| — exactness-preserving, prunes before distinct
    pref
      .join(ctok.select(col("rep").as("b_rep"), col("sz").as("b_sz"),
        col("w")), "w")
      .where(col("a_rep") =!= col("b_rep") &&
        col("b_sz") >= ceil(lit(tau) * col("a_sz").cast("double")))
      .select(col("a_rep"), col("b_rep"))
      .distinct()
  }

  def containmentOf(docsIn: DataFrame, tau: Double): DataFrame = {
    graft.functions.HashExpressions.register(docsIn.sparkSession)
    val ts = docsIn
      .select(col("doc_id"),
        array_sort(array_distinct(tokens(col("text")))).as("ts"))
    // class assignment as ONE window over the set key (no groupBy +
    // join-back on the array column — the array equi-join dominated a
    // first cut of this collapse at the replica tiers), materialized
    // once for the six consumers below (ctok twice, cross twice,
    // members, min2); lazy localCheckpoint, RDD-owned blocks, no cache
    // entry (the minhashPairs discipline)
    val wTs = org.apache.spark.sql.expressions.Window.partitionBy(col("ts"))
    val classed = ts
      .withColumn("rep", min(col("doc_id")).over(wTs))
      .withColumn("cnt", count(lit(1)).over(wTs))
      .localCheckpoint(false)
    val members = classed.select(col("doc_id"), col("rep"), col("cnt"))
    val classes = classed.filter(col("doc_id") === col("rep"))
      .select(col("ts"), col("rep"), col("cnt"))
    // second-smallest member per class (null for singletons): the
    // same-class min-container when the contained member is the rep
    val min2 = members.filter(col("doc_id") =!= col("rep"))
      .groupBy(col("rep")).agg(min(col("doc_id")).as("min2"))
    val cand = containmentCandidates(classes, tau)
    // exact verify on class pairs, then per-contained-class rollup of
    // the cross-class containers
    val cross = cand
      .join(classes.select(col("rep").as("a_rep"), col("ts").as("ta")),
        "a_rep")
      .join(classes.select(col("rep").as("b_rep"), col("ts").as("tb"),
        col("cnt").as("b_cnt")), "b_rep")
      // merge-walk kernel over the sorted arrays — size(array_intersect)
      // builds a per-row hash set and materializes the intersection
      // array; at ~15 M verified class pairs that dominated the entry
      .withColumn("containment",
        expr("sorted_intersect_count(ta, tb)").cast("double") /
          size(col("ta")).cast("double"))
      .where(col("containment") >= tau)
      .groupBy(col("a_rep"))
      .agg(sum(col("b_cnt")).as("n_cross"), min(col("b_rep")).as("min_cross"),
        max(col("containment")).as("max_cross"))
      .select(col("a_rep").as("rep"), col("n_cross"), col("min_cross"),
        col("max_cross"))
    members
      .join(cross, Seq("rep"), "left")
      .join(min2, Seq("rep"), "left")
      .withColumn("same_min", when(col("cnt") < 2, lit(null).cast("long"))
        .otherwise(when(col("doc_id") === col("rep"), col("min2"))
          .otherwise(col("rep"))))
      .withColumn("n_containers",
        (col("cnt") - 1) + coalesce(col("n_cross"), lit(0L)))
      .where(col("n_containers") >= 1)
      .select(col("doc_id"),
        col("n_containers"),
        least(coalesce(col("same_min"), col("min_cross")),
          coalesce(col("min_cross"), col("same_min"))).as("min_container"),
        greatest(
          coalesce(when(col("cnt") >= 2, lit(1.0)), col("max_cross")),
          coalesce(col("max_cross"),
            when(col("cnt") >= 2, lit(1.0)))).as("containment"))
      .orderBy(col("doc_id"))
  }

  /** Edit-distance verification of the simhash candidate pairs — the
    * precision stage a fuzzy-dedup pipeline runs after signature
    * bucketing: signatures RECALL candidate pairs cheaply; a real string
    * metric then separates true near-dups from hash-collision neighbors
    * before anything gets dropped. Levenshtein runs only on the
    * candidate pairs (never all-pairs) and only on a 120-char prefix —
    * the standard cost bound, since edit distance is O(len²) per pair
    * and prefixes decide overwhelmingly for web-page boilerplate dups.
    * Spark's `levenshtein` and DuckDB's agree exactly (classic DP, ASCII
    * corpus), so the stage is hash-checkable end-to-end through the
    * signature pipeline AND the verifier. */
  val editVerify = QueryDef("dedup_edit_verify",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val pairs = simhash.fn(s, d).select(col("a"), col("b"))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 120).as("p"))
      pairs
        .join(docs.select(col("doc_id").as("a"), col("p").as("pa")), "a")
        .join(docs.select(col("doc_id").as("b"), col("p").as("pb")), "b")
        // sort BEFORE the DP projection: the range sort samples and
        // re-executes its child, so hanging the DP above the sort runs
        // every distance once instead of twice, and the sort spreads the
        // hot-document join skew across range partitions first
        .orderBy(col("a"), col("b"))
        // native byte-DP expression: Spark's builtin levenshtein resolves
        // per-codepoint (not O(1) on UTF8String) — measured 42 s vs ~1 s
        // of raw DP on this workload at sf0.1; byte DP is exact on the
        // ASCII corpus
        .withColumn("edit", expr("edit_dist(pa, pb)"))
        .select(col("a"), col("b"), col("edit"),
          when(col("edit") <= 24, 1).otherwise(0).as("is_dup"))
    },
    Some("""WITH th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(w,''), c -> CAST(unicode(c) AS BIGINT))),
          (h,c) -> (h*31+c) % 1000000007) AS h
        FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)),
      bits AS (SELECT doc_id, i,
          CASE WHEN 2*SUM((h // (1::BIGINT << i)) % 2) >= COUNT(*)
            THEN (1::BIGINT << i) ELSE 0 END AS b
        FROM th, range(0,32) r(i) GROUP BY doc_id, i),
      sigs AS (SELECT doc_id, SUM(b) AS simhash FROM bits GROUP BY doc_id),
      pairs AS (SELECT x.doc_id AS a, y.doc_id AS b
        FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= 1),
      pre AS (SELECT doc_id, substr(text, 1, 120) AS p FROM documents)
      SELECT a, b, CAST(levenshtein(pa.p, pb.p) AS INT) AS edit,
        CASE WHEN levenshtein(pa.p, pb.p) <= 24 THEN 1 ELSE 0 END AS is_dup
      FROM pairs JOIN pre pa ON pa.doc_id = a JOIN pre pb ON pb.doc_id = b
      ORDER BY a, b"""))

  /** Naive all-pairs n-gram Jaccard (the baseline LSH replaces; kept
    * oracle-checked and bounded). */
  val ngramJaccard = QueryDef("dedup_ngram_jaccard",
    (s, d) => {
      // the quadratic baseline is deterministically bounded — at any scale
      // factor the yardstick compares the same 1000-doc prefix; the LSH
      // variant is the unbounded path
      val sets = shingleSets(s, d).filter(col("doc_id") < 1000)
      sets.alias("x").join(sets.alias("y"), col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.ss").as("a_ss"), col("y.ss").as("b_ss"))
        .withColumn("jaccard", jaccardExpr)
        .filter(col("jaccard") >= 0.5)
        .select(col("a"), col("b"), col("jaccard"))
        .orderBy(col("a"), col("b"))
    },
    Some("""WITH sets AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
          j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2])) AS ss
        FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents
          WHERE doc_id < 1000)
        WHERE len(t) >= 3)
      SELECT x.doc_id AS a, y.doc_id AS b,
        CAST(len(list_intersect(x.ss, y.ss)) AS DOUBLE) /
          (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) AS jaccard
      FROM sets x JOIN sets y ON x.doc_id < y.doc_id
      WHERE CAST(len(list_intersect(x.ss, y.ss)) AS DOUBLE) /
          (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) >= 0.5
      ORDER BY a, b"""),
    bench = false)

  /** Shared pair builder for the two embedding near-dup variants: cosine
    * ≥ 0.4 pairs, with candidate generation controlled by `bucketed`
    * (false = exact all-pairs yardstick; true = same-LSH-bucket equi-join,
    * the scale path). One definition each for the Spark plan and the
    * DuckDB oracle, so the cosine convention and threshold cannot drift
    * between the variants. Dot products run through the native codegen
    * DotProductF32 expression — same left-to-right double fold as the
    * oracle, ~an order of magnitude faster than the higher-order form. */
  private def embeddingPairs(s: SparkSession, d: String,
      bucketed: Boolean): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val base0 = Tables.embeddings(s, d)
      .withColumn("nrm", expr("sqrt(dot_f64(embedding, embedding))"))
    // the exact all-pairs yardstick is deterministically bounded (same
    // 1000-vector prefix at any scale factor) exactly like
    // dedup_ngram_jaccard; the LSH variant is the unbounded scale path
    val base = if (bucketed) base0 else base0.filter(col("vec_id") < 1000)
    val e = if (bucketed) base.withColumn("bucket", expr(Similarity.bucketExpr))
      else base
    val cond =
      if (bucketed) col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") < col("y.vec_id")
      else col("x.vec_id") < col("y.vec_id")
    e.alias("x").join(e.alias("y"), cond)
      .withColumn("dot", expr("dot_f64(x.embedding, y.embedding)"))
      .withColumn("cosine", col("dot") / (col("x.nrm") * col("y.nrm")))
      .filter(col("cosine") >= 0.4)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"), col("cosine"))
      .orderBy(col("a"), col("b"))
  }

  private def embeddingPairsSql(bucketed: Boolean): String = {
    val bucketCol =
      if (bucketed) s",\n        ${Similarity.bucketSqlDuck("embedding")} AS bucket"
      else ""
    val joinCond =
      if (bucketed) "x.bucket = y.bucket AND x.vec_id < y.vec_id"
      else "x.vec_id < y.vec_id"
    val prefix = if (bucketed) "" else " WHERE vec_id < 1000"
    s"""WITH e AS (SELECT vec_id, embedding,
        sqrt(list_sum(list_transform(embedding,
          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm$bucketCol
        FROM embeddings$prefix)
      SELECT x.vec_id AS a, y.vec_id AS b,
        list_sum(list_transform(range(1, len(x.embedding)+1),
          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
          / (x.nrm * y.nrm) AS cosine
      FROM e x JOIN e y ON $joinCond
      WHERE list_sum(list_transform(range(1, len(x.embedding)+1),
          i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
          / (x.nrm * y.nrm) >= 0.4
      ORDER BY a, b"""
  }

  /** Embedding near-dup: exact double-precision cosine ≥ 0.4 pairs — the
    * all-pairs correctness yardstick, bounded to a fixed prefix and kept
    * out of the bench headline set (it is O(n²) by definition); the LSH
    * variant below is the benchmarked scale path. */
  val embeddingNearDup = QueryDef("dedup_embedding_cosine",
    (s, d) => embeddingPairs(s, d, bucketed = false),
    Some(embeddingPairsSql(bucketed = false)),
    bench = false)

  /** LSH-bucketed embedding near-dup — the scale path for
    * [[embeddingNearDup]]'s all-pairs yardstick: candidate pairs come only
    * from same-hyperplane-bucket equi-joins (deterministic hyperplanes, so
    * oracle-checked; recall vs the exact variant is inherent to the 6-bit
    * bucketing, exactly as in web-scale near-dup pipelines). */
  val embeddingNearDupLsh = QueryDef("dedup_embedding_lsh",
    (s, d) => embeddingPairs(s, d, bucketed = true),
    Some(embeddingPairsSql(bucketed = true)))
}
