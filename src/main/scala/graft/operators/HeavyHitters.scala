package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.tokens

/** Exact heavy hitters via Misra–Gries candidate pruning — "which tokens
  * exceed 1/32 of the whole corpus" answered in two passes, neither of
  * which shuffles the token stream:
  *
  *   1. Per-partition Misra–Gries summaries (capacity K counters each,
  *      constant memory, pure `mapPartitions` — no shuffle). The union of
  *      the partition summaries is a GUARANTEED superset of every token
  *      with true frequency > n/(K+1): inside one partition MG only
  *      drops a token after cancelling it against K others, so a counter
  *      survives with count ≥ true_in_partition − part_n/(K+1); summed
  *      over partitions the deficit stays < n/(K+1). The summaries are
  *      tiny (P × K rows — 64 k rows even at 1000 executors), so they
  *      collect to the driver like any aggregate final stage.
  *   2. Exact recount of ONLY the candidate tokens: a broadcast
  *      left-semi join against the candidate relation filters the token
  *      stream (plan size stays O(1) — no P×K `IN` literal), the
  *      survivors hash-aggregate, and those above the threshold are
  *      kept. With threshold n/32 > n/(K+1) (K=64), step 1's superset
  *      guarantee makes the final answer EXACT.
  *
  * The naive single-pass alternative — groupBy(token).count() — shuffles
  * every distinct token; at 100 TB that's the full vocabulary (billions
  * of keys) moved across the cluster to answer a question about ~32
  * tokens. The MG plan moves P×K counters.
  *
  * The per-partition summary content depends on partitioning and
  * iteration order, but the FINAL output does not (any superset of the
  * true heavy hitters recounts to the same exact answer), so the entry
  * is hash-checkable against a straightforward exact-SQL oracle.
  */
object HeavyHitters {

  /** MG capacity: guarantees capture of every token above n/65 of the
    * corpus; the query threshold n/32 sits safely above that. */
  val K = 64

  def all: Seq[QueryDef] = Seq(heavyHitters)

  /** Misra–Gries fold INTO existing counters (at most `k` survive) —
    * incremental by design, which is what lets the streaming surface
    * ([[graft.streaming.DocStreams.heavyHitterCandidates]]) carry the
    * same counters across microbatches as GroupState. */
  def mgFold(counters: scala.collection.mutable.HashMap[String, Long],
      it: Iterator[String], k: Int = K): Unit =
    it.foreach { tok =>
      if (counters.contains(tok)) counters(tok) += 1
      else if (counters.size < k) counters(tok) = 1
      else {
        // decrement-all: cancel this token against one of each counter
        val dead = List.newBuilder[String]
        counters.mapValuesInPlace((_, v) => v - 1)
        counters.foreach { case (t, v) => if (v <= 0) dead += t }
        dead.result().foreach(counters.remove)
      }
    }

  /** Misra–Gries over one iterator: at most [[K]] surviving counters. */
  def mgSummary(it: Iterator[String]): Map[String, Long] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    mgFold(counters, it)
    counters.toMap
  }

  /** WEIGHTED Misra–Gries fold — the generalization that lets the
    * streaming shard sketch consume PRE-AGGREGATED `(token, count)`
    * entries instead of raw occurrences (the r12 512×-tier fix: the
    * shard shuffle then carries ~|vocab| weighted rows, not the full
    * token stream). Same guarantee as [[mgFold]]: every decrement round
    * cancels `d` units against each of the k counters AND `d` units of
    * the incoming weight — d·(k+1) weight per round — so total cancelled
    * weight ≤ n/(k+1) and any token with true frequency above that
    * bound survives. `mgFold(it)` ≡ `mgFoldWeighted(it.map(_ -> 1))`. */
  def mgFoldWeighted(counters: scala.collection.mutable.HashMap[String, Long],
      it: Iterator[(String, Long)], k: Int = K): Unit =
    it.foreach { case (tok, w0) =>
      var w = w0
      if (counters.contains(tok)) { counters(tok) += w; w = 0L }
      while (w > 0L) {
        if (counters.size < k) { counters(tok) = w; w = 0L }
        else {
          val d = math.min(counters.values.min, w)
          counters.mapValuesInPlace((_, v) => v - d)
          counters.filterInPlace((_, v) => v > 0L)
          w -= d
        }
      }
    }

  /** Per-chunk token counts with BOUNDED memory: consume up to
    * `chunkTokens` tokens into a local hash map, emit its entries, and
    * repeat — a hand-rolled streaming-legal partial aggregation (a real
    * `groupBy` before `mapGroupsWithState` is an unsupported streaming
    * plan, and an unbounded per-partition map would be vocabulary-sized).
    * Map size is ≤ min(chunkTokens, partition vocab) entries.
    *
    * MEMORY ENVELOPE (r13 advice): the bound is in TOKENS, so the
    * worst case — every token in a chunk distinct — is a 2^22-entry
    * String map (~a few hundred MB), and with P partitions in flight
    * the transient total is P× that. That worst case requires
    * per-partition vocabulary ≈ chunk size; on the 1.3 B-token 512×
    * tier the measured per-partition distinct count stays orders of
    * magnitude below the cap (natural-text vocabulary grows ~√tokens —
    * Heaps' law), which is why the default holds there. A caller
    * streaming adversarially-unique tokens (ids, hashes) should pass a
    * smaller `chunkTokens` — the knob exists for exactly that. */
  def chunkedCounts(it: Iterator[String],
      chunkTokens: Int = 1 << 22): Iterator[(String, Long)] =
    new Iterator[(String, Long)] {
      private var out: Iterator[(String, Long)] = Iterator.empty
      private def refill(): Unit = {
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        var n = 0
        while (it.hasNext && n < chunkTokens) {
          val t = it.next()
          m.update(t, m.getOrElse(t, 0L) + 1L)
          n += 1
        }
        out = m.iterator
      }
      def hasNext: Boolean = {
        while (!out.hasNext && it.hasNext) refill()
        out.hasNext
      }
      def next(): (String, Long) = {
        if (!hasNext) throw new NoSuchElementException
        out.next()
      }
    }

  /** Candidate tokens: union of per-partition MG summaries (superset of
    * all tokens with frequency > n/(K+1)) — kept as a relation, never
    * collected. At 1000 executors the P×K candidate set is ~64 k tokens;
    * embedded as an `IN` literal that bloats every serialized plan, while
    * a broadcast left-semi join keeps plan size O(1) with the identical
    * result. */
  def candidateFrame(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(explode(tokens(col("text"))).as("tok")).as[String]
      .mapPartitions(it => mgSummary(it).keysIterator)
      .toDF("tok").distinct()
  }

  val heavyHitters = QueryDef("text_heavy_hitters",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val cand = candidateFrame(s, docs)
      val toks = docs.select(explode(tokens(col("text"))).as("tok"))
      val total = toks.agg(count(lit(1)).as("n"))
      toks.join(broadcast(cand), Seq("tok"), "left_semi")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .where(col("cnt") * 32 > col("n"))
        .select(col("tok"), col("cnt"),
          (col("cnt").cast("double") / col("n").cast("double")).as("share"))
        .orderBy(col("cnt").desc, col("tok"))
    },
    Some("""WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      tot AS (SELECT COUNT(*) AS n FROM toks)
      SELECT tok, COUNT(*) AS cnt,
        CAST(COUNT(*) AS DOUBLE) / CAST(ANY_VALUE(n) AS DOUBLE) AS share
      FROM toks CROSS JOIN tot
      GROUP BY tok HAVING COUNT(*) * 32 > ANY_VALUE(n)
      ORDER BY cnt DESC, tok"""))
}
