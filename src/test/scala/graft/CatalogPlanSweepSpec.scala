package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Catalog-wide plan invariants, asserted over EVERY entry rather than the
  * per-query spot guards in PlanShapeSpec:
  *
  *   1. every catalog entry analyzes and physical-plans successfully at
  *      sf0.001 (a refactor that breaks analysis for an un-spot-checked
  *      query fails here, not in the driver's correctness gate), and
  *   2. no plan contains a CartesianProduct — the both-sides-large
  *      quadratic join that kills any 100 TB run — except the two
  *      declared bounded yardsticks. (BroadcastNestedLoopJoin is NOT
  *      banned globally: a cross join against a broadcast single-row
  *      aggregate is the standard way to attach a global denominator.)
  *   3. no plan contains an UNDECLARED unpartitioned window. An empty
  *      partitionSpec over a full base table is a single-task sort
  *      waiting to happen at 100 TB — exactly the bug class q37_ntile
  *      shipped with until round 5; this bans it forever. The
  *      `serialWindowsByConstruction` allowlist names every entry whose
  *      unpartitioned window is provably bounded (tiny bucket/offset
  *      relations, calendar-bounded series, literal-SQL demo) — a new
  *      entry reaching this list is a deliberate reviewed act, not an
  *      accident. (A constant partition key cannot express the intent
  *      in-plan: Spark's EliminateWindowPartitions strips foldable
  *      keys, so the allowlist lives here instead.)
  *
  * Entries whose `fn` eagerly runs driver-side supersteps or writes files
  * are skipped to keep the sweep seconds-fast; each of those has its own
  * dedicated spec (BpeSpec, ShortestPathSpec, MixtureGraphSpec, the sink
  * tests in PlanShapeSpec/SourcesSpec).
  */
class CatalogPlanSweepSpec extends SparkSpec {

  private val eagerOrWriting = Set(
    "text_bpe_vocab", "text_bpe_encode",      // driver merge loop
    "text_bpe_bytes",                          // driver merge loop (bytes)
    "sssp_synthetic",                          // hybrid local solve
    "graph_kcore",                             // driver fixpoint loop
    "graph_mis",                               // driver fixpoint loop
    "graph_tree_closure",                      // driver doubling loop
    "emb_power_iteration",                     // superstep collects
    "ev_markov_steady",                        // driver chain iteration
                                               // (≤|types|² state)
    "sim_ann_ivf_trained",                     // Lloyd rounds
    "text_quality_train",                      // GD superstep loop
    "eval_kappa",                              // composes the GD trainer
    "text_heavy_hitters",                      // candidate pass collects
    "sink_bucketed_roundtrip", "sink_range_layout", "sink_zorder_layout",
    "sink_compaction", "sink_partition_overwrite",
    "source_csv_roundtrip", "source_json_roundtrip",
    "source_orc_roundtrip", "source_schema_evolution",
    "dedup_incremental_stored",
    "components_incremental_stored",
    "dedup_substring_stored",
    "emb_ivfpq_stored",
    "emb_spectral_stored") // file writes

  private val quadraticYardsticks = Set(
    "dedup_ngram_jaccard", "dedup_embedding_cosine",
    // the banding-recall eval CONTAINS the bounded ngram yardstick plan
    "eval_dedup_recall")

  /** Entries whose unpartitioned windows are serial BY CONSTRUCTION:
    * `Quantiles.valueAtRanks` bucket offsets (stat_mad chains two
    * selections + a deviation pass, stat_winsorized one) — windows over
    * the ~B-row bucket relation, never the data; `pack_sequences`' level-2
    * offsets over its ≤ P-row (shuffle-parallelism-bounded) bucket
    * relation; `q42_moving_range`'s frame
    * over calendar-bounded daily aggregates; `sql_text_surface`'s rank
    * over a 25-nation aggregate (its SQL text must stay char-identical in
    * both engines, so no Spark-side rewrite is possible). */
  private val serialWindowsByConstruction = Set(
    "stat_mad", "stat_winsorized", "pack_sequences",
    // nine decile edges from one valueAtRanks pass: same ~B-row bucket
    // relation windows as stat_mad/stat_winsorized
    "stat_equidepth_histogram",
    // full-CDF materialization: the serial window crosses only the
    // bucket-offset relation; per-value cumsums are bucket-partitioned
    "stat_rank_normalize",
    // weighted selection over the same machinery: serial window only on
    // the bucket-offset relation, per-value cumulative WEIGHTS
    // bucket-partitioned
    "stat_weighted_median",
    // growth-curve running sum over the calendar-bounded day spine
    // (~30 rows) — the q42_moving_range class
    "ev_cumulative_users",
    // the e2e pipeline ends in the same packCounts level-2 offsets
    // (≤ P-row bucket relation)
    "pipeline_curation_e2e",
    "q42_moving_range", "sql_text_surface",
    // rank windows run over the LIMIT-50 candidate relations (each leg is
    // a TakeOrderedAndProject top-Nc first; ≤ 2·Nc rows at any scale)
    "retrieval_hybrid_rrf",
    // cumulative-CDF window runs over the DISTINCT-value relation
    // (≤ 50 discrete quantities at any corpus size)
    "stat_ks_test",
    // same distinct-value cumulative-rank window as stat_ks_test
    "stat_mann_whitney",
    // Gini: the serial window crosses only the ~#buckets-row
    // bucket-offset relation (the stat_rank_normalize machinery);
    // per-value exclusive cumsums are bucket-partitioned
    "stat_gini",
    // rank window over the LIMIT-100 top-words relation
    // (TakeOrderedAndProject first — bounded at any corpus size)
    "text_zipf_fit",
    // conversion-latency order statistics via valueAtRanks: serial
    // window only on the ~#buckets offset relation (stat_mad machinery)
    "ev_funnel_latency",
    // AUC midranks via the same two-level prefix sum: serial window
    // crosses only the bucket-offset relation; per-value cumulative
    // counts are bucket-partitioned
    "eval_auc",
    // Lorenz deciles: the only serial window is valueAtRanks' bucket
    // offsets over the per-user-spend bucket relation
    "ev_lorenz_users",
    // KM risk-set cumsum over the age relation — ≤ KmHorizon+1 rows
    // BY CONSTRUCTION (ages are clamped to the fixed follow-up window)
    "ev_survival_km",
    // t-closeness global CDF: the serial window crosses only the
    // ≤|sensitive-values| global-distribution relation; per-group
    // cumsums are quasi-id-partitioned
    "curate_t_closeness")

  /** Reviewed bounds for HINTED broadcasts that do NOT carry an in-plan
    * boundedness witness (local relation, limit, global aggregate, range,
    * or fixed-cardinality table): entry name → substrings matching the
    * broadcast descriptor, each with the reviewed reason the relation
    * stays small at ANY corpus size. A new data-scaled hinted broadcast
    * fails the sweep until it is bounded here — a deliberate reviewed
    * act, like the serial-window list. (Vocabulary-sized relations —
    * tf-idf document frequencies, LM count tables, prefix-filter token
    * frequencies — are deliberately NOT here: round 6 removed their
    * hints so AQE's runtime stats broadcast them only while they are
    * actually small.) */
  private val boundedBroadcastsByReview: Map[String, Seq[String]] = Map(
    // Misra–Gries candidate relation: ≤ shards·K rows at ANY corpus size
    // (each shard's GroupState holds at most K counters — the sketch
    // never grows; StreamingSpec pins the state-size bound)
    "stream_heavy_hitters" -> Seq("agg[tok]<-[documents]"),
    // t-closeness global sensitive-value distribution: one row per
    // DISTINCT source — the sensitive-attribute domain, a fixed small
    // set by the k-anon/l-div quasi-id design, never corpus-scaled
    "curate_t_closeness" -> Seq("agg[source]<-[documents]"),
    // unigram-LM piece/cost tables: single chars (alphabet-bounded) ∪
    // LIMIT-SeedPieces/TargetPieces multi-char pieces — ≤ ~80 rows by
    // construction at any corpus size (the union's char side hides the
    // limit witness from the walk)
    "text_unigram_vocab" -> Seq("agg[piece]<-[documents]"),
    "text_unigram_encode" -> Seq("agg[piece]<-[documents]"),
    // KM hazard factors: one row per EVENT age, ages clamped to the
    // fixed KmHorizon-day follow-up → ≤ HORIZON+1 rows by construction
    "ev_survival_km" -> Seq("agg[t]<-[events]"),
    // K centroid seeds: `vec_id < K` key-range filter, K fixed
    "emb_kmeans_assign" -> Seq("agg[-]<-[embeddings]"),
    // same K-seed centroid broadcast, rank-2 instead of rank-1
    "emb_silhouette" -> Seq("agg[-]<-[embeddings]"),
    // same K-seed centroid broadcast for the SemDeDup assignment step
    "dedup_semantic" -> Seq("agg[-]<-[embeddings]"),
    // same K-seed centroid broadcast quantizing both drift snapshots
    "emb_drift_psi" -> Seq("agg[-]<-[embeddings]"),
    // 4×8-entry PQ codebook and the 32-row query-ADC table: both bounded
    // by `vec_id < 8` / `vec_id = 0` key filters over the seed prefix
    "emb_pq_topk" -> Seq("agg[-]<-[embeddings]"),
    // trained twin: the remaining embeddings-scanning broadcasts are the
    // one-row query vector (`vec_id = 0`) and the query-ADC table (same
    // filter × the M·K driver-local codebook) — the learned codebook
    // itself is a LocalTableScan, bounded by construction
    "emb_pq_topk_trained" -> Seq("agg[-]<-[embeddings]"),
    // IVF-PQ: coarse centroids (vec_id < 8), residual codebook seeds
    // (vec_id < 32), the per-probe ADC table, and the one-row query —
    // each a key-range filter over the seed prefix or derived from one;
    // the shortlist carries an explicit LIMIT
    "emb_ivfpq_topk" -> Seq("agg[-]<-[embeddings]"),
    // query-term document frequencies: ≤ |q| rows by the literal IN
    // filter on the fixed 3-term query — bounded at any corpus size
    "text_bm25" -> Seq("agg[w]<-[documents]"),
    // RRF sparse leg inherits text_bm25's ≤|q|-row df broadcast; the
    // dense leg broadcasts the 1-row query vector (`vec_id = 0` key
    // filter over embeddings); the fused join sides both carry explicit
    // LIMIT-50s
    "retrieval_hybrid_rrf" -> Seq("agg[w]<-[documents]",
      "agg[-]<-[documents]", "agg[doc_id]<-[documents]",
      "agg[-]<-[embeddings]"),
    // 20-query probe set (`vec_id < 20`), and for IVF the K-cell
    // centroid sample plus 20×nprobe probe assignments
    "sim_topk_bruteforce" -> Seq("agg[-]<-[embeddings]"),
    // NDCG eval: the 5-query exact-leg cross join (`vec_id < 5` key
    // filter — the sim_topk_bruteforce shape) and the 5×35-row LSH
    // probe set derived from the same filtered relation
    "eval_ndcg" -> Seq("agg[-]<-[embeddings]"),
    // MRR/recall eval shares eval_ndcg's two legs: the 5-query exact
    // cross join (`vec_id < 5` key filter) and the derived probe set
    "eval_mrr" -> Seq("agg[-]<-[embeddings]"),
    "sim_topk_quantized" -> Seq("agg[-]<-[embeddings]"),
    // 5-query probe set (`vec_id < 5` key filter) — the bruteforce shape
    // with two packed sign words riding along
    "sim_topk_binary" -> Seq("agg[-]<-[embeddings]"),
    "sim_topk_matryoshka" -> Seq("agg[-]<-[embeddings]"),
    // k-row seed-centroid broadcast (`vec_id < 8` key filter)
    "curate_cluster_balanced" -> Seq("agg[-]<-[embeddings]"),
    // every MMR-round broadcast descends from the LIMIT-20 shortlist
    // (lazily checkpointed → the sweep sees an empty-source LogicalRDD,
    // hence no in-plan witness), the 1-row query vector, or the ≤5-row
    // selected set — all bounded by the shortlist LIMIT by construction
    "retrieval_mmr_rerank" -> Seq("agg[-]<-[]", "agg[-]<-[embeddings]"),
    "sim_ann_lsh" -> Seq("agg[-]<-[embeddings]"),
    "sim_ann_ivf" -> Seq("agg[-]<-[embeddings]"),
    // calendar-bounded minute-bucket grid (distinct minutes of the span)
    "ev_range_join" -> Seq("agg[_groupingexpression]<-[events]"),
    // LOCF carry offsets: one row per (series × hour bucket) — series set
    // is the declared few-fat-series shape, hours are calendar-bounded
    "ev_resample_locf_fat" -> Seq("agg[event_type,bkt]<-[events]"),
    // bucket offsets: ≤ P rows, P = cluster parallelism by construction
    "pack_sequences" -> Seq("agg[bucket]<-[documents]"),
    // same packCounts bucket-offset broadcast at the e2e pipeline's tail
    "pipeline_curation_e2e" -> Seq("agg[bucket]<-[documents]"),
    // iterative-narrowing state: ≤ 2 rows per (group × active rank)
    "q23_percentiles" -> Seq("agg["),
    // Quantiles bucket-offset relation: B fixed buckets
    "stat_mad" -> Seq("agg[bkt]<-[lineitem]"),
    "stat_winsorized" -> Seq("agg[bkt]<-[lineitem]"),
    // Gini bucket-offset relation: ~#buckets rows (value-range bounded);
    // the totals broadcast is a global aggregate (bounded witness)
    "stat_gini" -> Seq("agg[bkt]<-[orders]"),
    "stat_equidepth_histogram" -> Seq("agg[bkt]<-[lineitem]"),
    "stat_rank_normalize" -> Seq("agg[bkt]<-[lineitem]"),
    // AUC midrank machinery: same Quantiles bucket-offset relation —
    // ~(score range / 0.01) buckets over the [0, ~1.05] quality score
    "eval_auc" -> Seq("agg[bkt]<-[documents]"),
    // isotonic recalibration: every broadcast is the ≤10-row fixed-width
    // score-bin relation or a ≤55-row contiguous-run relation derived
    // from it (bins are value-range bounded: score ∈ [0, ~1.05] → 10
    // bins by construction at any corpus size)
    "eval_recalibrated" -> Seq("agg[bin]<-[documents]",
      "agg[j,k]<-[documents]"),
    // the per-document consumer broadcasts the same ≤10-row bin map
    // (and the run relations inside it) back onto the documents scan
    "curate_keep_calibrated" -> Seq("agg[bin]<-[documents]",
      "agg[j,k]<-[documents]"),
    // conversion-latency selection: bucket offsets over the 1e10-µs-wide
    // latency buckets (range-bounded by the corpus time span)
    "ev_funnel_latency" -> Seq("agg[bkt]<-[events]"),
    // Lorenz deciles: valueAtRanks bucket offsets over per-user spend
    // (value-range bounded at width 100)
    "ev_lorenz_users" -> Seq("agg[bkt]<-[events]"),
    "stat_weighted_median" -> Seq("agg[bkt]<-[lineitem]", "agg[-]<-[lineitem]"),
    // grouped twin: offsets are (groups × buckets)-bounded, totals
    // groups-bounded (returnflag cardinality 3)
    "stat_weighted_median_grouped" ->
      Seq("agg[g,bkt]<-[lineitem]", "agg[g]<-[lineitem]"),
    // ntile bucket counts/offsets: B fixed buckets
    "q37_ntile" -> Seq("agg[bkt]<-[customer]"),
    // language signature profile: rank ≤ 10 filter keeps ≤ 10 words per
    // language, language set is ISO-code bounded, not corpus-scaled
    // (the topmost agg the walk sees is the lang×w count feeding the
    // rank window); langs = distinct of that profile
    "text_langid" -> Seq("agg[lang,w]<-[documents]",
      "agg[sig_lang]<-[documents]", "agg[-]<-[]"),
    // the confusion-matrix eval reuses text_langid's plan verbatim —
    // same rank-≤10 signature profile and ISO-bounded language set
    "eval_langid_confusion" -> Seq("agg[lang,w]<-[documents]",
      "agg[sig_lang]<-[documents]", "agg[-]<-[]"))

  test("every BroadcastExchange in every catalog plan is bounded by construction or by review") {
    import org.apache.spark.sql.execution.{SparkPlan, FileSourceScanExec,
      LocalTableScanExec, GlobalLimitExec, LocalLimitExec,
      TakeOrderedAndProjectExec, RangeExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
      ReusedExchangeExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
      ObjectHashAggregateExec, SortAggregateExec}
    // region (5 rows) and nation (25) have FIXED cardinality at every
    // scale factor — broadcasting them is bounded by construction
    val fixedCardTables = Set("region", "nation")
    def tableName(f: FileSourceScanExec): String =
      f.relation.location.rootPaths.headOption
        .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
    def describe(b: SparkPlan): (String, Boolean) = {
      var hasLocal = false
      var hasLimit = false
      val tables = scala.collection.mutable.SortedSet.empty[String]
      var aggKeys: Option[Seq[String]] = None
      var globalAgg = false
      def walk(p: SparkPlan): Unit = {
        p match {
          // driver-built local relations and literal ranges are bounded
          // by construction
          case _: LocalTableScanExec | _: RangeExec => hasLocal = true
          case _: GlobalLimitExec | _: LocalLimitExec |
              _: TakeOrderedAndProjectExec => hasLimit = true
          case f: FileSourceScanExec => tables += tableName(f)
          case r: ReusedExchangeExec => walk(r.child)
          case a: HashAggregateExec if aggKeys.isEmpty =>
            aggKeys = Some(a.groupingExpressions.map(_.name))
            globalAgg = a.groupingExpressions.isEmpty
          case a: ObjectHashAggregateExec if aggKeys.isEmpty =>
            aggKeys = Some(a.groupingExpressions.map(_.name))
            globalAgg = a.groupingExpressions.isEmpty
          case a: SortAggregateExec if aggKeys.isEmpty =>
            aggKeys = Some(a.groupingExpressions.map(_.name))
            globalAgg = a.groupingExpressions.isEmpty
          case _ =>
        }
        p.children.foreach(walk)
        p.subqueries.foreach(walk)
      }
      walk(b)
      val desc = s"agg[${aggKeys.map(_.mkString(",")).getOrElse("-")}]" +
        s"<-[${tables.mkString(",")}]"
      // bounded witnesses: a driver-local/range relation, an explicit
      // limit, a topmost GLOBAL aggregate (exactly one row), or leaves
      // drawn only from fixed-cardinality tables
      val bounded = hasLocal || hasLimit || globalAgg ||
        (tables.nonEmpty && tables.forall(fixedCardTables))
      (desc, bounded)
    }
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    var found = 0
    // exchanges are inserted by the plan preparations (EnsureRequirements),
    // which AQE hides inside AdaptiveSparkPlanExec until execution —
    // disable it so executedPlan is the fully-prepared static plan. Also
    // disable stats-based auto-broadcast: a small-at-this-SF relation that
    // auto-broadcasts at sf0.001 correctly stops broadcasting at 100 TB,
    // so it is not a scale hazard — the broadcasts that must be bounded
    // are the ones FORCED by an explicit broadcast() hint, which survive
    // at any scale. Threshold -1 leaves exactly those in the plan.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.queries.Registry.all
        .filterNot(q => eagerOrWriting(q.name))
        .foreach { q =>
          try {
            val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan
            val broadcasts = plan.collect { case b: BroadcastExchangeExec => b }
            found += broadcasts.size
            broadcasts.foreach { b =>
              val (desc, bounded) = describe(b)
              val reviewed = boundedBroadcastsByReview.getOrElse(q.name, Nil)
                .exists(desc.contains)
              if (!bounded && !reviewed)
                failures += s"${q.name}: unbounded broadcast $desc"
            }
          } catch {
            case e: Throwable =>
              failures += s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage}"
          }
        }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
    info(s"$found broadcast exchanges enumerated across the catalog")
    assert(found > 0, "sweep found no broadcasts — plan walk is broken")
    assert(failures.isEmpty,
      s"${failures.size} unbounded broadcast(s):\n${failures.mkString("\n")}")
  }

  test("every catalog entry plans; no CartesianProduct outside the declared yardsticks") {
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    graft.queries.Registry.all
      .filterNot(q => eagerOrWriting(q.name))
      .foreach { q =>
        try {
          val df = q.fn(spark, sf("sf0.001"))
          val plan = df.queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.toString
            case p => p.toString
          }
          if (plan.contains("CartesianProduct") && !quadraticYardsticks(q.name))
            failures += s"${q.name}: CartesianProduct in plan"
          val bareWindows = df.queryExecution.optimizedPlan.collect {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window
                if w.partitionSpec.isEmpty => w
            case g: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
                if g.partitionSpec.isEmpty => g
          }
          if (bareWindows.nonEmpty && !serialWindowsByConstruction(q.name))
            failures += s"${q.name}: ${bareWindows.size} unpartitioned window(s)"
        } catch {
          case e: Throwable => failures += s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage}"
        }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Entries whose slice-after-collect is reviewed bounded (the collected
    * group is per-doc / per-basket / LIMIT-bounded, never corpus-scaled).
    * Empty today: `text_inverted_index` — the one offender this guard was
    * written for (r12 verdict #1) — now rank-filters to ≤ 20 postings per
    * word BEFORE collecting. */
  private val boundedSliceAfterCollect = Set.empty[String]

  test("no plan slices a collect_list/collect_set result (truncate-before-collect)") {
    // slicing AFTER collect_list means the full group was buffered in one
    // aggregation buffer and then thrown away — for a data-scaled group
    // (a stopword's postings, a hub node's neighbors) that buffer is
    // corpus-sized. The scale-correct spelling is a per-group rank filter
    // (WindowGroupLimit) BEFORE the collect, so the buffer is bounded by
    // the rank cap. This sweep bans the anti-pattern catalog-wide.
    import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, Slice}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, CollectSet}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    graft.queries.Registry.all
      .filterNot(q => eagerOrWriting(q.name))
      .filterNot(q => boundedSliceAfterCollect(q.name))
      .foreach { q =>
        try {
          val plan = q.fn(spark, sf("sf0.001")).queryExecution.optimizedPlan
          // attributes whose value is (derived from) a collect_list /
          // collect_set result, propagated through Project aliases
          var derived = Set.empty[ExprId]
          plan.foreachUp {
            case a: Aggregate =>
              a.aggregateExpressions.foreach {
                case al: Alias if al.child.exists(e =>
                    e.isInstanceOf[CollectList] || e.isInstanceOf[CollectSet]) =>
                  derived += al.exprId
                case _ =>
              }
            case p: Project =>
              p.projectList.foreach {
                case al: Alias
                    if al.child.references.exists(r => derived(r.exprId)) =>
                  derived += al.exprId
                case _ =>
              }
            case _ =>
          }
          val offending = plan.collect { case n =>
            n.expressions.flatMap(_.collect {
              case s: Slice if s.exists(e =>
                    e.isInstanceOf[CollectList] || e.isInstanceOf[CollectSet]) ||
                  s.references.exists(r => derived(r.exprId)) => s
            })
          }.flatten
          if (offending.nonEmpty)
            failures += s"${q.name}: ${offending.size} slice-after-collect"
        } catch {
          case e: Throwable =>
            failures += s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage}"
        }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
