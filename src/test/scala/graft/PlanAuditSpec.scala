package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical 100×-scale plan invariants over EVERY SparkEntry query.
  *
  * The scattered per-operator plan assertions (ScaleOpsSpec, EtlSpec,
  * TopKSpec…) prove individual shapes; this sweep makes it impossible
  * to LAND a plan regression silently anywhere in the surface: a new
  * cartesian product, an accidental nested-loop join, an unpushed
  * scan filter, or an extra shuffle on any key fails here by name.
  * Plans are audited at sf0.001 — plan SHAPE is scale-invariant
  * (same operators, same exchanges at every sf; only AQE's runtime
  * coalescing differs), which is what makes a cheap local audit
  * meaningful for the 100 TB deployment.
  *
  * Streaming keys execute their stateful plan INSIDE the operator
  * (watermarks + state, audited by StreamPipelineSpec) and return a
  * drained in-memory result, so for them the sweep audits the final
  * drain plan — still useful: a drain that suddenly shuffled or
  * cross-joined would fail.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val physical
      : Map[String, org.apache.spark.sql.execution.SparkPlan] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.executedPlan
    }

  private lazy val plans: Map[String, String] =
    physical.view.mapValues(_.toString).toMap

  /** Shuffle exchanges only — BroadcastExchange is the cheap kind the
    * engine WANTS on small sides, so it never counts against a key. */
  private def shuffles(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange"))

  /** Every key's shuffle-exchange budget, set to the plan's CURRENT
    * count — the point is regression-freezing, not headroom: an
    * operator edit that adds an exchange anywhere must fail this spec
    * and force the author to either remove the shuffle or consciously
    * raise the budget in review. A new key without an entry fails the
    * completeness check below, so no key ships unaudited.
    *
    * Why the numbers are what they are (spot rationale): pure
    * column-map keys (text_*, etl casts) are 0; single-agg keys are
    * 1-2 (partial map-side combine + final, plus an ordered output
    * range exchange where the key sorts); asof/ivf carry a planned
    * range or bucket exchange; q_setops/q_skew_join/etl_seq_setval
    * union several grouped legs (5-6); the dedup family's 6-10 are
    * the HONEST scale counts — every corpus-sized side (band frames,
    * signature sets, candidate pairs) is pinned to shuffle by hint
    * (see the broadcast ban below), so the joins that would
    * broadcast-and-die at 100 TB show their true exchanges at
    * fixture scale too.
    */
  private val shuffleBudget: Map[String, Int] = Map(
    // kmv: the (grp,key) distinct is the ONE corpus-sized exchange;
    // everything after it (per-group bottom-K, the two count aggs,
    // the 5-row join, the sketch-union merge + its aggregates) rides
    // O(groups·K) or O(distinct-keys) frames
    "q_kmv_distinct" -> 9,
    // join_cardest: the 128-counter sign aggregate collapses in its
    // single-partition final (1), the 128-row estimator frame feeds
    // the means/median aggs (2), the exact-error row's key count is
    // the one corpus-keyed exchange (production drops it)
    "q_join_cardest" -> 4,
    // null_semantics: five quantifier branches over the same two
    // tables — each IN/EXISTS variant decorrelates to its own
    // (anti/semi) join + 1-row count; the NOT IN branch is the
    // broadcast null-aware anti join the key exists to pin
    "q_null_semantics" -> 5,
    // dp_count: coin+flip fuse into the scan; ONE group aggregate
    "pipeline_dp_count" -> 1,
    // dbscan: the 9-cell neighbor join (cell-keyed) feeds a
    // localCheckpoint; counts, core filter, border adoption and the
    // final classification joins ride (pid)-keyed exchanges over the
    // checkpointed pair frame — density-local volumes, never n²;
    // +2 in r13: clusterLabels' final vertex⋈roots labeling join is
    // lazy under star contraction (the star edges are the checkpoint,
    // the roots agg + join land in the consumer) — both exchanges
    // ride core-point-sized frames
    "q_dbscan_grid" -> 8,
    // kmv_jaccard: the (grp,key) distinct and the exact-error
    // intersection self-join are the two corpus-keyed exchanges;
    // the other 14 ride O(groups·K) sketch frames and O(pairs) rows
    // (drop the error columns and nothing corpus-sized remains past
    // the first distinct)
    "q_kmv_jaccard" -> 16,
    // stream_kmv: the drained final-state aggregate only (the
    // stateful plan executes inside the operator)
    "stream_kmv" -> 1,
    // match_recognize: measured TIGHT at 3 since the r13 pattern-table
    // compiler — the daily collapse (1), ONE grp-keyed exchange reused
    // by the classify/segment/LEAD windows and the run collapse, and
    // the final range sort (1). The r11-r12 run-pair SELF-JOIN plan
    // cost 5; compiling the V as a 2-step window-lead pattern (same
    // compiler as W/HS) dropped both join-side exchanges while keeping
    // the oracle text and hash identical
    "q_match_recognize" -> 3,
    // match_w: measured TIGHT at 3 — the daily collapse (1), ONE
    // grp-keyed hash exchange reused by the classify/segment windows,
    // the run collapse AND the run-grain LEAD window (this is why the
    // window-lead compile beats a 4-way self-join: no extra
    // exchanges), and the final range sort (1)
    "q_match_w" -> 3,
    // match_hs: the W lead plan (3) + the greedy SKIP PAST LAST ROW
    // selection — the per-group candidate fold's collect_list agg and
    // the kept⋉candidate left-semi re-key (2); ALL candidate-sized
    // frames, and the whole selection is one plan (no eager rounds)
    "q_match_hs" -> 5,
    // match_define / match_quant: measured TIGHT at 3 — the V-shape
    // lead plan exactly (daily collapse, one grp-keyed exchange shared
    // by classify/segment/run-collapse/lead windows, final range
    // sort): the DEFINE mid-run rescue and the {m,n} suffix/prefix
    // consumption are pure projection-level array rewrites over the
    // rich run grain, costing ZERO extra exchanges
    "q_match_define" -> 3,
    "q_match_quant" -> 3,
    // match_alt: the shared run-grain/lead subplan costs the V's 3
    // once (Spark reuses the identical branch exchanges), plus the
    // declaration-order preference window keyed by (grp, anchor seg)
    // over the UNION of branch candidates (1) and the final range
    // sort re-key (1)
    "q_match_alt" -> 5,
    // mv_auto: the advise/publish/register jobs run inside the call
    // (etl_wap's rule); the returned year dashboard re-plans onto the
    // auto summary — one rollup aggregate over the k-row MV scan + the
    // ordered output
    "q_mv_auto" -> 2,
    // kmv_quantile: the (grp,h) collision dedup is the ONE
    // corpus-sized exchange on the sketch path (1); TopKPerKey's
    // final lands on the dedup's (grp,…) clustering and the sample
    // window re-uses the grp exchange (2); the exact-error columns'
    // full-group rank window is the one corpus-grain sort (3 —
    // production drops it); the 5-row join broadcasts
    "q_kmv_quantile" -> 3,
    // kcenter: result is the collected pick trajectory (k rows);
    // every round's corpus scan is zero-shuffle by design
    "sim_kcenter" -> 0,
    // url dedup: one canonical-url exchange + countDistinct's expand
    "dedup_url" -> 2,
    // scene_cuts: the mm_* id-spread repartition only
    "mm_scene_cuts" -> 1,
    // clusters: star contraction rounds run eagerly over
    // localCheckpoint'd EDGE-sized frames; the audited plan is the
    // final labeling — roots agg over the star edges (1), the one
    // O(docs) vertex join (1), ordered output (1)
    "dedup_clusters" -> 3,
    // mmr_rerank: the greedy rounds run eagerly over localCheckpoint'd
    // O(queries·m) frames (the dedup_clusters pattern); the audited
    // plan is the checkpointed selection + ordered output
    "sim_mmr_rerank" -> 1,
    // hybrid_rrf: tf posting-list agg (reused by query+corpus sides),
    // lexical (q,doc) agg, two TopKPerKey family exchanges + their
    // rank windows, the (q_id, doc_id) fusion join, fused-rank
    // window + ordered output — every exchange on token-key or
    // O(queries·m) frames
    "sim_hybrid_rrf" -> 9,
    // hybrid_bm25: text_bm25's lexical exchanges (tf agg, pinned idf
    // posting join, fold agg) + the two TopKPerKey/rank-window pairs,
    // fusion join, fused window and ordered output — every exchange
    // on the term key or O(queries·m) frames
    "sim_hybrid_bm25" -> 11,
    // cluster_stats: the two aggs over the checkpoint-pinned
    // assignment frame + ordered output
    "dedup_cluster_stats" -> 5,
    // keep_best: the pinned assignment↔metadata join over the
    // checkpoint-pinned frame + the cluster struct-max agg + ordered
    // output
    "dedup_keep_best" -> 6,
    // soft_cap: keep_best's pinned assignment+meta join exchanges,
    // the TopKPerKey family exchange (bounded heaps, no window
    // sort) + ordered output
    "dedup_soft_cap" -> 7,
    // mips: sim_ivf0's shape on augmented vectors — expression-argmax
    // assignment (no corpus shuffle), broadcast probes, TopKPerKey
    // heap exchange, the bounded rank + ordered output
    "sim_mips_topk" -> 3,
    // repetition_budget: ONE corpus agg to source grain + the
    // model-sized frame's single-partition window exchange (taken
    // twice: the ranked frame feeds both the pick and the output) +
    // the two totals aggs + the 1-row pick's limit exchanges +
    // ordered output — all over the source-grain frame except the
    // first agg
    "pipeline_repetition_budget" -> 9,
    // rag_ingest: chunk explode is row-local; the two pinned
    // doc-grain joins' exchanges + the two-round (distinct-doc)
    // manifest agg + ordered output
    "pipeline_rag_ingest" -> 8,
    // safety_filter: bigram explode row-local, the deny join
    // BROADCASTS (the one pipeline join that should), the two-round
    // distinct-phrase hit agg + the pinned zero-hit stitch +
    // ordered output
    "pipeline_safety_filter" -> 6,
    // annotator_agreement: ONE global single-row aggregate; the
    // kappa arithmetic is a projection on that row
    "pipeline_annotator_agreement" -> 1,
    // span_corruption: pure scan-side array arithmetic; ordered
    // output is the only exchange
    "pipeline_span_corruption" -> 1,
    // double_billing: one suspect-key aggregate + ordered output
    "q_double_billing" -> 2,
    // trigram_search: posting-candidate agg + the pinned verify
    // semi-join + ordered output
    "q_trigram_search" -> 3,
    // discount_scenarios: ONE single-row aggregate of |scenarios|
    // conditional sums; the stack projection adds no exchange
    "q_discount_scenarios" -> 1,
    "dedup_embed_cosine" -> 8, "dedup_exact" -> 1,
    "dedup_incremental" -> 8, "dedup_minhash" -> 10,
    "dedup_ngram_jaccard" -> 3, "dedup_simhash" -> 6, "embed_quantize" -> 0,
    "etl_bool_convert" -> 0, "etl_cdc_upsert" -> 2, "etl_fk_orphans" -> 2,
    "etl_scd2" -> 2,
    "etl_incremental_agg" -> 3,
    "etl_jdbc_roundtrip" -> 0, "etl_join_extract" -> 0, "etl_pg_escape" -> 0,
    // format roundtrips: plain scan + projection, no exchange
    "etl_orc_roundtrip" -> 0, "pipeline_jsonl_roundtrip" -> 0,
    // pg_users: dim-sized script generation + ordered output
    "etl_pg_users" -> 1,
    "etl_pipeline_dump" -> 0, "etl_pre_sql" -> 2, "etl_ref_nullable" -> 0,
    "etl_shard_export" -> 0, "etl_snapshot_diff" -> 3,
    // schema evolution: footer-level merge + ordered output range
    // exchange; compact: read of the compacted layout + ordered output
    "etl_schema_evolution" -> 1, "etl_compact" -> 1,
    // partition evolution: two pruned era scans union + agg + order
    "etl_partition_evolution" -> 2,
    // dq_report: one conditional-agg pass per table (3) + the FK
    // anti-join + two key-grain uniqueness rules, each ending in a
    // 1-row single-partition merge — 11 exchanges, all 1-row or
    // key-grain frames
    "etl_dq_report" -> 11,
    // freshness: type-grain agg + the 1-row newest re-aggregate +
    // its single-partition landing + ordered output
    "etl_freshness" -> 4,
    // pk_discovery: 7 candidate arms, each an exact distinct-count
    // aggregate (2 exchanges per arm — partial + final over the
    // distinct state); the 1-row arms union driver-free
    "etl_pk_discovery" -> 14,
    // filtered_topk: the TopKPerKey family exchange + ordered
    // output; the label filter rides the broadcast-hash join key
    "sim_filtered_topk" -> 2,
    // backfill_plan: slot agg + span/type re-aggregates + the pinned
    // grid-vs-slots anti-join + islands window + ordered output
    "etl_backfill_plan" -> 6,
    // lsh_eval: the truth side's counted-intersection exchanges +
    // the pinned full-outer pair alignment + the 1-row rollup
    "dedup_lsh_eval" -> 7,
    // etl_profile's 4: the single-scan multi-distinct lowers to
    // Expand + two aggregate rounds (per-distinct-group shuffle,
    // final single-partition merge) — still ONE pass over the table
    "etl_profile" -> 4,
    "etl_rename_project" -> 0, "etl_seq_setval" -> 6, "etl_type_cast" -> 0,
    "etl_utc_shift" -> 0, "etl_where_extract" -> 0, "etl_zero_date" -> 0,
    "mm_binary_meta" -> 1, "mm_decode" -> 1, "mm_embed_fusion" -> 1,
    // audio: the id-spread exchange before per-row codec work (the
    // mm_* rule); generate + parse + frame in one partition pass
    "mm_audio_frames" -> 1,
    // patches: same mm_* shape — id spread, then decode + tile in
    // one partition pass
    "mm_patches" -> 1,
    // dataset_card: Expand + two-round grouping-sets agg (exact
    // median forces sort-based agg legs) + ordered output
    "pipeline_dataset_card" -> 3,
    // epoch_shuffle: ONE (epoch, shard)-grain window exchange carries
    // both epochs' per-worker orders
    "pipeline_epoch_shuffle" -> 1,
    // weighted_sample: TakeOrdered's single merge exchange + the
    // rank window over the k-row result — no corpus-wide sort
    "pipeline_weighted_sample" -> 2,
    // curriculum: the rank-key range exchange feeding the
    // checkpoint-pinned scan (offsets are driver-side O(partitions))
    "pipeline_curriculum" -> 2,
    "pipeline_pref_pairs" -> 1,
    // rfm: the orders→customer agg is checkpoint-pinned (its exchange
    // happens before the audited plan); the audited plan carries the
    // three rank passes' pid-grain window exchanges, the three
    // shuffle-pinned score joins, and the ordered output
    "q_rfm" -> 8,
    // mode: value-grain counts agg + segment struct-max agg + ordered
    // output — value-grain rows on the wire, never customers
    "q_mode" -> 3,
    // yoy: fact agg to (priority, year) grain + the model-sized lag
    // window's exchange + ordered output
    "q_yoy" -> 3,
    // benford: digit-grain count agg + the ≤9-row share window's
    // single-partition exchange + ordered output
    "q_benford" -> 3,
    // debounce: ONE (user,type)-grain sort exchange shared by both
    // window passes; the burst agg reuses that partitioning (grouping
    // keys superset) — plus the ordered output
    "q_debounce" -> 2,
    // streaks: distinct (user,day) agg + the user-grain island window
    // sort (streak + user aggs reuse its partitioning) + ordered output
    "q_streaks" -> 4,
    // mad: two sort-based percentile aggregates at type grain (each
    // partial+final) + the outlier agg + ordered output; median
    // frames broadcast back (intended, model-sized)
    "q_mad" -> 7,
    // audience_overlap: word-frame agg, the bucket-local pinned pair
    // join, pair agg, the two pinned size joins + ordered output —
    // raw (type,user) pairs cross the wire exactly once, as bits
    "q_audience_overlap" -> 12,
    // equidepth: the checkpoint-pinned rank scan's pid window exchange
    // + two broadcast boundary joins (no shuffle) + ordered output
    "q_equidepth_hist" -> 3,
    // decile_lift: the GlobalRank scan pinned pre-plan; decile agg +
    // the 10-row window's single-partition exchange + ordered output
    "q_decile_lift" -> 3,
    // cohort_ltv: first-order agg, the pinned cohort join, the
    // (cohort, offset)-grain agg (distinct forces two rounds), the
    // model-sized cum window + ordered output
    "q_cohort_ltv" -> 7,
    // dau_mau: daily word agg, the exploded (report-day, bucket)
    // merge agg, the day-grain MAU agg, the pinned DAU↔MAU join +
    // ordered output — events collapse to bits in pass one
    "q_dau_mau" -> 8,
    // forecast_backtest: one fact agg to (priority, month) grain +
    // the model-sized self-join's exchanges + ordered output
    "q_forecast_backtest" -> 5,
    // growth_accounting: distinct (user,week) agg + the user-grain
    // lag exchange + weekly roll-up + the model-sized churn window's
    // single-partition exchange + ordered output
    "q_growth_accounting" -> 6,
    // revenue_bridge: one customer-grain conditional-sum agg feeding
    // both the component roll-up and the 1-row reconciliation +
    // ordered output
    "q_revenue_bridge" -> 6,
    // assoc_rules: q_basket_pairs' pinned pair machinery × the
    // two-direction union + ordered output; r14 moved the basket
    // total INTO the plan as a 1-row broadcast scalar attach (its
    // distinct + count now appear as two audited exchanges instead
    // of a separate blocking driver job — net one fewer pass)
    "q_assoc_rules" -> 17,
    // order_intervals: the customer-grain lag exchange, the pinned
    // segment join, the segment-grain sort-based percentile agg
    // (distinct forces two rounds) + ordered output
    "q_order_intervals" -> 6,
    // concentration: fact agg to (year, priority) grain + the
    // model-sized share window + year roll-up + ordered output
    "q_concentration" -> 5,
    // gini: fact agg to customer grain, the pinned segment join's two
    // exchanges, the segment rank-window sort (the segment roll-up
    // reuses its partitioning) + ordered output
    "q_gini" -> 5,
    // changepoint: the pinned fact-customer join's two exchanges
    // (nation dim broadcasts), the (nation, day) grain agg, ONE
    // nation-window exchange shared by scan/totals/argmax + ordered
    // output
    "q_changepoint" -> 5,
    // survival: fact agg to customer grain feeding both the 1-row
    // edge broadcast and the pinned segment join, the (seg, bucket)
    // life-table agg + its reverse-cumulative window exchange +
    // ordered output
    "q_survival" -> 7,
    // stock_ledger: (part, day) grain agg + ONE part-window exchange
    // shared by prefix-sum/running-min/lagged-min (part roll-up
    // reuses it) + ordered output
    "q_stock_ledger" -> 4,
    // top_paths: ONE user-window exchange (both leads share the
    // sort), path-grain agg, the model-sized global rank's
    // single-partition exchange + ordered output
    "q_top_paths" -> 5,
    // fifo_cogs: two part-window prefix-sum exchanges (receipts +
    // shipments), the pinned band join (matched agg + side totals +
    // the full-outer/left stitch all reuse part partitioning) +
    // ordered output
    "q_fifo_cogs" -> 6,
    // twab: the ledger scan's (part, day) agg + its ONE part-window
    // exchange (lead shares it; rollup reuses it) + ordered output
    "q_twab" -> 4,
    // weighted_percentile (r14): the flag-window sort funneled the
    // whole fact table through THREE reducers (one per return flag);
    // now the factored GlobalRank range scan — range exchange + pid
    // window + the 3-row per-flag broadcast + flag rollup + ordered
    // output. Two more audited exchanges buy sort parallelism that
    // grows with the cluster instead of with the flag domain.
    "q_weighted_percentile" -> 5,
    // anomaly_bands: changepoint's frame — pinned fact-customer join
    // (two exchanges), (nation, day) agg, ONE nation-window exchange
    // shared by both rolling stats + the rollup + ordered output
    "q_anomaly_bands" -> 5,
    // mm_dedup: r14 folds docs to FAMILY grain before the codec
    // encode (one map-side-combinable agg more, 7× fewer encodes) +
    // the generate-spread repartition + blob-grain hash agg +
    // ordered output
    "mm_dedup" -> 4,
    // degree_dist: distinct-edge + per-supplier degree (shared
    // grouping) + histogram rollup + ordered output
    "q_degree_dist" -> 4,
    // adoption: two pinned corpus joins (4) + (brand,cust) first-
    // adoption agg + monthly rollup + brand window + ordered output
    "q_adoption" -> 8,
    // price_index: (part,month) agg + base min-struct agg + the
    // pinned part-grain join (2) + month rollup + ordered output
    "q_price_index" -> 6,
    // business_days: the orderkey fact-fact join (2) + 5-row rollup
    // + ordered output
    "q_business_days" -> 4,
    // seasonality: map-side agg to 7 rows + the 1-row total
    // re-aggregate + its single-partition landing + ordered output
    "q_seasonality" -> 4,
    // inventory_aging: (part,day) agg + the shared part-window
    // exchange + 1-row as-of landing + bucket rollup + ordered output
    "q_inventory_aging" -> 5,
    // autocorr: day-grain agg + the single-partition series window;
    // the 7-row lag rollup and output reuse that partitioning
    "q_autocorr" -> 2,
    // moments: one map-side-combined power-sum agg + ordered output
    "q_moments" -> 2,
    // spearman: ONE supplier-grain window exchange shared by both
    // rank passes, the rank-sum agg reusing that partitioning +
    // ordered output
    "q_spearman" -> 2,
    // kendall_tau: the sk-keyed pair self-join + the count agg + the
    // pair-count agg + the n⨝pairs join + ordered output
    "q_kendall_tau" -> 6,
    // ks_test: post-checkpoint only (the price-grain agg + range
    // repartition run before the pin): the pid window exchange +
    // the 1-row max aggregate's partial/final pair
    "q_ks_test" -> 3,
    // mannwhitney: value-grain agg (partial+final) + the 50-row
    // value-domain window's single-partition exchange + the 1-row
    // final aggregate
    "q_mannwhitney" -> 3,
    // diversity: (source,lang) agg + source regroup + ordered output
    "q_diversity" -> 3,
    // tax_brackets: ONE single-row aggregate of parallel bracket
    // sums (discount_scenarios' shape); stack + 4-row sort add one
    "q_tax_brackets" -> 2,
    // window_ignore_nulls: ONE user-grain window exchange shared by
    // the fill and the running count + ordered output
    "q_window_ignore_nulls" -> 2,
    // currency_normalize: the pinned orders⨝customer join (2) +
    // the (nation,month) rollup + ordered output; nation and the
    // derived rate grid broadcast
    "etl_currency_normalize" -> 4,
    // pack_stats: the pack scan's post-checkpoint window + its
    // ordered output + the sequence-grain audit agg + ordered output
    "pipeline_pack_stats" -> 4,
    // chat_format: one narrow projection + ordered output
    "pipeline_chat_format" -> 1,
    // attention_spans: the pack scan's range repartition + its pid
    // window re-plan under the explode projection + ordered output
    "pipeline_attention_spans" -> 3,
    // anneal_phase: quality-ranked scan pinned pre-plan; the pid
    // window exchange + ordered output
    "pipeline_anneal_phase" -> 2,
    // pack_shards: generate-spread repartition runs pre-checkpoint;
    // the pid window + shard manifest agg + ordered output
    "mm_pack_shards" -> 3,
    // aspect_buckets: decode-spread repartition + the (pid,bucket)
    // scan window run pre-checkpoint; final plan = window exchange +
    // ordered output
    "mm_aspect_buckets" -> 2,
    // channel_stats: the decode-spread repartition + ONE global agg
    // to a single row; the stack is a projection
    "mm_channel_stats" -> 2,
    // bfs_reach: per-round frontier joins run pre-checkpoint (the
    // dedup_clusters iterative discipline); the final plan is the
    // union of pinned rounds + ordered output
    "q_bfs_reach" -> 1,
    // shortest_path: relaxation rounds run pre-checkpoint (same
    // discipline); final plan is the pinned label frame + ordered
    // output
    "q_shortest_path" -> 1,
    // link_predict: edge list pinned pre-plan; the wedge self-join
    // (2) + pair agg + the edge anti-join (2) + degree agg + the two
    // node-keyed degree joins (kept shuffled, NOT broadcast — the
    // degree frame is node-sized and unbounded at scale) + ordered
    // output
    "q_link_predict" -> 9,
    // runs_test: day-grain agg + the model-sized series windows +
    // the 1-row final aggregate
    "q_runs_test" -> 3,
    // cramers_v: q_chi2's margin aggregates + the grid join + the
    // 1-row summary aggregate over the dimension-sized grid
    "q_cramers_v" -> 7,
    // proportion_test: ONE single-row conditional-sum aggregate
    "q_proportion_test" -> 1,
    // welch_ttest: ONE single-row conditional-sum aggregate
    "q_welch_ttest" -> 1,
    // multireg: ONE map-side-combined per-group aggregate + ordered
    // output
    "q_multireg" -> 2,
    // cov_matrix: ONE single-row sum aggregate; the stack projection
    // and 10-row sort add no data-sized exchange
    "q_cov_matrix" -> 1,
    // return_rates: the pinned part join (2) + brand rollup +
    // ordered output
    "q_return_rates" -> 4,
    // trend_slope: the pinned fact→customer join (2) + (nation,day)
    // agg + ONE shared nation-window exchange + ordered output
    "q_trend_slope" -> 5,
    // rolling_corr: trend_slope's frame — fact⨝customer join + the
    // day-grain agg + the shared nation-window sort + ordered output
    "q_rolling_corr" -> 5,
    // seasonal_decompose: day-grain agg + the single-partition
    // series windows (centered MA + per-dow means share it)
    "q_seasonal_decompose" -> 2,
    // dataset_drift: (year,prio) agg + the year-share window + the
    // 1-row base-year landing + TVD rollup + ordered output
    "q_dataset_drift" -> 6,
    // fulfillment_lag: the pinned fact-fact join's two exchanges +
    // the priority-grain sort-based percentile agg + ordered output
    "q_fulfillment_lag" -> 5,
    // top_movers: checkpoint-pinned (month,part) ranking (its agg +
    // window exchanges run before the pin), the pinned prev-month
    // lookup join + ordered output
    "q_top_movers" -> 4,
    // promo_lift: one band agg (partial+final), the 1-row baseline
    // broadcast join + ordered output
    "q_promo_lift" -> 4,
    // ab_bucketing: distinct users agg, the variant count agg, the
    // 2-row total window's single-partition exchange + ordered output
    "q_ab_bucketing" -> 5,
    // winsorize: the type-grain rank sort exchange (ranks + counts
    // share it), the clip agg + ordered output; bound rows broadcast
    "q_winsorize" -> 5,
    // readability: pure per-row projection; only the ordered output
    "text_readability" -> 1,
    // length_buckets: bucket-grain agg (partial+final) + ordered output
    "pipeline_length_buckets" -> 2,
    // filter_cascade: one corpus agg (partial + 1-row final) + the
    // 4-row funnel's ordered output
    "pipeline_filter_cascade" -> 3,
    // temp_sampling: source-grain agg + the model-sized normalization
    // window's single-partition exchange + ordered output
    "pipeline_temp_sampling" -> 3,
    // late_dim: two shuffle-pinned fact→dim-slice left joins + the
    // ordered output
    "etl_late_dim" -> 5,
    // gdpr_erase: per-table count aggregates (predicate-pushed
    // filters for customer/orders, two shuffle-pinned semi joins for
    // the lineitem cascade + residual) + the 3-row ordered report
    "etl_gdpr_erase" -> 16,
    // reconcile: both sides collapse to bucket grain in one pass
    // (partial+final each), the pinned full-outer bucket join + the
    // ordered mismatch output
    "etl_reconcile" -> 6,
    // type_infer: one scan through the stack unpivot, one column-name
    // grain agg (partial+final) + the 6-row ordered verdict
    "etl_type_infer" -> 3,
    // csv_sniff: one file-grain min/max agg (partial+final) + the
    // 10-row ordered verdict
    "etl_csv_sniff" -> 3,
    // partition_skew: the checkpoint-pinned day frame (its agg runs
    // before the pin) + the ordered report; total/median are
    // model-sized driver scalars
    "etl_partition_skew" -> 1,
    // ngram_novelty (r15 TIGHT at 4): distinct pairs exchange, the
    // shingle-keyed window that reads the first-occurrence frontier
    // off the same pass (replacing the old frontier-agg + join-back +
    // second scan), doc-grain agg, ordered output — every frame
    // corpus-sized, broadcast banned
    "text_ngram_novelty" -> 4,
    // url_canon: pure per-row string surgery; only the ordered output
    "text_url_canon" -> 1,
    // html_strip: pure per-row regexp chain; only the ordered output
    "text_html_strip" -> 1,
    // concordance: the corpus position explode + ordered output —
    // the inverted-index build shape, no join back
    "text_concordance" -> 1,
    "pipeline_train_corpus" -> 2, "pipeline_split_safe" -> 1,
    "pipeline_stratified_sample" -> 2, "pipeline_decontaminate" -> 5,
    "embed_pq" -> 3,
    "q1_agg" -> 2, "q3_topk_join" -> 1, "q5_star_join" -> 2,
    "q_approx_distinct" -> 2, "q_approx_percentile" -> 2,
    "q_array_funcs" -> 1, "q_map_funcs" -> 1,
    "q_asof_bcast" -> 3, "q_asof_join" -> 3,
    // nearest: two asOf passes (each the audited union+window
    // exchange pair) + ordered output
    "q_asof_nearest" -> 6,
    // q_bloom_join's 5: SMJ both sides + group + order, plus the
    // bloom-build subquery's own single-partition aggregate exchange
    // — the price of pruning the fact side before its shuffle
    "q_bloom_join" -> 5,
    "q_bucket_join" -> 2, "q_case_agg" -> 2, "q_cube" -> 2,
    // bitmap_distinct: one exchange per aggregation grain (hour
    // partials → day-bucket merge → day popcount); each level is
    // map-side combined and carries bitmap words, never raw rows
    "q_bitmap_distinct" -> 3,
    // event_pattern: the single user-grain collect_list agg (map-side
    // combined); the regex runs over the O(users) path frame in place
    "q_event_pattern" -> 1,
    // skyline: bucket agg (2: partial+final on the O(buckets) frame)
    // + its model-sized prefix window exchange + the bucket-local and
    // per-size window passes over the table; the prefix frame itself
    // joins back by broadcast
    "q_skyline" -> 6,
    // concurrency: scanline bucket window exchange (bucket totals
    // reuse its partitioning — no agg exchange), the model-sized
    // prefix window on the O(types×days) frame, and the single peak
    // aggregate's partial+final pair; offsets join back by broadcast
    "q_concurrency" -> 4,
    // geo_join: the cell-keyed shuffle hash-join's two exchanges —
    // both sides corpus-sized at production scale, broadcast banned
    "q_geo_join" -> 2,
    // cum_distinct: (type,user) min agg + per-day regroup + the
    // model-sized running-sum window over the O(types×days) frame
    "q_cum_distinct" -> 3,
    // decay_score: the as-of 1-row aggregate + the user-grain sum
    "q_decay_score" -> 2,
    // pareto_share: part-grain revenue agg + the total 1-row agg +
    // the range repartition for the scan + the checkpoint-pinned
    // partition-totals agg; the prefix offsets are driver-side
    // O(partitions), the pack-scan discipline
    "q_pareto_share" -> 5,
    // chi2: three margin aggregates off one source + the grid's
    // obs left-join; the margins cross by broadcast (dimension-sized)
    "q_chi2" -> 6,
    // dup_spans (r15 TIGHT at 4): (sh,doc,k) multiplicity agg, the
    // shingle-keyed doc-frequency window (replacing the old freq agg +
    // join-back + second scan+explode), doc-grain agg, the docs left
    // join — every side corpus-sized, all pinned to shuffle
    "text_dup_spans" -> 4,
    // rolling_median: the single user-grain window exchange
    "q_rolling_median" -> 1,
    // hopping_window: one agg-grain exchange — the 4× replication
    // happens before the map-side combine
    "q_hopping_window" -> 1,
    // attribution (r14): ONE left touch join (2 sides) + purchase-
    // grain window + final credit agg — the direct arm's second
    // touch join, p_id distinct and anti-join legs folded into the
    // left join's null rows (8 → 4)
    "q_attribution" -> 4,
    // transition_matrix: user-grain window + cell-grain count
    "q_transition_matrix" -> 2,
    // basket_pairs: checkpointed basket frame feeds the order-keyed
    // pair join + pair agg + frequency agg + the two thin joins
    "q_basket_pairs" -> 7,
    // setops_all: four independent set-op legs, each lowering to
    // per-key count aggregates (+ generate for the ALL forms) and a
    // 1-row final count — shuffles carry (key, count) pairs
    "q_setops_all" -> 14,
    // lang_confusion: one scan (predictor rides the label projection,
    // no self-join) + the O(langs²) cell count
    "text_lang_confusion" -> 1,
    // survivorship: membership join (checkpointed labels + parts) +
    // the two survivor aggregates + brand vote + final cluster join —
    // all corpus-grain sides shuffle-pinned
    "etl_survivorship" -> 7,
    // scd2_lookup: the dim build's version window + the key-equality
    // join (both sides pinned) + the as-of struct-max agg
    "etl_scd2_lookup" -> 5,
    // wap: the returned manifest is an O(batches) local relation;
    // staging/audit/publish jobs run inside the call (cdc_apply rule)
    "etl_wap" -> 0,
    "q_date_funcs" -> 0, "q_distinct" -> 3, "q_events_window" -> 3,
    // gap_fill/retention: daily/weekly grain aggs + the pinned
    // corpus-side join + ordered output — every side shuffles, none
    // broadcasts (the joined aggregates are corpus-derived)
    "q_gap_fill" -> 5, "q_retention_cohort" -> 5,
    // asof_interpolate: gap_fill's shape + the user-grain window pass
    "q_asof_interpolate" -> 5,
    "q_explode_lateral" -> 2, "q_full_outer" -> 3, "q_grouping_sets" -> 2,
    // json_table: the low-split-source spread exchange (Tables.spread
    // — a no-op on wide sources) + the shred projection; shredding
    // itself must never shuffle
    "q_json_table" -> 1,
    // cdc_deletes: tombstone max-version agg (O(deletes)); the
    // corpus-side visibility join is broadcast, no rewrite, no sort
    "etl_cdc_deletes" -> 2,
    // time_travel: tombstone array agg only; corpus side never shuffles
    "etl_time_travel" -> 2,
    // vacuum: horizon tombstone agg only; images filter on a broadcast
    "etl_vacuum" -> 1,
    // pagerank's 10 is the iterative regime priced honestly: 3 rounds
    // x (edge join both sides + contribution agg + rank rebuild join),
    // every corpus-sized side shuffle-pinned
    "q_pagerank" -> 10,
    // heavy_hitters: partial/final sketch agg (k-entry maps only) +
    // the typed flatMap + ordered output
    "q_heavy_hitters" -> 2,
    // hierarchy: the iterative doubling runs inside the operator on
    // checkpointed thin frames; the returned plan is checkpoint scan
    // + ordered output
    "q_hierarchy" -> 1,
    // bom_explosion: the doubling rounds run inside checkpointed
    // frames; the returned plan is the pinned cost join (two
    // exchanges), the root rollup + ordered output
    "q_bom_explosion" -> 5,
    // window_groups: the (supp, day) group agg + its supplier-window
    // exchange + the pinned row-grain join-back + ordered output
    "q_window_groups" -> 6,
    // window_exclude: two windows sharing the supplier exchange
    // (range frame + peer-group sum need separate sorts) + ordered
    // output; no joins
    "q_window_exclude" -> 4,
    // merge_all: the pinned full-outer merge join's exchanges (the
    // batch union reads the target thrice — one exchange each) and
    // the per-row CASE cascade; no window, no second pass
    "etl_merge_all" -> 5,
    // bitemporal: the append-only ledger unions read the base four
    // times (one exchange each into the resolution agg), the (key,
    // grid) argmax + report rollup share partitioning + ordered
    // output; the 4-row grid broadcasts
    "etl_bitemporal" -> 7,
    // bad_records: one parse-pass aggregate + ordered output
    "etl_bad_records" -> 2,
    // vocab_oov: term-count agg + TopKPerKey final + per-doc oov agg
    // + the pinned doc-grain join + ordered output; the vocabulary
    // itself broadcasts by contract (bounded N rows)
    "text_vocab_oov" -> 5,
    "q_json_funcs" -> 2, "q_outer_join" -> 2, "q_percentile" -> 2,
    // latest_per_key/histogram: one agg-grain shuffle + ordered output
    "q_latest_per_key" -> 2, "q_histogram" -> 2,
    "q_pivot" -> 3,
    // range_join: the bin-keyed shuffle join's two exchanges (pinned
    // r9 — Spark had been broadcasting the fact side) + agg + output
    "q_range_join" -> 5, "q_rollup" -> 2,
    "q_partition_prune" -> 2, "q_zorder_prune" -> 2,
    // mv_rewrite: the rewritten plan is a k-row MV scan + projection —
    // ZERO exchanges is the feature
    "q_mv_rewrite" -> 0,
    // mv_rollup: re-aggregation of the k-row month MV at year grain —
    // both exchanges (agg + ordered output) are model-sized, the
    // corpus is never scanned
    "q_mv_rollup" -> 2,
    // mv_filter: selection-subsumption rewrite — filter pushed into
    // the k-row MV scan, then the same model-sized rollup exchanges
    "q_mv_filter" -> 2,
    // mv_star: the same model-sized rollup exchanges over the
    // star summary — neither base table is ever scanned
    "q_mv_star" -> 2,
    // mv_choice: cost-picked month MV re-aggregated at year grain —
    // identical plan shape (and budget) to q_mv_rollup; the day MV
    // and the corpus are never scanned
    "q_mv_choice" -> 2,
    // mv_advisor: the returned frame is the candidates×1 local
    // relation; the grain-count jobs run eagerly inside advise()
    "q_mv_advisor" -> 0,
    // mv_having: the two MV-served re-aggregations (year grain +
    // global total) and ordered output — all model-sized exchanges,
    // the corpus never scanned
    "q_mv_having" -> 3,
    // mv_star_refresh: the delta-side partial agg, the k-row merge
    // re-agg, ordered output — O(delta + k) exchanges, the fact
    // table scanned once (delta only), the summary never rebuilt
    "q_mv_star_refresh" -> 3,
    // mv_retract: retraction partial agg, survivors-extrema agg
    // (affected months only), the two k-row patch joins pinned to
    // shuffle, ordered output — the summary is never rebuilt whole
    "q_mv_retract" -> 4,
    // mv_refresh: delta partial-agg exchange, merge re-agg exchange,
    // ordered output — O(delta + k) frames, the base never rescans
    "q_mv_refresh" -> 3,
    // semdedup: assignment is a zero-shuffle projection; exchanges are
    // the centroid-keyed cell self-join (2), the prune aggregate, the
    // id-keyed join back (2) and ordered output
    "sim_semdedup" -> 7,
    // matryoshka: two TopKPerKey winner shuffles (one per ranking) +
    // the O(queries·k) overlap join/agg + ordered output — the corpus
    // itself streams map-side through both rankings
    "embed_matryoshka" -> 7,
    // range_search: sim_ivf_topk's probe machinery minus the top-k
    // heap — probe-rank window + ordered output; matches stream out
    // against the broadcast probe frame
    "sim_range_search" -> 3,
    "q_scalar_subquery" -> 2, "q_semi_anti" -> 2, "q_session_window" -> 2,
    // q21: flagged frame pinned pre-plan; the participation distinct
    // + orderkey-keyed semi (2) + flagged distinct + anti (2) + the
    // count agg + the supplier join (2, dim NOT broadcast) + ordered
    // output
    "q21_waiting" -> 9,
    // q22: threshold scalar agg + the recent-buyer distinct + the
    // custkey anti join + the nation rollup + ordered output
    "q22_prospects" -> 6,
    // interval_merge: ONE user-grain shuffle carries both window
    // passes and the aggregate (HashPartitioning(user_id) clusters
    // the (user_id, island) groups) + ordered output
    "q_sessionize" -> 2, "q_interval_merge" -> 2,
    // manifest_prune: selected-file scan agg + ordered output — the
    // manifest consultation itself is a separate tiny job
    "etl_manifest_prune" -> 2,
    // paragraph_dedup's 6 is the dedup-family regime: window text
    // shuffles once to its hash grain for the keeper decision,
    // survivors once to the doc grain for reassembly; every
    // corpus-sized join side pinned to shuffle
    "text_paragraph_dedup" -> 6,
    "q_setops" -> 5, "q_skew_join" -> 5,
    "q_string_funcs" -> 0, "q_topk_per_key" -> 2, "q_unpivot" -> 2,
    "q_window_funcs" -> 3, "q_window_range" -> 2, "q_window_running" -> 2,
    // group_concat: one agg-grain shuffle (Expand for the distinct
    // count) + ordered output; dist_funcs: one customer-grain window
    // shuffle carries all three functions + ordered output
    "q_group_concat" -> 3, "q_window_dist_funcs" -> 2,
    // ohlc: one bar-grain agg shuffle (five-scalar state) + ordered
    // output
    "q_ohlc_bars" -> 2,
    // funnel: three filtered scans reduce to user-grain minima, then
    // user-keyed joins of thin frames + ordered output
    "q_funnel_steps" -> 8,
    // penny: the keyed orders join + ONE order-grain shuffle shared by
    // both windows and the rank + ordered output
    "q_penny_allocation" -> 4,
    // knn_join: bucket-grain shuffle of both self-join sides + the
    // TopKPerKey candidate shuffle + ordered output — the Σ bucket²
    // shape, never all-pairs
    "sim_knn_join" -> 4,
    // maxsim: ONE corpus pass into the (query, doc) conditional-max
    // agg + TopKPerKey candidate shuffle + bounded rank window +
    // ordered output
    "sim_maxsim" -> 4,
    "sim_cosine_topk" -> 2, "sim_ivf0_topk" -> 3, "sim_ivf_topk" -> 3,
    // recall: the two composed ANN plans' exchanges + the O(q×k)
    // intersection joins and counts
    "sim_recall" -> 9,
    "sim_ivf_ingest" -> 1, "sim_ivfpq_topk" -> 3,
    // index_stats: zero-shuffle assignment + the per-centroid count
    // agg + the 1-row total agg + the k-row ordered output
    "sim_index_stats" -> 4,
    // pq_rerank: the ADC stage's exchanges (TopKPerKey candidate heap
    // runs pre-broadcast) + the raw-corpus rerank join's heap + the
    // bounded rank window + ordered output
    "sim_pq_rerank" -> 4,
    "stream_dedup" -> 0, "stream_enrich" -> 0, "stream_events" -> 0,
    "stream_join" -> 0, "stream_funnel_timeout" -> 0,
    "stream_sessions" -> 0, "stream_user_state" -> 0,
    // cdc_apply merges inside foreachBatch micro-batch jobs; the
    // returned frame is the drained O(keys) local relation
    "stream_cdc_apply" -> 0, "stream_scd2" -> 0, "stream_ohlc" -> 0,
    // dim_vacuum: merge + compaction + GC run inside foreachBatch /
    // driver-side dir ops; the returned frame is the drained O(keys)
    // local relation
    "stream_dim_vacuum" -> 0,
    // dim_asof: the four bounded reads execute inside the call; the
    // returned frame is the O(keys·bounds) local relation
    "stream_dim_asof" -> 0,
    // dim_asof_ts: same drained-snapshot shape, bounds resolved
    // through the event-time manifests instead of generation numbers
    "stream_dim_asof_ts" -> 0,
    // mv_maintain: drained store rolls up before collect; the
    // returned frame is the O(months) local relation
    "stream_mv_maintain" -> 0,
    // mv_retract: subtract-and-patch runs inside foreachBatch jobs;
    // the returned frame is the drained O(months) local relation
    "stream_mv_retract" -> 0,
    // anomaly: drained day-grain local relation -> moments agg + flag
    // join + ordered output, all on the types×days model frame
    "stream_anomaly" -> 4,
    // heavy_hitters: merged shard sketches return as a local relation
    "stream_heavy_hitters" -> 0,
    // bitmap_distinct: popcount rollup over the drained word state
    // returns as a local relation
    "stream_bitmap_distinct" -> 0,
    // late_data: drained O(types) counters return as a local relation
    "stream_late_data" -> 0,
    // boilerplate's 11 is the dedup-family regime: the chunk frame is
    // rebuilt per branch (frequency, anti-join, totals, reassembly)
    // and every corpus-derived side is pinned to shuffle
    "text_boilerplate" -> 11,
    "text_bpe_pairs" -> 2,
    // bpe_train: the returned frame is the K-row trained merge table
    // (a local relation) + its ordered output; the training rounds
    // run as separate vocabulary-sized jobs before the plan exists
    "text_bpe_train" -> 1,
    // bpe_apply: the word-keyed vocab join's two exchanges + the
    // doc-grain aggregate + ordered output; the K merge replaces run
    // inside the vocab-side projection, no extra pass
    "text_bpe_apply" -> 5,
    "text_chunk" -> 1,
    "text_domain_mix" -> 1, "text_fingerprint" -> 0, "text_langid" -> 0,
    "text_normalize" -> 0,
    "text_pack_sequences" -> 3, "text_pii_scrub" -> 0, "text_quality" -> 0,
    // ttr: (source,type) grain agg + source rollup + ordered output
    "text_ttr" -> 3,
    // zipf: term-frequency agg + the bounded top-k heap + the scalar
    // total agg + the head-frame window + ordered output
    "text_zipf" -> 6,
    // source_overlap: the (source,token) distinct + the token-keyed
    // intersection self-join + the pair-count agg + ordered output
    "text_source_overlap" -> 6,
    // repetition (r15 TIGHT at 0): every statistic is doc-grain over
    // the row's own bigram array (sorted-run aggregate), so the key is
    // a pure scan-side projection — zero exchanges at any scale
    "text_repetition" -> 0, "text_tfidf" -> 7, "text_tokens" -> 0,
    "text_train_split" -> 0,
    // anonymize: pure projection, fuses with the scan
    "etl_anonymize" -> 0,
    // table_checksum: per table one partial/final 1-row agg merge —
    // scan + fold is shuffle-free by design
    "etl_table_checksum" -> 3,
    // reshard: doc-grain argmax exchange, movement-matrix aggregate,
    // ordered output — the k-way explode never shuffles raw
    "etl_reshard_plan" -> 3,
    // bm25: tf posting agg, the term-keyed idf join (both sides
    // pinned — vocab grows with the corpus), the (q,doc) fold agg,
    // TopKPerKey family exchange, bounded rank window + ordered
    // output — the corpus never sorts
    "text_bm25" -> 7,
    // fk_inference: 4 probes × (child distinct + parent distinct +
    // anti-join + two 1-row agg merges) — all key-grain frames; the
    // child side collapses to DISTINCT before any join
    "etl_fk_inference" -> 20,
    // id_gaps: bucket-local lag window + the O(buckets) bounds agg
    // and its model-sized single-partition window + union
    "etl_id_gaps" -> 4,
    // ngram_lm: bigrams cut scan-side; frequency agg + lookup join +
    // per-doc agg, all on keys with map-side combine
    "text_ngram_lm" -> 4,
    // collocations: unigram + bigram aggs, two pinned vocab joins,
    // the 1-row total, and a TakeOrdered bounded heap (no global sort)
    "text_collocations" -> 7,
    // stats_funcs: one map-side-combined agg of six decimal sums —
    // q1_agg's shape with more accumulators
    "q_stats_funcs" -> 1,
    // fuzzy_join: both block-join sides shuffle on the blocking key
    // (broadcasting a corpus-scale side is the fuzzy-join OOM)
    "q_fuzzy_join" -> 2,
    // triangle_count: the motif-join ladder — order-grain self-join,
    // edge distinct, wedge + closing-edge joins, two per-anchor aggs
    // and the final merge; every side shuffle-pinned, the distinct
    // edge exchange reused across consumers at execution
    "q_triangle_count" -> 22)

  /** The only nested-loop broadcasts the engine intends: the
    * brute-force ANN baseline's bounded queries×corpus scan
    * (sim_cosine_topk IS the exhaustive contract), the bounded
    * queries×centroids IVF probe (SimOps.scala:258 — k rows broadcast
    * against a 3-row query side) and the 1-row max-key shift joined
    * into the CDC insert images (Etl.scala:415). Everything else in a
    * BroadcastNestedLoopJoin is an un-equi-joined mistake that blows
    * up quadratically at scale. text_tfidf joins the 1-row corpus
    * count the same way as the CDC shift. */
  private val bnlAllowed =
    Set("sim_cosine_topk", "sim_ivf_topk", "sim_ivf0_topk", "sim_maxsim",
      "sim_mips_topk",
      // range_search shares sim_ivf_topk's probe-selection cross of
      // the model-sized centroid frame
      "sim_range_search",
      // matryoshka runs sim_cosine_topk's exhaustive contract twice
      // (full-dim and prefix-dim): the broadcast-queries =!= join IS
      // the brute-force scan, corpus streaming map-side
      "embed_matryoshka",
      // hybrid_rrf's vector side is sim_cosine_topk's broadcast
      // =!= scan (the lexical side joins on the token key, hash)
      "sim_hybrid_rrf",
      "etl_cdc_upsert", "text_tfidf",
      // bm25 crosses the 1-row (tot_dl, n_docs) corpus-moment frame
      // into the (q,doc) fold — 1-row broadcast by construction
      "text_bm25",
      // hybrid_bm25 inherits BOTH: text_bm25's 1-row corpus-moment
      // cross in its lexical arm and hybrid_rrf's broadcast =!=
      // cosine scan in its vector arm
      "sim_hybrid_bm25",
      // dq_report crosses six 1-row stat aggregates into the single
      // report row — 1-row × 1-row by construction
      "etl_dq_report",
      // collocations joins the 1-row token total like text_tfidf
      "text_collocations",
      // zipf crosses the 1-row corpus total into the N-row head
      "text_zipf",
      // q22 crosses the 1-row balance threshold into the customer scan
      "q22_prospects",
      // mv_having crosses the 1-row MV-served global total into the
      // k-row year frame — 1-row broadcast by construction
      "q_mv_having",
      // index_stats crosses the 1-row corpus total into the k-row frame
      "sim_index_stats",
      // fk_inference crosses each probe's two 1-row counts
      "etl_fk_inference",
      // gdpr_erase crosses each table's three 1-row ledger counts
      // into its report row — 1-row × 1-row by construction
      "etl_gdpr_erase",
      // promo_lift broadcasts its 1-row zero-discount baseline into
      // the ≤11-band frame — 1-row by construction
      "q_promo_lift",
      // assoc_rules crosses the 1-row basket total into the rule
      // frame (r14: was a blocking driver-side count) — 1-row
      // broadcast by construction, the text_tfidf shape
      "q_assoc_rules",
      // survival broadcasts its 1-row observation edge into the
      // customer-grain frame — 1-row by construction
      "q_survival",
      // repetition_budget crosses the 1-row totals and the 1-row
      // water-level pick into the model-sized source frame
      "pipeline_repetition_budget",
      // bitemporal crosses the 4-row snapshot grid into the ledger —
      // row multiplier = grid size by construction
      "etl_bitemporal",
      // chi2 crosses the two dimension-sized margin frames into the
      // full contingency grid — the corpus never crosses it
      "q_chi2",
      // cramers_v inherits chi2's margin cross (same grid build)
      "q_cramers_v",
      // currency_normalize crosses nation (25) × months (72) to
      // DERIVE the rate dim — dimension-sized at any corpus size;
      // the fact side joins it by broadcast hash, never BNL
      "etl_currency_normalize",
      // recall composes sim_cosine_topk + sim_ivf_topk, inheriting
      // their intended query-side broadcast crosses
      "sim_recall",
      // seasonality broadcasts its 1-row grand total into the 7-row
      // weekday frame — 1-row by construction
      "q_seasonality",
      // inventory_aging broadcasts the 1-row as-of day into the
      // surviving-layer frame — 1-row by construction
      "q_inventory_aging",
      // freshness broadcasts its 1-row global newest into the
      // type-grain frame — 1-row by construction
      "etl_freshness",
      // backfill_plan crosses the 1-row horizon span into the
      // model-sized type list to build the expected grid
      "etl_backfill_plan",
      // dataset_drift crosses the 1-row base-year pick into the
      // model-sized (year, priority) share frame
      "q_dataset_drift",
      // kmv crosses the 1-row global-exact count into the 1-row
      // merged-sketch row to build the ALL row — 1×1 by construction
      "q_kmv_distinct",
      // kmv_jaccard crosses the groups dimension with itself (5×5)
      // to enumerate pairs — dimension-sized at any corpus size
      "q_kmv_jaccard")

  test("every query key declares a shuffle budget") {
    val keys = SparkEntry.queries.keySet
    assert((keys -- shuffleBudget.keySet).isEmpty,
      s"keys missing a shuffle budget: ${(keys -- shuffleBudget.keySet).toSeq.sorted}")
    assert((shuffleBudget.keySet -- keys).isEmpty,
      s"budgets for removed keys: ${(shuffleBudget.keySet -- keys).toSeq.sorted}")
  }

  /** Keys whose plan legitimately carries no WholeStageCodegen span.
    * Keep this list SHORT and justified — the default contract is
    * that every key's scan/project/filter pipeline runs in generated
    * code. Under AQE the unexecuted plan hides codegen stages, so
    * the audit applies Spark's own CollapseCodegenStages rule to the
    * adaptive initial plan before counting. */
  private val codegenExempt: Set[String] =
    // stream_* return a drained in-memory result — the stateful plan
    // executed INSIDE the operator (audited by StreamPipelineSpec);
    // the drain is a LocalRelation/memory scan with nothing to
    // generate. etl_wap and pipeline_jsonl_roundtrip end in a bare
    // published-file scan with no projection to fuse. q_json_table's
    // json_tuple lowers to Generate, which Spark does not codegen —
    // the one interpreted operator on the board, inherent to the
    // built-in, noted rather than hidden.
    // q_mv_advisor returns the candidates×1 local relation (its
    // grain-count jobs execute eagerly inside advise())
    // sim_kcenter returns the collected k-row pick trajectory (each
    // greedy round's zero-shuffle corpus scan executes eagerly inside
    // the loop; the scans themselves are codegen'd projections)
    Set("q_mv_advisor", "sim_kcenter",
      "etl_wap", "pipeline_jsonl_roundtrip", "q_json_table",
      "stream_bitmap_distinct", "stream_cdc_apply", "stream_dedup",
      "stream_kmv",
      "stream_scd2", "stream_dim_vacuum", "stream_dim_asof",
      "stream_dim_asof_ts",
      "stream_mv_maintain", "stream_mv_retract",
      "stream_enrich", "stream_events", "stream_funnel_timeout",
      "stream_heavy_hitters", "stream_join", "stream_late_data",
      "stream_ohlc", "stream_sessions", "stream_user_state")

  test("every plan keeps a WholeStageCodegen span (hot path stays generated)") {
    import org.apache.spark.sql.execution.{CollapseCodegenStages, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // no stale exemptions: a removed/renamed key must not leave an
    // entry behind that silently exempts a future key of that name
    assert((codegenExempt -- SparkEntry.queries.keySet).isEmpty,
      s"exemptions for removed keys: ${(codegenExempt -- SparkEntry.queries.keySet).toSeq.sorted}")
    val bad = physical.toSeq.filterNot(t => codegenExempt(t._1))
      .filter { case (_, p0) =>
        val inner = p0 match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case other => other
        }
        val collapsed = CollapseCodegenStages()(inner)
        !(collapsed.toString.contains("*(") ||
          collapsed.exists(_.isInstanceOf[WholeStageCodegenExec]))
      }.map(_._1).sorted
    assert(bad.isEmpty, s"no codegen span in: $bad")
  }

  test("no plan contains a cartesian product") {
    val bad = plans.filter(_._2.contains("CartesianProduct")).keys.toSeq.sorted
    assert(bad.isEmpty, s"cartesian products in: $bad")
  }

  test("nested-loop broadcast joins appear only where intended") {
    val bad = plans.filter { case (n, p) =>
      p.contains("BroadcastNestedLoopJoin") && !bnlAllowed(n)
    }.keys.toSeq.sorted
    assert(bad.isEmpty, s"unexpected BroadcastNestedLoopJoin in: $bad")
  }

  test("corpus-sized dedup relations never broadcast") {
    // every join side in the dedup/pipeline family is corpus- or
    // batch-sized (band frames, signature sets, candidate pairs,
    // label frames) — a BroadcastHashJoin anywhere in these plans
    // means Catalyst's post-explode size estimate picked a
    // driver-built broadcast that is fatal at 100 TB. Measured at
    // sf1 before the shuffle_hash hints pinned the shape: the
    // optimizer broadcast the 2.9M-row exploded shingle table
    // (11 s -> 299 s sample swings) and the set-verify frames.
    // text_tfidf joins a VOCABULARY-sized df frame the same way (its
    // only intended broadcast is the 1-row corpus count, a BNLJ).
    // etl_snapshot_diff's two full-outer sides are both whole corpus
    // snapshots — same regime, same ban
    val bad = plans.filter { case (n, p) =>
      // safety_filter is the deliberate exception: its broadcast side
      // is the curated DENYLIST — constant-sized by construction (a
      // policy artifact, not data), the one pipeline join that SHOULD
      // broadcast at any corpus size
      n != "pipeline_safety_filter" &&
      (n.startsWith("dedup_") || n.startsWith("pipeline_") ||
        n == "text_tfidf" || n == "etl_snapshot_diff" ||
        // boilerplate joins the chunk vocabulary and per-source doc
        // counts — at web scale `source` is a domain, so both are
        // corpus-sized; paragraph_dedup's keeper frame is the distinct
        // window vocabulary — same regime
        n == "text_boilerplate" || n == "text_paragraph_dedup" ||
        // knn_join self-joins the assigned corpus on bucket id — both
        // sides are the whole corpus
        n == "sim_knn_join" ||
        // fuzzy_join blocks the corpus against itself; triangle_count
        // self-joins the edge frame — every side corpus-sized
        n == "q_fuzzy_join" || n == "q_triangle_count" ||
        // ngram_lm/collocations join vocab- and vocab²-grain frequency
        // tables — corpus-sized at web scale
        n == "text_ngram_lm" || n == "text_collocations" ||
        // dup_spans joins shingle-grain frames back to the exploded
        // corpus — every side corpus-sized
        n == "text_dup_spans" ||
        // ngram_novelty joins the shingle frontier back to the
        // exploded distinct pairs — both sides corpus-sized
        n == "text_ngram_novelty") &&
        p.contains("BroadcastHashJoin")
    }.keys.toSeq.sorted
    assert(bad.isEmpty, s"broadcast joins in corpus-scale plans: $bad")
  }

  test("no key exceeds its shuffle-exchange budget") {
    val over = plans.flatMap { case (n, p) =>
      val got = shuffles(p)
      if (got > shuffleBudget(n)) Some(s"$n: $got > budget ${shuffleBudget(n)}")
      else None
    }.toSeq.sorted
    assert(over.isEmpty, s"shuffle budget exceeded:\n  ${over.mkString("\n  ")}")
  }

  test("filtered scans push their predicates into the parquet reader") {
    // the keys whose semantics include a selective scan filter — a
    // plan that reads everything and filters afterwards is wrong at
    // any scale (PushedFilters: [] means the reader got nothing)
    val filtered = Seq("etl_where_extract", "q3_topk_join", "q5_star_join")
    filtered.foreach { n =>
      val p = plans(n)
      assert(p.contains("PushedFilters: ["),
        s"$n plan shows no parquet scan with pushdown info")
      assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
        s"$n scan has an EMPTY PushedFilters list — predicate not pushed")
    }
  }
}
