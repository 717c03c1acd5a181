package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SimpleMode

/** Plan-shape regression guards: the scale properties SURVEY §5 promises
  * must be visible in the physical plan, not just intended. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // memoized: constructing a query can be expensive (the dedup pair
  // generators eagerly checkpoint their index, the ANN queries count the
  // vector table), and several tests read every plan
  private val dfCache =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]
  private def dfOf(name: String): org.apache.spark.sql.DataFrame =
    dfCache.getOrElseUpdate(name,
      SparkEntry.queries(name)(spark, TestSpark.sf))
  private val planCache = scala.collection.mutable.Map.empty[String, String]
  private def planOf(name: String): String = planCache.getOrElseUpdate(name,
    dfOf(name).queryExecution.explainString(SimpleMode))

  // Deliberate tiny-side broadcast nested-loop joins:
  //  - sim_topk_brute / sim_ann_search: single-row query vector vs all
  //    rows (that IS the brute-force / candidate scan),
  //  - sim_ivf_cells / sim_ivf_search / sim_ivf_multiprobe: every vector
  //    vs the 8 broadcast seed centroids (that IS the IVF assignment),
  //  - text_tfidf / text_familiarity: 1-row corpus-size scalar joined to
  //    every (doc, token) / per-doc rollup,
  //  - q_scalar_subquery / sim_ivf_train2: 1-row global-average scalar /
  //    8 broadcast centroids under every probe row (the scalar-subquery
  //    plan Spark itself produces).
  //  - sim_pq_encode / sim_pq_search: every vector vs the 16 broadcast
  //    codewords (that IS the PQ assignment / ADC table build)
  //  - sim_hamming: 1-row broadcast probe fingerprint vs every candidate
  //    (the compact-code twin of sim_topk_brute's query vector)
  private val allowNestedLoop = Set("sim_topk_brute", "sim_range_search",
    "sim_ann_search", "sim_ivf_cells", "sim_ivf_search", "sim_ivf_multiprobe",
    "sim_ivf_train", "sim_ivf_train2", "text_tfidf", "text_familiarity",
    "q_scalar_subquery", "sim_pq_encode", "sim_pq_search", "sim_ivf_pq_search",
    "sim_hamming",
    //  - events_rfm / etl_data_drift: 1-row corpus max-timestamp /
    //    midpoint scalar broadcast under every event row (the
    //    q_scalar_subquery shape)
    "events_rfm", "etl_data_drift",
    //  - events_psi_ingredients: the same 1-row corpus time-midpoint
    //    scalar broadcast as etl_data_drift
    "events_psi_ingredients",
    //  - events_value_tail: 1-row observed-max scalar under the per-event
    //    threshold sweep (the events_rfm shape)
    "events_value_tail",
    //  - events_revenue_hhi: 1-row revenue-total scalar under the
    //    per-user share frame (the events_rfm shape)
    "events_revenue_hhi",
    //  - text_heaps_curve: 1-row max-doc-id scalar broadcast under the
    //    per-token first-seen and per-decile rollups (the events_rfm
    //    shape)
    "text_heaps_curve",
    //  - etl_cascade_impact / events_haar_energy: 1-row × 1-row census
    //    scalar crosses (the graph_modularity class) / 1-row min-day
    //    scalar broadcast under the day-spine rollup
    "etl_cascade_impact", "events_haar_energy",
    //  - events_hte_bands: the etl_data_drift 1-row corpus time-midpoint
    //    scalar broadcast under the per-user rollup
    "events_hte_bands",
    //  - sim_ood_bands: every vector vs the 8 broadcast seed centroids
    //    (the sim_ivf_cells assignment shape)
    "sim_ood_bands",
    //  - events_markov_stationary: 1-row type-count scalar under the
    //    ≤types-row uniform start (the q_scalar_subquery shape)
    "events_markov_stationary",
    //  - text_auto_stopwords: 1-row corpus-doc-count scalar under the
    //    vocabulary-bounded df rollup (the q_scalar_subquery shape)
    "text_auto_stopwords",
    //  - sim_sq8_search: 1-row broadcast query codes vs every candidate's
    //    codes (the compact-code twin of sim_topk_brute's query vector)
    "sim_sq8_search",
    //  - sim_recall_audit / etl_key_skew: 1-row audit-count / total-count
    //    scalar broadcast under a constant-size result (the
    //    q_scalar_subquery shape)
    "sim_recall_audit", "etl_key_skew",
    //  - sim_ivf_probe_curve: the sim_recall_audit shape per sweep point
    //    (1-row candidate-count scalar under the 1-row recall rollup)
    "sim_ivf_probe_curve",
    //  - sim_ivf_auto_recall / sim_ivf_auto_probe_curve: the
    //    sim_recall_audit shape against the scale-adaptive index —
    //    1-row broadcast query vector under the exact scoring scan,
    //    then 1-row count scalars crossed into each recall row
    "sim_ivf_auto_recall", "sim_ivf_auto_probe_curve",
    //  - sim_graph_search: the query-vector scoring pass is the
    //    sim_topk_brute 1-row broadcast; each hop is a 1-row frontier
    //    broadcast against the edge list
    "sim_graph_search",
    //  - corpus_epoch_plan: 1-row corpus-total scalar broadcast under the
    //    8-row batch rollup
    "corpus_epoch_plan",
    //  - events_seasonality / events_pareto: 1-row total scalar broadcast
    //    under a ≤168-row / 10-row rollup (the q_scalar_subquery shape)
    "events_seasonality", "events_pareto",
    //  - sim_prefix_rerank: 1-row broadcast query vector vs every
    //    candidate (the sim_topk_brute shape, twice)
    "sim_prefix_rerank",
    //  - events_stickiness: tiny day spine (1 row/day) broadcast over the
    //    deduped user-day set with a 7-day band — fan-out ≤ 7 per
    //    user-day, never a cross product
    "events_stickiness",
    //  - sim_cluster_purity: every vector vs the 8 broadcast IVF seeds
    //    (the sim_ivf_cells assignment shape)
    "sim_cluster_purity",
    //  - corpus_source_mix: 1-row corpus-token-total scalar broadcast
    //    under the source×lang rollup (the q_scalar_subquery shape)
    "corpus_source_mix",
    //  - q_contingency: 1-row grand-total scalar broadcast under the
    //    ≤ flags×statuses cell table
    "q_contingency",
    //  - events_velocity: 1-row max-timestamp scalar broadcast under the
    //    per-user horizon rollup (the events_rfm shape)
    "events_velocity",
    //  - etl_bucket_balance: 1-row total scalar broadcast under the
    //    32-row bucket rollup
    "etl_bucket_balance",
    //  - round-8 scalar-subquery shapes: 1-row totals / global-max
    //    broadcast under a bounded rollup (corpus_lang_balance,
    //    etl_freshness, q_hist_equidepth, text_zipf_audit: ≤ langs /
    //    types / 4 buckets / 30 rows) or per-config stat row
    //    (dedup_lsh_tune: 3 rows)
    "corpus_lang_balance", "etl_freshness", "q_hist_equidepth",
    "text_zipf_audit", "dedup_lsh_tune",
    //  - sim_batch_topk: every corpus vector vs the 8 broadcast query
    //    vectors (the sim_ivf_cells assignment shape; that IS the batch)
    "sim_batch_topk",
    //  - sim_mrr_batch: the exact-truth pass is the same corpus × 8
    //    broadcast query vectors as sim_batch_topk; the ANN pass is a
    //    keyed bucket join
    "sim_mrr_batch",
    //  - text_bigram_coverage / text_hapax_rate: 1-row corpus-volume
    //    scalar broadcast under a 4-row rollup (the q_scalar_subquery
    //    shape)
    "text_bigram_coverage", "text_hapax_rate",
    //  - sim_recall_curve: the sim_recall_audit shape (1-row query vector
    //    vs all rows), three constant-size re-counts of one 10x10 join
    "sim_recall_curve",
    //  - sim_pq_distortion / sim_pq_code_balance: every vector vs the 16
    //    broadcast codewords (the sim_pq_encode assignment shape they
    //    audit)
    "sim_pq_distortion", "sim_pq_code_balance",
    //  - events_top_coverage: 1-row totals scalar broadcast under the
    //    4-row threshold rollup (the events_pareto shape)
    "events_top_coverage",
    //  - round-9 scalar/tiny-side broadcast shapes: etl_ttl_sweep
    //    (1-row corpus max-timestamp under every event — the events_rfm
    //    shape), events_autocorr (2-row lag table under the bounded
    //    daily rollup), events_changepoint (1-row totals under the
    //    bounded day spine), sim_rank_corr (1-row query vector / query
    //    codes vs the corpus scan and the 32-row exact top-k — the
    //    sim_topk_brute + sim_sq8_search shapes composed)
    "etl_ttl_sweep", "events_autocorr", "events_changepoint",
    "sim_rank_corr",
    //  - corpus_split_leakage: 1-row leakage scalar broadcast under the
    //    2-row split rollup (the q_scalar_subquery shape)
    "corpus_split_leakage",
    //  - round-9b scalar/tiny-side broadcast shapes: q22_idle_customers
    //    (1-row mean-balance scalar under the customer scan — the
    //    q_scalar_subquery shape), graph_pagerank (1-row node-count
    //    scalar under each iteration's per-node rollup), q_cms_heavy
    //    (1-row stream-total under the 10-row candidate rollup),
    //    events_type_affinity / text_cooccur_lift (1-row population
    //    count under a bounded pair rollup: ≤10 type pairs / ≤C(30,2)
    //    token pairs), sim_l2_topk (1-row broadcast query vector vs
    //    every candidate — the sim_topk_brute shape)
    "q22_idle_customers", "graph_pagerank", "q_cms_heavy",
    "events_type_affinity", "text_cooccur_lift", "sim_l2_topk",
    //  - q15_top_supplier: 1-row max-revenue scalar broadcast under the
    //    bounded per-supplier rollup (the q_scalar_subquery shape)
    "q15_top_supplier",
    //  - q11_inventory_share: 1-row inventory-grand-total scalar
    //    broadcast under the per-part rollup (the HAVING-vs-global-
    //    scalar shape)
    "q11_inventory_share",
    //  - sim_mips_topk: 1-row broadcast query vector vs every candidate
    //    (the sim_topk_brute shape, raw-dot metric)
    "sim_mips_topk",
    //  - graph_pagerank_seeded: 1-row seed-count scalar broadcast under
    //    each iteration's sparse rank frame (the graph_pagerank shape)
    "graph_pagerank_seeded",
    //  - graph_pagerank_residual: the same 1-row node-count scalar
    //    broadcasts as graph_pagerank, once per traced iteration
    "graph_pagerank_residual",
    //  - graph_triangles: two 1-row census scalars (wedge / triangle
    //    counts) broadcast under the 1-row edge count
    //  - q_rel_division: 1-row distinct-type-count divisor broadcast
    //    under the per-(user, month) rollup (the q_scalar_subquery shape)
    "graph_triangles", "q_rel_division",
    //  - sim_centroid_drift: every vector vs the 8 broadcast centroids,
    //    twice (the sim_ivf_train2 assignment shape it audits)
    //  - text_positional_bias: 10-row broadcast top-token table under
    //    the corpus scan (the sim_batch_topk shape)
    "sim_centroid_drift", "text_positional_bias",
    //  - events_benford: 1-row order-count scalar broadcast under the
    //    9-row digit rollup (the q_scalar_subquery shape)
    //  - graph_kcore_peel: per-round 1-row surviving-edge count broadcast
    //    under the 1-row peel summary (3 rounds of the census shape)
    //  - text_source_divergence: 50-row broadcast vocab table under the
    //    ≤sources-row totals frame (bounded dimension fill — the
    //    text_positional_bias shape)
    "events_benford", "graph_kcore_peel", "text_source_divergence",
    //  - dedup_simhash_bits: 1-row fingerprint-count scalar broadcast
    //    under the 16-row bit rollup (the q_scalar_subquery shape)
    "dedup_simhash_bits",
    //  - sim_power_iteration: 1-row max-|component| scalar broadcast
    //    under each 64-row re-scaled vector (twice — one per step)
    "sim_power_iteration",
    //  - sim_power_convergence: wraps the sim_power_iteration trace, so
    //    it carries the same 1-row max-|component| scalar broadcasts
    "sim_power_convergence",
    //  - q_bitmap_distinct: 1-row global-exact-distinct scalar broadcast
    //    under the 1-row merged-bitmap count (the census shape)
    "q_bitmap_distinct",
    //  - sim_filtered_topk: 1-row broadcast query vector vs the
    //    label-filtered candidate scan (the sim_topk_brute shape)
    //  - events_mix_shift: bounded type list broadcast under the day
    //    spine (dimension fill — the text_source_divergence shape)
    "sim_filtered_topk", "events_mix_shift",
    //  - events_did_ingredients: 1-row time-midpoint scalar broadcast
    //    under the purchase scan (the events_rfm shape)
    "events_did_ingredients",
    //  - graph_modularity: 1-row edge-count scalar broadcast under the
    //    1-row ingredients rollup (the census shape)
    "graph_modularity",
    //  - text_template_fps: 1-row doc-count scalar broadcast under the
    //    20-row top-fingerprint table (the q_scalar_subquery shape)
    "text_template_fps",
    //  - graph_ktruss: per-round 1-row surviving-edge count broadcast
    //    under the 1-row round summary (the graph_kcore_peel census
    //    shape — 2 rounds of 1-row × 1-row scalar crosses)
    "graph_ktruss",
    //  - sim_mmr_rerank: 1-row broadcast query vector vs every candidate
    //    (the sim_topk_brute shape) + the 8×8 pairwise-sim join over the
    //    checkpointed shortlist (bounded by the shortlist size)
    "sim_mmr_rerank",
    //  - q_hll_sketch / q_kmv_distinct / etl_pseudonymize: 1-row
    //    audit-scalar broadcasts under 1-row summaries (the census shape)
    "q_hll_sketch", "q_kmv_distinct", "etl_pseudonymize",
    //  - sim_ivf_rebalance: every vector vs the 8 broadcast IVF seeds
    //    (the sim_ivf_cells assignment shape it maintains)
    "sim_ivf_rebalance",
    //  - q_bloom_fpr_audit: three 1-row audit scalars (bit fill, probe
    //    count, miss count) broadcast under the 1-row key count (the
    //    census shape); the filter/probe joins themselves are hash joins
    "q_bloom_fpr_audit",
    //  - sim_pq_adc_sdc: every vector vs the 16 broadcast codewords
    //    (the sim_pq_encode assignment shape) + the 1-row query vector /
    //    16-row codebook LUT builds (the sim_pq_search shape, twice)
    "sim_pq_adc_sdc",
    //  - sim_mrl_recall: 1-row broadcast query vector vs every candidate
    //    (the sim_topk_brute shape; all four prefix sims in one pass)
    "sim_mrl_recall",
    //  - q_kmv_set_ops / dedup_pr_audit: 1-row sketch-stat / count
    //    scalars broadcast under a 1-row summary (the census shape)
    "q_kmv_set_ops", "dedup_pr_audit",
    //  - sim_ivfpq_recall: the sim_ivf_pq_search composition (broadcast
    //    seeds/LUT/query-cell) + 1-row hit-count scalars under the
    //    1-row summary (the census shape)
    "sim_ivfpq_recall",
    //  - events_cuped: 1-row time-midpoint scalar broadcast under the
    //    events scan (the events_did_ingredients shape)
    "events_cuped",
    //  - text_nb_train: two 1-row class-total scalars broadcast under
    //    the 16-row bucket rollup (the q_scalar_subquery shape)
    "text_nb_train",
    //  - sim_seed_quality: 1-row balance scalars under the 1-row audit
    //    rollup only (the census shape) — the seed assignment itself is
    //    literal-codeword expressions now, not a broadcast cross
    "sim_seed_quality",
    //  - etl_ttl_eviction_plan: 1-row watermark scalar broadcast under
    //    the events scan (the events_cuped shape)
    "etl_ttl_eviction_plan",
    //  - events_wow_growth: 1-row max-date scalar broadcast under the
    //    events scan (the events_cuped shape)
    "events_wow_growth",
    //  - sim_ivf_scan_cost: 1-row corpus-total scalar broadcast under
    //    the ≤4-row probe-plan frame (the q_scalar_subquery shape)
    "sim_ivf_scan_cost",
    //  - text_bm25_lite: 1-row document-count scalar broadcast under
    //    the ≤3-term tf frame (the q_scalar_subquery shape)
    "text_bm25_lite",
    //  - dedup_snm_sweep: 1-row truth-count scalar broadcast under the
    //    ≤4-row per-w rollup (the census shape)
    "dedup_snm_sweep",
    //  - sim_routing_margin: every vector vs the broadcast ≤4096-row
    //    trained centroid table (the sim_ivf_cells assignment shape —
    //    the same lloydRankedArr cross the probe-curve family rides)
    "sim_routing_margin",
    //  - sim_ivf_pq_rerank: 1-row quantized-query broadcast under the
    //    ≤40-row ADC-shortlist refine semi-join (the q_scalar_subquery
    //    shape — raw rows after the coarse+code tiers are O(shortlist))
    "sim_ivf_pq_rerank")

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"plan of $name has no cartesian product / stray nested-loop join") {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
      if (!allowNestedLoop(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$plan")
    }
  }

  // Queries whose plan contains a Window WITHOUT partitioning — the
  // "Moving all data to a single partition" class. Legal ONLY above a
  // frame with a documented row bound (an aggregate / limit that shrinks
  // the data to spine size first); the assertion below keeps the list
  // honest the same way the BNLJ allowlist does. Grouped by the bound:
  private val allowUnpartitionedWindow: Set[String] = Set(
    // DAY-SPINE bound (≤ one row per day — the cumulative/lag window of
    // a daily series runs over the spine, never the events):
    "etl_backfill_plan", "etl_data_drift", "events_burst",
    "events_changepoint", "events_cusum", "events_day_over_day",
    "events_ewma", "events_forecast_naive", "events_psi_ingredients",
    "events_slo_burn", "events_sprt", "events_stl_lite",
    "events_user_growth", "q_backlog",
    //   (events_sliding_users: HOUR-spine bound — the rolling-24h sum
    //    and the island-delta cumulative both run over hour-grain
    //    rollups, ≤ one row per hour of the time span)
    "events_sliding_users",
    // TYPE/BAND/BUCKET-TABLE bound (≤ types × bands rows after the
    // rollup: quality bands, strata, temperature buckets, run-length
    // blocks, duration deciles):
    "corpus_strata_alloc", "corpus_temperature_mix", "events_anomaly_runs",
    "events_pareto", "events_survival", "events_top_coverage",
    "q_hist_equidepth", "etl_feature_staleness",
    // BLOCK-TABLE bound — the house two-phase prefix sum: a per-block
    // pre-aggregate (bounded by the value-block grid) feeds the only
    // unpartitioned window; per-row ranks ride partitioned windows:
    "corpus_pack_budget", "corpus_pack_split", "corpus_shard_manifest",
    "mm_shard_plan", "dedup_sorted_neighborhood", "etl_seq_gaps",
    "events_concurrency", "q_skyline",
    //   (dedup_snm_sweep: same SNM boundary carry as
    //    dedup_sorted_neighborhood — the global re-sort runs over the
    //    ≤2w·256-row first/last-rows-per-block frame, one per lead)
    "dedup_snm_sweep",
    // DIM/CELL/TOP-K bound (64 dims, 2080 Gram cells, ≤cells IVF cells,
    // 16-codeword PQ tables, 32-row rank-correlation shortlist):
    "sim_opq_gain", "sim_opq_permute", "sim_opq_rotate", "sim_pq_adc_sdc",
    "sim_ivf_rebalance", "sim_ivf_scan_cost", "sim_rank_corr",
    // VOCAB/HEAVY-HITTER bound (top-K limit lowers to TakeOrdered before
    // the window; the window sees ≤K rows / the ≤3-row order table /
    // the ≤10-decile curve):
    "text_vocab_build", "text_token_ids", "text_zipf_audit",
    "text_heaps_curve", "text_bigram_coverage", "text_backoff_coverage")

  test("every unpartitioned Window sits above a documented bounded frame") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val n = dfOf(name).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0 && !allowUnpartitionedWindow.contains(name)) Some(name -> n)
      else None
    }
    assert(offenders.isEmpty,
      s"unjustified single-partition windows in: ${offenders.mkString(", ")}")
  }

  test("per-query scan counts stay at their audited minima") {
    // regression guard for the round-3 scan-elimination work, enforced
    // PER QUERY: the dedup pair generators build their index behind a
    // checkpoint (≤1 scan in the final plan), the IVF/star/dispatch
    // queries read exactly their join arity, everything else ≤3.
    val caps = Map(
      "q5_multi_join" -> 6,            // 6-table star join
      "sim_ivf_search" -> 4,           // ranked cells ×2 (probe side pruned)
      "sim_ivf_multiprobe" -> 4,
      "etl_changelog_dispatch" -> 4,   // events ×2 (pushdown-pruned) + 2 entities
      "text_tfidf" -> 3,
      "q3_join_agg" -> 3,
      "etl_fk_orphans" -> 6,     // 4 FK edges, each CHILD table read once
                                 // (lineitem 1× for its 3 edges, orders as
                                 // child + as parent-key source, 3 dims)
      "text_edit_distance" -> 4, // LSH pair gen (checkpoint-fed) + the
                                 // text join's a-side and b-side scans
      "q7_trade_volume" -> 6,    // 6-table star join (nation read twice:
                                 // supplier leg + customer leg)
      "q8_market_share" -> 4,    // lineitem + orders + supplier + nation
      "sim_rank_corr" -> 4,      // exact side (corpus + 1-row query) and
                                 // SQ8 side (codes + 1-row query codes)
                                 // each scan the vector table — re-scans
                                 // beat materializing a corpus-sized
                                 // checkpoint just to dedup them
      "q9_profit" -> 5,          // 5-table star join (fact + 4 dims)
      "q10_returns" -> 4,        // 4-table star join (fact + 3 dims)
      "q20_excess_stock" -> 6,   // lineitem twice (derived partsupp +
                                 // the shipped-qty rollup) + part +
                                 // supplier + nation + region
      "etl_fd_discovery" -> 4,   // 4 FD candidates over 3 tables: lineitem
                                 // read once per candidate (different
                                 // determinant keys ⇒ different shuffles;
                                 // a shared scan would buy nothing)
      "etl_pk_audit" -> 7,       // seven tables, ONE scan each — the
                                 // catalog cover sheet's audited minimum
      "etl_cdc_collapse" -> 5    // orders under 3 snapshot roles: c1 reads
                                 // prev+mid, c2 reads mid+curr, the
                                 // resurrect compare reads prev again — at
                                 // production scale each role is a
                                 // DIFFERENT physical snapshot, so the 5
                                 // logical scans are inherent to the op
    ).withDefaultValue(3)
    val checkpointed = Set("dedup_minhash_lsh", "dedup_ngram_jaccard",
      "dedup_clusters", "dedup_containment", "dedup_threshold_sweep")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val scans = "Scan parquet".r.findAllIn(planOf(name)).size
      val cap = if (checkpointed(name)) 1 else caps(name)
      assert(scans <= cap, s"$name scans parquet $scans x (audited cap $cap)")
    }
  }

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  // Pushdown manifest: every query whose leading operator is a selective
  // source filter declares the PushedFilters fragments that must appear
  // in its FormattedMode plan — at 100 TB the difference is reading row
  // groups vs reading the table. One loop, one declared manifest; adding
  // a selective query = adding a line here.
  // (q2_min_cost_supp's part scan sits behind the eager candidate
  // checkpoint, so its final plan is a LogicalRDD join — the part-scan
  // pushdown property is covered by q16, which shares the shape.)
  private val pushdownManifest: Map[String, Seq[String]] = Map(
    // selective filter + narrow projection (the canonical shape)
    "q_filter_pushdown" -> Seq("PushedFilters:",
      "GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity"),
    // TPC-H Q6: the pure predicate-pushdown revenue query
    "q6_selective_sum" -> Seq("PushedFilters:",
      "GreaterThanOrEqual(l_discount,0.04", "LessThanOrEqual(l_discount,0.06",
      "LessThan(l_quantity,24"),
    // TPC-H Q10: returned lines only
    "q10_returns" -> Seq("EqualTo(l_returnflag,R)"),
    // TPC-H Q4: year(o_orderdate) is not a source filter by itself, but
    // the IsNotNull prunes must reach both scans
    "q4_priority_exists" -> Seq("IsNotNull(o_orderdate)", "IsNotNull(l_orderkey)"),
    // TPC-H Q19: Catalyst extracts the common p_size >= 1 bound AND
    // pushes the whole brand/size disjunction as one Or tree
    "q19_dnf_pred" -> Seq("GreaterThanOrEqual(p_size,1)",
      "And(EqualTo(p_brand,Brand#12),LessThanOrEqual(p_size,20))"),
    // TPC-H Q16: brand/type/size exclusions ride the part scan
    "q16_supp_part_count" -> Seq("Not(EqualTo(p_brand,Brand#12))",
      "Not(EqualTo(p_type,PROMO))", "In(p_size,"),
    // dimension-filter star joins: the segment / region predicates must
    // land in their dim scans
    "q3_join_agg" -> Seq("EqualTo(c_mktsegment,BUILDING)"),
    "q5_multi_join" -> Seq("EqualTo(r_name,ASIA)"),
    // GDPR-erasure audit: the ts prune rides the events scan
    "etl_erasure_audit" -> Seq("IsNotNull(ts)"),
    // filtered ANN: the label predicate must PRE-filter at the scan
    // (reading every vector then post-filtering is the 100 TB mistake)
    "sim_filtered_topk" -> Seq("EqualTo(label,3)", "Not(EqualTo(vec_id,0))"))

  pushdownManifest.toSeq.sortBy(_._1).foreach { case (name, frags) =>
    test(s"$name pushes its selective predicates into the scan") {
      val plan = formatted(name)
      frags.foreach(f => assert(plan.contains(f), s"missing '$f' in:\n$plan"))
    }
  }

  test("q16_supp_part_count runs NOT IN as a broadcast left-anti join") {
    val plan = planOf("q16_supp_part_count")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti join:\n$plan")
  }

  test("q5_multi_join broadcasts all five dimension sides") {
    val plan = planOf("q5_multi_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts == 5, s"expected 5 broadcast joins, got $broadcasts:\n$plan")
  }

  test("narrow projections prune the scan schema") {
    val plan = SparkEntry.queries("q_topk")(spark, TestSpark.sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // only the three needed columns are read
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double,o_orderdate:timestamp"))
  }
}
