"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": <total_sec>, "unit": "sec",
 "queries": {"q": sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    QUERIES,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)


def _env_probe(spark) -> dict:
    """Engine-version fingerprint embedded in every bench artifact
    (VERDICT r10 #1a: the r10 red certificates are most plausibly
    grading-environment version drift; this makes each archived run
    carry the versions it measured under). Never raises."""
    try:
        from scripts.env_probe import probe

        return probe(spark)
    except Exception as exc:  # noqa: BLE001 - the probe must never cost
        # the artifact; an unprobeable environment is itself reported
        return {"err": f"{type(exc).__name__}: {exc}"[:200]}

HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "topk_part_type_tokens",
    "join_left_impute_flag",
    "join_multi_hop",
    "topk_per_group",
    "histogram_totalprice",
    "window_hourly_events",
    "sessionize_events",
    "pivot_event_type",
    "clean_normalize_docs",
    "token_frequencies",
    "sentiment_docs",
    "lang_id",
    "quality_scores",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_native",
    "dedup_pipeline_verified",
    "duplicate_spans",
    "tfidf_native_top_terms",
    "asof_last_purchase",
    "dedup_simhash",
    "similarity_cosine_topk",
    "similarity_ann_lsh",
    "multimodal_meta",
    "sentiment_vader_full",
    "maximal_duplicate_spans",
    "dedup_cluster_canonical",
    "contamination_check",
    "pack_sequences",
    "range_join_click_context",
    "hypertable_rollup",
    "nation_pair_volume",
    "having_big_orders",
    "small_quantity_revenue",
    "market_share_region",
    "returned_items_customers",
    "important_parts_share",
    "repeated_ngram_fraction",
    "sentence_chunks",
    "pii_redaction_stats",
    "dedup_edit_distance",
    "heavy_hitter_tokens",
    # round-3 uplift tier
    "c4_line_filter_stats",
    "semdedup_keep_set",
    "bigram_logprob_docs",
    "mixture_token_budget",
    "kmeans_clusters",
    "similarity_ivf_kmeans",
    "curation_funnel",
    "sole_blocking_supplier",
    "boilerplate_line_stats",
    # round-4 uplift tier (quality_classifier_agreement excluded: ML
    # training dominates, covered by its own tests like ml_train_f1)
    "forecast_revenue_change",
    "product_profit_by_nation",
    "redacted_documents",
    "mixture_sample_docs",
    "duplicate_span_removal",
    "dedup_minhash_portable",
    "similarity_hyperplane_lsh",
    "cheapest_supplier_per_part",
    "embedding_quantization",
    "hll_user_rollup",
    "cohort_retention",
    "gapfill_locf_hourly",
    "triangle_count_copurchase",
    "theta_segment_overlap",
    "window_function_suite",
    "keyword_search_postings",
    "association_rules_brands",
    "data_quality_expectations",
    "readability_scores",
    "zipf_heaps_by_source",
    "modern_aggregates_by_type",
    "null_semantics_suite",
    "date_function_suite",
    "string_function_suite",
    "array_function_suite",
    "intersect_repeat_buyers",
    "map_function_suite",
    "priority_class_by_status",
    "supplier_count_by_part_attrs",
    "excess_inventory_suppliers",
    "variant_props_stats",
    "lateral_top_orders",
    "observe_scan_metrics",
    "distinct_users_skewsafe",
    "try_function_suite",
    "session_window_native",
    "argmax_aggregates_by_priority",
    "keyword_search_bm25",
    "recursive_month_series",
    "xml_extract_orders",
    "codec_roundtrip_suite",
    "data_card_by_source",
    "bpe_merge_training",
    "bpe_tokenized_stats",
    # round-4 second-continuation tier
    "scd2_customer_dim",
    "snapshot_diff_customer",
    "incremental_rollup_maintenance",
    "regression_trend_by_priority",
    "weighted_sample_per_source",
    "mad_outliers_by_type",
    "peak_concurrency_by_type",
    "skew_audit_orders_custkey",
    "table_fingerprint_orders",
    "shard_shuffle_plan",
    "kmeans_silhouette",
    # round-7 tier: the wired lakehouse metadata layer (commit-log
    # bound, not scan bound — measures the version-lineage round-trip)
    "lakehouse_time_travel",
    # CDF-fold view maintenance: create + 3 churn-proportional refreshes
    "lakehouse_incremental_rollup",
    # star-schema IVM: delta-join fold (ΔF ⋈ D_new + F_old ⋈ ΔD)
    "lakehouse_star_rollup",
    # bloom-sidecar build (one job over new bytes) + pruned point lookup
    "lakehouse_point_lookup",
    # merge-on-read deletion vectors: 2 DV deletes (no rewrite) + CDF
    # exact-once diffs + compact apply-and-clear
    "lakehouse_deletion_vectors",
    # RESTORE roll-forward: metadata-only undo of a mor delete
    "lakehouse_restore_lineage",
    # UPDATE DML: cow rewrite + mor mask-and-append lineage
    "lakehouse_update_dml",
    # round-7 continuation tier: portable sketches + bounded traversal
    # CMS build is one 4096-key-domain shuffle over the full token stream
    "countmin_token_counts",
    # bounded BFS: frontier expansion over the co-purchase edge list
    "graph_bfs_copurchase",
    # RANGE-frame trailing-90d window over the full orders table
    "rolling_revenue_90d",
    # round-7 second-continuation tier: distributed global-rank family
    # (range-bucketed prefix offsets — no single-partition windows),
    # the bucketed 2-D skyline, positional phrase search, and PQ/ADC
    "pareto_frontier_parts",
    "ewma_daily_revenue",
    "phrase_search_bigram",
    "customer_spend_gini",
    "spend_decile_lift",
    "similarity_pq_adc",
    # temporal AS OF join vs the SCD2 dim, kNN label vote, Markov matrix
    "scd2_pointintime_join",
    "knn_label_vote",
    "markov_transitions_events",
    # char-level entropy quality signal (one (doc,char) shuffle)
    "char_entropy_docs",
    # exact equi-depth histogram via the distributed rank operator
    "equidepth_histogram_lineitem",
    # PPJoin-style lossless prefix-filtered Jaccard self-join
    "dedup_prefix_filter",
    # SPFA-frontier Bellman-Ford over the weighted co-purchase graph
    "graph_weighted_paths",
    # length-blocked levenshtein vocab scan + chi-square independence
    "fuzzy_term_search",
    "chisq_priority_vs_status",
    # governance + drift: k-anonymity classes, closed-form CUSUM
    "k_anonymity_audit",
    "cusum_drift_days",
    # round-7 fourth continuation: experimentation / time-series /
    # marketing / NLP tiers (Benford, Welch t, Mann-Whitney AUC via
    # the distributed prefix-sum, interval union, TWAP, lag-k ACF,
    # Kaplan-Meier, BH pairwise z-tests, HHI, RFM quintiles, RAKE)
    "benford_first_digit",
    "welch_t_test_events",
    "interval_merge_activity",
    "twap_user_value",
    "acf_daily_revenue",
    "auc_value_purchase",
    "km_repeat_purchase",
    "pairwise_type_ztests",
    "hhi_supplier_nation",
    "rfm_segments",
    "rake_keyphrases",
    "image_header_roundtrip",
    # grid-bucketed bounded-radius spatial NN join (3x3 cell probe)
    "spatial_grid_nearest",
    # per-doc TextRank power iteration (3 unrolled damped steps)
    "textrank_sentences",
    # lead-lag daily cross-correlation (one groupBy-day shuffle)
    "xcorr_click_purchase",
    # Mann-Kendall over the day-table pair grid; dow seasonal index
    "mann_kendall_trend",
    "seasonal_dow_index",
    # Shapley attribution: user-mask shuffle + constant coalition algebra
    "shapley_channel_attribution",
    # Markov removal-effect attribution (12-step unrolled iteration)
    "markov_removal_attribution",
    # session path trigrams (reuses the sessionize shuffle)
    "event_path_trigrams",
    # seeded-deterministic DP Laplace release (25-row epilogue)
    "dp_noisy_counts",
    # latency quantiles (one conditional groupBy) + forecast backtest
    "conversion_latency_quantiles",
    "ewma_backtest_mape",
    # classical attribution family (one window pass + groupBy)
    "rule_attribution_models",
    # PSI drift (two scans + 10-row epilogue); CBO join-size audit
    "psi_price_drift",
    "join_size_audit",
    # power-analysis readout (one conditional-moment scan)
    "ab_sample_size",
    # pipeline-integrity audits (fingerprint semi-join; exact flag)
    "split_leakage_audit",
    "simpson_paradox_audit",
    # IR ranking evaluation over the BM25 postings shuffle
    "search_eval_ndcg",
    # per-label half-centroid cosine (one posexplode shuffle)
    "embedding_centroid_drift",
    # Spearman via prefix-sum tie-averaged integer ranks
    "spearman_freq_monetary",
    # Theil-Sen robust slope over the day-pair grid
    "theil_sen_trend",
    # exact KS over two prefix-sum passes of the per-value count table
    "ks_test_click_purchase",
    # MI + Cramér's V from a <=15-cell broadcast contingency table
    "mutual_info_priority_status",
    # leave-one-out target encoding (two map-side-combinable aggs)
    "target_encoding_oof",
    # brute-force different-label cosine top-3 (broadcast anchors)
    "hard_negative_mining",
    # Holt fold over the calendar-bounded daily array
    "holt_linear_revenue",
    # one-scan 15-moment conditional aggregation ANOVA
    "anova_value_by_type",
    # md5-mod-5 fold audit (one groupBy + broadcast)
    "kfold_assignment_balance",
    # 2-round min-label propagation (two key-partitioned shuffles)
    "label_propagation_communities",
    # cumulative-hazard sibling of the KM shuffle
    "nelson_aalen_hazard",
    # integer-exact concordance counts over the day-pair grid
    "kendall_tau_daily",
    # WoE/IV deciles via distributed rank + ntile closed form
    "woe_iv_price_urgent",
    # prefix-sum changepoint scan, TakeOrdered(1) argmax
    "changepoint_split_day",
    # top-1000-vocab broadcast left join over the token stream
    "oov_rate_by_source",
    # 64x Poisson-weight scatter + one groupBy (distributed bootstrap)
    "poisson_bootstrap_ci",
    # one prefix sum + broadcast 1001-edge grid (no per-source window)
    "quantile_normalize_chars",
    # OLS over the bounded top-1000 ln-ln spectrum
    "zipf_slope_tokens",
    # fold-split token counts + one broadcast of the two LM scalars
    "heldout_perplexity_fold",
    # bounded x6 horizon fan-out of the per-customer rollup
    "ltv_cohort_curve",
    # bounded x5 position explode equi-join (sequential patterns)
    "followed_by_pairs",
    # revenue prefix sum + integer threshold cross-multiplication
    "abc_classification_parts",
    # KM shuffle + DECIMAL(38,18) Greenwood running variance
    "km_greenwood_ci",
    # broadcast anchors x part table, anti-join, hash-order top-5
    "negative_sampling_recs",
    # one conditional-moment scan after a broadcast dim join
    "diff_in_diff_revenue",
    # md5-mod-2 arms, 1-df chi-square (integer-exact)
    "srm_check_split",
    # integer R/S blocks over the calendar-bounded daily series
    "hurst_exponent_revenue",
    # one exact-moment scan per source (Kish ESS)
    "effective_sample_size",
    # sessionize shuffle reused; entry-row window
    "bounce_rate_sessions",
    # per-(type, hour) counts + 1-row span scalar
    "fano_burstiness_types",
    # three contingency tables from one exploded scan
    "mi_feature_ranking",
    # integer + welch-quantized moments, one divide
    "seasonality_strength_dow",
    # r8: the grading-window keys that weren't yet benched + the
    # round's one registry addition (COUNT(DISTINCT) maintenance)
    "lakehouse_table_changes",
    "bloom_membership_audit",
    "anomaly_seasonal_events",
    "lakehouse_distinct_rollup",
    # r9: flagship certificate twins (deterministic PQ + rank-1 ALS)
    "similarity_pq_codes",
    "similarity_pq_adc_topk",
    "als_rank1_factors",
    # r13: ml.feature LSH replay twins (JDK-LCG hash chain certified)
    "dedup_minhash_ml_replay",
    "similarity_brp_ml_replay",
    # r13: encoding-anomaly curation audit (scan-speed counters)
    "encoding_anomaly_stats",
]


def _progress_metrics(query, settle_seconds: float) -> dict:
    """Run a started streaming query for ``settle_seconds``, then distill
    recentProgress into throughput + latency numbers (first trigger and
    empty batches excluded — those are warmup/idle, not steady state)."""
    import time as _t

    _t.sleep(settle_seconds)
    progress = [p for p in query.recentProgress if p is not None]
    query.stop()
    try:
        query.awaitTermination(30)
    except Exception as exc:  # noqa: BLE001 - a dead stream is ONE leg's
        # error, not a reason to discard the other legs' metrics
        return {"err": f"{type(exc).__name__}: {exc}"[:200],
                "rows_per_sec": 0.0, "n_triggers": 0}
    rows = [p for p in progress[1:] if p["numInputRows"] > 0]
    if not rows:
        return {"rows_per_sec": 0.0, "trigger_ms_avg": 0.0, "n_triggers": 0}
    rps = [p["processedRowsPerSecond"] for p in rows]
    lat = [p["durationMs"]["triggerExecution"] for p in rows]
    out = {
        "rows_per_sec": round(sum(rps) / len(rps), 1),
        "trigger_ms_avg": round(sum(lat) / len(lat), 1),
        "trigger_ms_max": max(lat),
        "n_triggers": len(rows),
    }
    # output-side throughput: on amplifying operators (the near-dup
    # verify emits ~state-size PAIRS per input doc on duplicate-heavy
    # streams — r13 measured ~1000x) input-relative rows_per_sec
    # understates the work a trigger completes by three orders of
    # magnitude; report what the sink actually absorbed alongside it
    out_rows = sum(
        max(0, p.get("sink", {}).get("numOutputRows", 0) or 0)
        for p in rows
    )
    dur_s = sum(lat) / 1000.0
    if out_rows > 0 and dur_s > 0:
        out["out_rows_per_sec"] = round(out_rows / dur_s, 1)
    return out


def streaming_bench(spark) -> dict:
    """Rate-source throughput + per-trigger latency for the two
    streaming flagships: model scoring (score_stream) and watermarked
    windowed aggregation (windowed_event_counts). Self-terminating;
    noop sink so timings measure the pipeline, not a sink."""
    import tempfile

    from pyspark.sql import functions as F

    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.ml.pipeline import (
        build_sentiment_pipeline,
    )
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
        score_stream,
        windowed_event_counts,
    )

    out: dict[str, dict] = {}

    # --- scoring: tiny model fitted once (setup, untimed), then an
    # unbounded synthetic-text stream through the full clean+score plan
    train = spark.createDataFrame(
        [("good great fine nice", 1.0), ("bad awful poor terrible", 0.0)] * 50,
        "text string, label double",
    )
    model = build_sentiment_pipeline("svm").fit(train)
    words = F.array(*[F.lit(w) for w in "good bad great awful fine poor ok".split()])
    lines = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 20000)
        .load()
        .select(
            F.concat_ws(
                " ",
                F.element_at(words, (F.col("value") % 7 + 1).cast("int")),
                F.element_at(words, (F.col("value") % 5 + 1).cast("int")),
                F.element_at(words, (F.col("value") % 3 + 1).cast("int")),
            ).alias("value")
        )
    )
    q = (
        score_stream(lines, model)
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bench-score-"))
        .trigger(processingTime="1 second")
        .start()
    )
    out["score_stream"] = _progress_metrics(q, 12)

    # --- watermarked tumbling-window aggregation over a rate stream
    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100000)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 5).cast("string").alias("event_type"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )
    agg = windowed_event_counts(
        events, window_duration="10 seconds", watermark="5 seconds"
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bench-window-"))
        .trigger(processingTime="1 second")
        .start()
    )
    out["windowed_event_counts"] = _progress_metrics(q, 12)

    # --- streaming SimHash near-dup detection: synthetic doc stream
    # with a duplicate-heavy distribution (value % 500 -> ~40 docs per
    # family at steady state), full fingerprint + stateful band verify
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.stateful import (
        stream_near_dup_pairs,
    )

    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    docs = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 2000)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        F.array(*[F.lit(w) for w in vocab]),
                        (((F.col("value") % 500) % (i + 3)) % 10 + 1).cast(
                            "int"
                        ),
                    )
                    for i in range(12)
                ],
            ).alias("text"),
        )
    )
    q = (
        stream_near_dup_pairs(docs, max_state_per_band=2000)
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bench-neardup-"))
        .trigger(processingTime="1 second")
        .start()
    )
    # 25 s settle: this stateful pipeline compiles ~5 s of codegen on
    # its first triggers, and _progress_metrics drops the first
    # non-empty trigger as warmup - a 12 s window sometimes left ZERO
    # measured triggers on a loaded host (a 0.0 rows/s artifact, not a
    # regression)
    out["stream_near_dup_pairs"] = _progress_metrics(q, 25)
    return out


# Contention sentinel (r8 verdict "what's wrong" #1): this host's wall
# clocks swing up to ~1.7x with background load even at load-avg ~0, and
# two rounds running stamped their artifact from a contended afternoon —
# every cross-round compare then flagged phantom regressions that the
# idle archives disproved. The floors below are the r8 IDLE run's
# timings (bench_archive/BENCH_LOCAL-3ad74a6f.json) for three cheap,
# pure-relational queries the per-round diffs essentially never touch.
# Before the timed sweep, each sentinel runs twice (min taken); if the
# median ratio vs. its idle floor exceeds SENTINEL_MAX, the run is
# CONTENDED: bench waits and retries on an escalating schedule
# (45/90/150/240 s — r15, after r14's contention outlasted the old
# 3×60 s budget and contaminated the round's headline), then proceeds
# but stamps `contended: true` into both the full artifact and the
# summary line — so a contended stamp is self-identifying and
# compare_bench consumers know to adjudicate against the round's idle
# archive. A post-sweep one-pass re-measure lands in `ratio_post`
# (informational; never feeds the verdict or the floor ratchet).
# Fallback floors (the r8 idle run) — used only when no archive
# qualifies; normally floors self-calibrate from the newest
# uncontended archive (see _sentinel_floors). VERDICT r9 "what's
# wrong" #2: floors pinned to one past run drift stale as per-round
# perf work lands, masking slow creep — so they are now re-derived
# from the newest idle archive at every stamp.
SENTINEL_FLOOR_FALLBACK = {
    "doc_fingerprint": 0.235,
    "dedup_exact": 0.257,
    "skew_audit_orders_custkey": 0.304,
}
SENTINEL_MAX = 1.3
# Host the floors (fallback AND all legacy archives) were measured on.
# ADVICE r9: on any other machine the floors are meaningless — the
# sentinel would burn 3 retries and permanently stamp contended:true
# on genuinely idle runs — so a host mismatch SKIPS the sentinel with
# a note, like the sf-mismatch path.
SENTINEL_CALIBRATION_HOST = "32cpu-x86_64-125GiB"


def host_fingerprint() -> str:
    import platform

    mem_gib = ""
    try:
        with open("/proc/meminfo") as fh:
            kb = int(fh.readline().split()[1])
        mem_gib = f"-{kb // (1024 * 1024)}GiB"
    except (OSError, ValueError, IndexError):
        pass
    return f"{os.cpu_count()}cpu-{platform.machine()}{mem_gib}"


def _sentinel_floors(
    host: str, arch_dir: str | None = None
) -> tuple[dict[str, float], str]:
    """Resolve (floors, source) for this run.

    Priority: SPARK_GRAFT_SENTINEL_FLOORS env (JSON mapping; trusts
    the operator, no host gate) > the per-query LOWER-MEDIAN of the
    ≤3 newest sf0.1 archives stamped ``contended: false`` whose
    recorded host matches this one (legacy archives without a host
    field count as the calibration host) > the pinned fallback
    (calibration host only). Median-of-3, not newest (r11, same fix
    as the streaming floor): a single slow-but-under-threshold run
    would otherwise drag the floor down and mask creep, and a single
    lucky-fast run would ratchet it up and flag every normal run.
    Floors come from each archive's full timed sweep (its
    ``queries`` dict), the idle steady-state measurement of the three
    sentinel queries.
    """
    env = os.environ.get("SPARK_GRAFT_SENTINEL_FLOORS")
    if env:
        floors = {k: float(v) for k, v in json.loads(env).items()}
        if set(floors) != set(SENTINEL_FLOOR_FALLBACK):
            raise ValueError(
                "SPARK_GRAFT_SENTINEL_FLOORS must map exactly the "
                f"sentinel queries {sorted(SENTINEL_FLOOR_FALLBACK)}"
            )
        return floors, "env:SPARK_GRAFT_SENTINEL_FLOORS"
    if arch_dir is None:
        here = os.path.dirname(os.path.abspath(__file__))
        arch_dir = os.path.join(here, "bench_archive")
    candidates = []
    try:
        names = os.listdir(arch_dir)
    except OSError:
        names = []
    for fname in names:
        if not fname.endswith(".json"):
            continue
        path = os.path.join(arch_dir, fname)
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        cont = data.get("contention") or {}
        if (
            isinstance(data.get("sf"), (int, float))
            and abs(data["sf"] - 0.1) < 1e-9
            and cont.get("contended") is False
            and data.get("host", SENTINEL_CALIBRATION_HOST) == host
            and all(
                isinstance(data.get("queries", {}).get(q), (int, float))
                for q in SENTINEL_FLOOR_FALLBACK
            )
        ):
            candidates.append((os.path.getmtime(path), fname, data))
    if candidates:
        newest = sorted(candidates, key=lambda c: c[0], reverse=True)[:3]
        floors = {}
        for q in SENTINEL_FLOOR_FALLBACK:
            vals = sorted(float(d["queries"][q]) for _, _, d in newest)
            floors[q] = vals[(len(vals) - 1) // 2]
        names = ",".join(fname for _, fname, _ in newest)
        return floors, f"median-of-{len(newest)}:[{names}]"
    if host == SENTINEL_CALIBRATION_HOST:
        return dict(SENTINEL_FLOOR_FALLBACK), "pinned-r8-fallback"
    return {}, ""


# Streaming sentinel (VERDICT r10 "what's wrong" #2 / next-step #3):
# the batch sentinels cover relational wall-clock, but r10 stamped a
# -27% windowed_event_counts throughput drift with zero code change
# and had no instrument to call it environmental. This is a
# fixed-shape rate-source → watermarked tumbling window → noop
# micro-stream built INLINE from raw pyspark ops (deliberately not a
# repo function, so repo code changes can never move it); its
# steady-state rows/s is the streaming-side analogue of the batch
# floors. Floor self-calibrates from the newest uncontended archive
# that recorded one; the fallback below is the first idle measurement
# on the calibration host (r11).
STREAM_SENTINEL_FLOOR_FALLBACK = 130_000.0  # rows/s, idle calibration
# (two idle runs 2026-08-16: 137.7k / 127.7k rows/s on the
# calibration host; rate source capped at 100k rows/s input, the
# measured value includes catch-up triggers)
STREAM_SENTINEL_MAX = 1.3  # floor/measured ratio above this = contended


def _stream_sentinel_floor(host: str, arch_dir: str | None = None) -> tuple[float, str]:
    """MEDIAN of the ≤3 newest uncontended sf0.1 archives' recorded
    stream-sentinel throughputs for this host, else the pinned
    fallback (calibration host only), else 0 (skip). Median-of-3, not
    newest: a single anomalously fast run would otherwise become a
    permanent ratchet — every later normal run reads contended, is
    excluded from ever becoming a floor itself, and the verdict never
    self-corrects (r11 review finding)."""
    if arch_dir is None:
        here = os.path.dirname(os.path.abspath(__file__))
        arch_dir = os.path.join(here, "bench_archive")
    candidates = []
    try:
        names = os.listdir(arch_dir)
    except OSError:
        names = []
    for fname in names:
        if not fname.endswith(".json"):
            continue
        path = os.path.join(arch_dir, fname)
        try:
            data = json.load(open(path))
            mtime = os.path.getmtime(path)
        except (OSError, ValueError):
            continue
        cont = data.get("contention") or {}
        rps = (cont.get("stream") or {}).get("rows_per_sec")
        if (
            isinstance(data.get("sf"), (int, float))
            and abs(data["sf"] - 0.1) < 1e-9
            and isinstance(rps, (int, float))
            and rps > 0
            and cont.get("contended") is False
            and not (cont.get("stream") or {}).get("contended", False)
            and data.get("host") == host
        ):
            candidates.append((mtime, float(rps)))
    if candidates:
        newest = sorted(candidates, reverse=True)[:3]
        rps_sorted = sorted(r for _, r in newest)
        # lower-middle on even counts: biasing the floor LOW means a
        # borderline run reads uncontended rather than contended —
        # the conservative direction for a gate whose false positives
        # poison the archive pool
        return rps_sorted[(len(rps_sorted) - 1) // 2], (
            f"median-of-{len(newest)}-newest-uncontended-archives"
        )
    if host == SENTINEL_CALIBRATION_HOST:
        return STREAM_SENTINEL_FLOOR_FALLBACK, "pinned-r11-fallback"
    return 0.0, ""


def _stream_sentinel(spark) -> dict:
    """Measure the fixed-shape micro-stream and judge it against the
    floor. Never raises — the ENTIRE body (floor resolution included:
    a bench_archive rotation between listdir and getmtime raises
    OSError) sits inside the try, because an escaped exception here
    would cost the whole artifact (r11 review finding)."""
    import tempfile

    from pyspark.sql import functions as F

    q = None
    try:
        host = host_fingerprint()
        floor, source = _stream_sentinel_floor(host)
        if not floor:
            return {"rows_per_sec": None, "contended": None,
                    "note": f"no streaming floor for host {host}"}
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 100000)
            .load()
            .select(F.col("timestamp"), (F.col("value") % 7).alias("k"))
        )
        agg = (
            src.withWatermark("timestamp", "5 seconds")
            .groupBy(F.window("timestamp", "10 seconds"), "k")
            .count()
        )
        q = (
            agg.writeStream.outputMode("update")
            .format("noop")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="bench-ssent-")
            )
            .trigger(processingTime="1 second")
            .start()
        )
        m = _progress_metrics(q, 12)
    except Exception as exc:  # noqa: BLE001
        return {"rows_per_sec": None, "contended": None,
                "err": f"{type(exc).__name__}: {exc}"[:200]}
    finally:
        # _progress_metrics stops the stream on its normal path, but an
        # exception between start() and that stop (recentProgress/stop
        # py4j failure) would leave the micro-stream running and
        # contending with the timed sweep it exists to protect — skewing
        # every subsequent measurement in the artifact (r11 ADVICE)
        if q is not None:
            try:
                if q.isActive:
                    q.stop()
            except Exception:  # noqa: BLE001 - best-effort cleanup
                pass
    rps = m.get("rows_per_sec") or 0.0
    ratio = round(floor / rps, 2) if rps > 0 else None
    out = {
        "rows_per_sec": rps,
        "floor": floor,
        "floor_source": source,
        "ratio": ratio,
        "contended": (ratio > STREAM_SENTINEL_MAX)
        if ratio is not None
        else None,
        "n_triggers": m.get("n_triggers"),
    }
    if m.get("err"):
        # a dead micro-stream must explain its 0.0, not hide it
        out["err"] = m["err"]
    return out


def _contention_sentinel(spark, sf_dir: str, sf: float) -> dict:
    if abs(sf - 0.1) > 1e-9:
        # floors were measured at sf0.1; at any other SF the ratio is
        # meaningless — report that instead of a bogus verdict
        return {"ratio": None, "contended": None,
                "note": f"no idle floor recorded for sf={sf}"}
    host = host_fingerprint()
    floors, floor_source = _sentinel_floors(host)
    if not floors:
        return {"ratio": None, "contended": None,
                "note": f"no idle floors for host {host}; set "
                        "SPARK_GRAFT_SENTINEL_FLOORS to calibrate"}
    best_ratio, best_per, attempts = None, None, 0
    # r15 (VERDICT r14 "what's wrong" #1): the r14 driver run stayed
    # contended through all 3×60 s retries and the 385 s sweep executed
    # on a busy host — PERF refused to compare and the round's ground
    # truth was lost. The retry budget now ESCALATES (45/90/150/240 s,
    # ~8.7 min total vs the old 2 min) so transient load has room to
    # drain before the sweep starts; the verdict semantics, floors and
    # threshold are unchanged, and a still-contended run proceeds and
    # stamps `contended: true` exactly as before.
    sleeps = (45, 90, 150, 240)
    for attempt in range(1, len(sleeps) + 2):
        attempts = attempt
        per: dict[str, float] = {}
        for name, floor in floors.items():
            t_best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).collect()
                t_best = min(t_best, time.perf_counter() - t0)
            per[name] = round(t_best, 3)
        ratios = sorted(per[n] / floors[n] for n in per)
        ratio = ratios[len(ratios) // 2]
        if best_ratio is None or ratio < best_ratio:
            best_ratio, best_per = ratio, per
        if ratio <= SENTINEL_MAX:
            break
        if attempt <= len(sleeps):  # no retry follows the last attempt
            time.sleep(sleeps[attempt - 1])
    return {
        "ratio": round(best_ratio, 2),
        "per_query": best_per,
        "attempts": attempts,
        "contended": best_ratio > SENTINEL_MAX,
        "floors": floors,
        "floor_source": floor_source,
        "host": host,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="bench")

    # JVM/codegen warmup outside the timed region: exercise the parquet
    # reader, decimal aggregation, and regex paths once so per-query
    # timings reflect steady state, not first-call JIT
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    warm.selectExpr(
        "cast(sum(cast(n_nationkey as decimal(18,2))) as double)",
        "count(regexp_replace(n_name, '[A-Z]', 'x'))",
    ).collect()
    # touch the big fact table's footers once (schema discovery is
    # setup cost, not query cost)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey"
    ).limit(1).collect()

    try:
        sentinel = _contention_sentinel(spark, sf_dir, sf)
    except Exception as exc:  # noqa: BLE001 - the sentinel must never
        # cost the artifact; an unmeasurable sentinel is reported as such
        sentinel = {"ratio": None, "contended": None,
                    "err": f"{type(exc).__name__}: {exc}"[:200]}
    # streaming-side environmental check (r11): measured before the
    # timed sweep, judged against its own archived floor
    sentinel["stream"] = _stream_sentinel(spark)

    # Per-query fault isolation: one broken query must cost ONE number,
    # not the whole artifact (round 2 lost all 28 measurements to a
    # single AnalysisException). Failures land in "errors"; the JSON
    # line is emitted no matter what.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        try:
            # the registry lookup lives INSIDE the try: a renamed key
            # must cost one error entry, not the entire artifact
            rows = QUERIES[name](spark, sf_dir).collect()
            assert rows is not None
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 - record and keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
    total = round(sum(timings.values()), 3)
    # r15: post-sweep re-measure of the sentinel queries (one pass, no
    # retries) — catches contention that STARTED mid-sweep, which the
    # pre-sweep verdict cannot see. Purely informational: `contended`
    # keeps its pre-sweep meaning (floors self-calibrate from it, and a
    # post-ratio inflated by 210 queries of JVM churn must not poison
    # the archive ratchet); consumers read `ratio_post` to adjudicate.
    floors_post = sentinel.get("floors") or {}
    if floors_post:
        try:
            per_post = {}
            for name, floor in floors_post.items():
                t_best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).collect()
                    t_best = min(t_best, time.perf_counter() - t0)
                per_post[name] = round(t_best, 3)
            rr = sorted(per_post[n] / floors_post[n] for n in per_post)
            sentinel["ratio_post"] = round(rr[len(rr) // 2], 2)
        except Exception:  # noqa: BLE001 - informational only
            sentinel["ratio_post"] = None
    try:
        streaming = streaming_bench(spark)
    except Exception as exc:  # noqa: BLE001
        streaming = {"err": f"{type(exc).__name__}: {exc}"[:300]}
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        # n_ok/n_errors make the headline total honest across rounds: a
        # round where queries errored sums fewer queries, which would
        # otherwise read as a speedup in cross-round comparisons.
        "n_ok": len(timings),
        "n_errors": len(errors),
        "queries": timings,
        "streaming": streaming,
        "sf": sf,
        "contention": sentinel,
        "host": host_fingerprint(),
        "env": _env_probe(spark),
    }
    if errors:
        result["errors"] = errors
    # Teardown BEFORE the metric line: stopping the session with live
    # streaming state stores dumps multi-KB abort stack traces, and the
    # driver keeps only the tail of the output — round 3's artifact lost
    # all 54 measurements that way. Stop every active stream first, then
    # emit the JSON line as the absolute last thing on stdout.
    for q in spark.streams.active:
        try:
            q.stop()
        except Exception:  # noqa: BLE001 - teardown must not kill the metric
            pass
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    sys.stdout.flush()
    print(json.dumps(result))
    # The full line above is ~6 KB at 100+ queries and the driver keeps
    # only the last 2,000 chars of stdout — round 4's artifact clipped
    # mid-dict and parsed as null. Persist the complete result to a
    # committed file, then emit a compact (<500-byte) summary as the
    # ABSOLUTE LAST stdout line so the driver's tail always holds one
    # whole JSON object. scripts/compare_bench.py reads either form.
    # Content-address the full artifact: BENCH_LOCAL.json is overwritten
    # every run, so two rounds' driver wrappers both pointing at it made
    # cross-round comparison silently self-compare (VERDICT r6 #3). The
    # sha-named immutable copy plus the sha in the summary line lets
    # compare_bench.py resolve each round's REAL per-query timings (or
    # detect a stale pointer and fall back to the embedded tail).
    import hashlib

    here = os.path.dirname(os.path.abspath(__file__))
    local_path = os.path.join(here, "BENCH_LOCAL.json")
    blob = json.dumps(result, indent=1)
    full_sha = hashlib.sha256(blob.encode()).hexdigest()[:8]
    try:
        with open(local_path, "w") as fh:
            fh.write(blob)
        # sha-named immutable copies live in bench_archive/ (r7 verdict:
        # 18 of them had accumulated in the repo root)
        archive = os.path.join(here, "bench_archive")
        os.makedirs(archive, exist_ok=True)
        with open(os.path.join(archive, f"BENCH_LOCAL-{full_sha}.json"), "w") as fh:
            fh.write(blob)
    except OSError:
        local_path = None
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    )
    summary = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "n_ok": result["n_ok"],
        "n_errors": result["n_errors"],
        "sf": sf,
        "slowest": slowest,
        "cont": sentinel.get("ratio"),
        "contended": sentinel.get("contended"),
        "full": "BENCH_LOCAL.json" if local_path else None,
        "full_sha": full_sha if local_path else None,
    }
    line = json.dumps(summary)
    assert len(line) < 500, f"summary line grew to {len(line)} bytes"
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
