"""Correctness-query modules. Importing this package registers every query
into ``reddit_big_data_spark.registry``.

THE DRIVER WINDOW IS EXPLICIT (round 5, replacing the import-order
juggling ADVICE r4 flagged): ``WINDOW_ORDER`` below lists, by name, the
queries the registry serves FIRST — the driver's correctness gate
verifies the first 50 registrations, so the list's first 50 names ARE
the round's driver window. Names not listed follow in import order;
every query stays covered every round by tests/test_queries_oracle.py,
the local mirror of the driver check. tests/test_round4_ops.py guards
the list against typos/duplicates.

Round-7 window composition (the VERDICT r6 #1 rotation, computed from
CORRECTNESS_r01..r06 like the r6 rotation before it):
1. q128 (new this round: unigram-LM tokenizer) — never driver-green,
   leads unconditionally.
2. The full r4-STALE core cohort: all 27 queries whose last driver
   green is round 4 (q01-q02, q04-q18, q20-q21, q26-q28, q37-q39,
   q47, q49), least-cumulative-greens first — after this round no
   query's last driver row is older than two rounds.
3. q126/q127's second green (their first was r6).
4. Remaining slots: r5-last-green queries by ascending cumulative
   green count (q22..q99 once-green, then q23.. twice-green by name).

Everything past the cap was driver-green in r5 or r6 windows and stays
covered by the local oracle mirror (tests/test_queries_oracle.py)
every round.
"""

from reddit_big_data_spark.queries import (  # noqa: F401
    assembly,
    olsfit,
    subqueries,
    cleaning,
    graph,
    robust,
    mixture,
    layout,
    multijoin,
    modern,
    scd,
    relational,
    temporal,
    windows,
    text,
    dedup,
    similarity,
    approx,
    sentiment,
    sessions,
    events,
    nested,
    cooc,
    cms,
    maintenance,
    udtfq,
    streamingq,
    multimodal,
    mlq,
)

# First 50 names = the driver correctness window for THIS round.
WINDOW_ORDER: list[str] = [
    # -- never driver-green: new this round (unigram-LM tokenizer and
    #    the BPE-vs-unigram comparison composing both artifacts,
    #    quality-based near-dup retention, and the first ORACLE-checked
    #    streaming query)
    "q128_unigram_tokenize",
    "q129_tokenizer_compare",
    "q130_neardup_retention",
    "q131_streaming_windowed_counts",
    "q132_streaming_dedup",
    "q133_streaming_enrich",
    "q134_streaming_attribution",
    "q135_streaming_sketch_rollup",
    # -- the r4-stale core cohort (VERDICT r6 #1): every query whose
    #    LAST driver-green row is round 4 — the reference's §2 heart
    #    (scans, joins, windows, TF-IDF). Ranked by cumulative driver-
    #    green count ascending (least-proven first), then name.
    "q08_histogram_cumulative",
    "q21_shipping_priority",
    "q27_pricing_summary",
    "q28_grouping_sets",
    "q37_repetition_signals",
    "q38_bm25_topk",
    "q39_sequence_packing",
    "q47_stratified_sample",
    "q49_hybrid_rrf",
    "q01_top_groups_by_count",
    "q02_time_slot_histogram",
    "q04_missing_report",
    "q05_broadcast_join_chain",
    "q06_groupby_multi_agg",
    "q07_correlations",
    "q09_tfidf_topk",
    "q10_running_aggregates",
    "q11_topk_per_group",
    "q12_top_n_rows",
    "q13_set_ops",
    "q14_semi_anti_join",
    "q15_rollup",
    "q16_distinct_percentiles",
    "q17_calendar_features",
    "q18_lag_ntile",
    "q20_text_quality",
    "q26_token_counts",
    # -- q126/q127's SECOND green (first was r6; VERDICT r6 #1 names
    #    them explicitly)
    "q126_forecast_revenue",
    "q127_top_supplier",
    # -- the remaining slots: r5-last-green queries ranked by cumulative
    #    driver-green count ascending (the eleven once-green first),
    #    then name
    "q22_approx_distinct_percentiles",
    "q24_summary_stats",
    "q41_lsh_ann",
    "q43_ivf_ann",
    "q59_sketch_rollup",
    "q60_rf_pipeline",
    "q69_cms_heavy_hitters",
    "q88_kmv_rollup",
    "q97_tdigest_rollup",
    "q98_simhash_hamming",
    "q99_weighted_sample",
    "q23_epoch_concat",
    "q25_sentiment",
]
