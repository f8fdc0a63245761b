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

Round-5 window composition (the VERDICT r4 #1 rotation):
1. The 46 queries whose last driver-green row is r2/r3 (q03, q19, the
   whole dedup/similarity/approx/sentiment/sessions/nested/cooc/cms/
   maintenance/udtf/multimodal/ml families) — the events.ts parquet
   encoding changed once between rounds, so a fresh driver pass is the
   only proof against testdata drift.
2. q88 (KMV rollup) — re-contracted this round from rows-only to an
   error-bound-boolean oracle; needs its first driver-green row.
3. q97 (t-digest rollup), q98 (simhash hamming join) and q99 (weighted
   sampling) — new this round; slot 50 goes to q99's first green rather
   than a discretionary repeat.

Everything past the cap was driver-green in round 4, except the
queries new in round 5 (q100 doc chunking, q101 LM perplexity,
q102/q104 PQ and IVF-PQ ANN, q103 BPE merge pairs, q105 incremental
dedup, q106 group split, q107-q109 TPC-H Q12/Q13/Q14 shapes, q110
constraint audit), which are covered by the local oracle mirror now
and queue for driver window slots next round.
"""

from reddit_big_data_spark.queries import (  # noqa: F401
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
    multimodal,
    mlq,
)

# First 50 names = the driver correctness window for THIS round.
WINDOW_ORDER: list[str] = [
    # -- text tail: green r2/r3, outside the r4 window
    "q03_regex_flags",
    "q19_wordcount_top20",
    # -- dedup family (r2/r3)
    "q30_exact_dedup",
    "q31_minhash_neardup",
    "q32_simhash",
    "q33_ngram_jaccard",
    "q34_winnowing",
    "q36_prefix_simjoin",
    "q35_dedup_clusters",
    "q29_dedup_materialized",
    "q66_decontamination",
    # -- similarity family (r2/r3; q41/q43 re-contracted this round)
    "q40_cosine_topk",
    "q41_lsh_ann",
    "q42_label_centroids",
    "q43_ivf_ann",
    "q44_cosine_neardup",
    "q45_kmeans",
    "q46_int8_quantization",
    "q48_embedding_dedup_clusters",
    # -- approx / temporal-adjacent (r2/r3)
    "q22_approx_distinct_percentiles",
    "q23_epoch_concat",
    "q24_summary_stats",
    "q57_pivot",
    "q58_cube",
    "q25_sentiment",
    # -- sessions / temporal joins (r2/r3)
    "q53_sessionization",
    "q54_asof_join",
    "q56_range_join",
    # -- nested / events (r2/r3)
    "q50_json_props",
    "q51_tumbling_windows",
    "q55_time_rollup",
    "q59_sketch_rollup",
    "q64_salted_agg",
    "q67_nested_struct",
    # -- text ops / cooc / cms (r2/r3)
    "q68_porter_stems",
    "q70_pmi_bigrams",
    "q69_cms_heavy_hitters",
    # -- maintenance / udtf / multimodal (r2/r3)
    "q71_salted_join",
    "q72_snapshot_diff",
    "q73_rollup_merge",
    "q74_udtf_tokens",
    "q52_binary_payloads",
    # -- ml family (r2/r3; q60 gains its snapshot oracle this round)
    "q61_string_indexer",
    "q62_class_weights",
    "q63_corr_matrix",
    "q60_rf_pipeline",
    # -- re-contracted + new this round
    "q88_kmv_rollup",
    "q97_tdigest_rollup",
    "q98_simhash_hamming",
    "q99_weighted_sample",
]
