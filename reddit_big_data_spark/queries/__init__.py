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

Round-8 window composition (the VERDICT r7 #1 rotation, computed from
CORRECTNESS_r01..r07 exactly like the r6/r7 rotations):
1. The THREE never-driver-green r8 additions — q136 (streaming session
   windows), q137 (streaming arbitrary stateful profile), q138
   (fastText-style model-based quality classifier) — lead
   unconditionally.
2. The full r5-STALE cohort: all 37 queries whose last driver-green row
   is round 5 (q03, q19, q29-q36, q40, q42, q44-q46, q48, q50-q58,
   q61-q64, q66-q68, q70-q74), ranked by cumulative driver-green count
   ascending (the seventeen twice-green first, then the twenty
   thrice-green), then name — after this round no registered query's
   last driver row is older than two rounds (the rotation invariant).
3. The remaining 10 slots: r6-last-green queries by ascending cumulative
   green count then name (q100-q109, each once-green) — pre-empting the
   next round's stale pressure.

Everything past the cap was driver-green in r6 or r7 windows and stays
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
    # -- never driver-green: new this round (the two final streaming
    #    registry promotions and the model-based quality classifier)
    "q136_streaming_sessions",
    "q137_streaming_stateful_profile",
    "q138_quality_classifier",
    # -- the r5-stale cohort (VERDICT r7 #1): every query whose LAST
    #    driver-green row is round 5, cumulative-greens ascending
    #    (twice-green seventeen first), then name
    "q52_binary_payloads",
    "q53_sessionization",
    "q54_asof_join",
    "q56_range_join",
    "q57_pivot",
    "q58_cube",
    "q61_string_indexer",
    "q62_class_weights",
    "q63_corr_matrix",
    "q64_salted_agg",
    "q67_nested_struct",
    "q68_porter_stems",
    "q70_pmi_bigrams",
    "q71_salted_join",
    "q72_snapshot_diff",
    "q73_rollup_merge",
    "q74_udtf_tokens",
    #    ... then the twenty thrice-green, by name
    "q03_regex_flags",
    "q19_wordcount_top20",
    "q29_dedup_materialized",
    "q30_exact_dedup",
    "q31_minhash_neardup",
    "q32_simhash",
    "q33_ngram_jaccard",
    "q34_winnowing",
    "q35_dedup_clusters",
    "q36_prefix_simjoin",
    "q40_cosine_topk",
    "q42_label_centroids",
    "q44_cosine_neardup",
    "q45_kmeans",
    "q46_int8_quantization",
    "q48_embedding_dedup_clusters",
    "q50_json_props",
    "q51_tumbling_windows",
    "q55_time_rollup",
    "q66_decontamination",
    # -- remaining slots: the r6-last-green cohort, cumulative greens
    #    ascending (all once-green), then name
    "q100_doc_chunking",
    "q101_lm_perplexity",
    "q102_pq_ann",
    "q103_bpe_merge_pairs",
    "q104_ivfpq_ann",
    "q105_incremental_neardup",
    "q106_group_split",
    "q107_priority_class_counts",
    "q108_order_count_distribution",
    "q109_promo_revenue_share",
]
