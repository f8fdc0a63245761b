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

Round-9 window composition (the VERDICT r8 #5 rotation, computed from
CORRECTNESS_r01..r08 exactly like the r6-r8 rotations):
1. The TWELVE never-driver-green r9 additions — q139 (streaming
   exactly-once foreachBatch sink, the write-side promotion VERDICT r8
   #7 ordered), q140 (DSIR-style importance-resampling weights, the
   data-selection family the LLM-pipeline surface lacked), q141
   (Zipf-slope vocabulary power-law QA), q142 (degree-ordered
   triangle counting), q143 (ordered conversion funnel), q144
   (cohort retention matrix), q145 (co-purchase connected
   components), q146 (streaming LEFT OUTER interval join — the
   eighth streaming pillar), q147 (mergeable-bitmap exact distinct
   rollup), q148 (Markov transition matrix), q149 (PSI distribution
   drift), and q150 (association rules) — lead unconditionally.
2. The full r6-STALE cohort: all 38 queries whose last driver-green row
   is round 6 (q65, q75-q87, q89-q96, q110-q125), ranked by cumulative
   driver-green count ascending (the sixteen once-green q110-q125
   first, then the twenty-two twice-green), then name — after this
   round no registered query's last driver row is older than two rounds
   (the rotation invariant).
3. No pre-emption slots remain: the 12 new queries plus the 38-query
   r6-stale cohort fill the window exactly. Every r7-last-green query
   (q128-q135, q126, q127, q22) falls past the cap at exactly two
   rounds stale — within the invariant. Later r9 additions past the
   cap (q151 rolling time-RANGE window, q152 k-hop BFS, q153 streaming
   sliding windows, q154 Benford audit, q155 chi-square independence,
   q156 two-sample KS, q157 daily ACF, q158 RFM segmentation, q159
   Pareto/ABC concentration, q160 Gini coefficient) are mirror-green
   this round and MUST lead the r10 window as its never-driver-green
   cohort.

Everything past the cap was driver-green in r7 or r8 windows and stays
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
    # -- never driver-green: new this round (the write-side exactly-once
    #    sink promotion VERDICT r8 #7, and the DSIR importance-resampling
    #    data-selection family)
    "q139_streaming_idempotent_sink",
    "q140_dsir_importance",
    "q141_zipf_slope",
    "q142_triangle_count",
    "q143_funnel",
    "q144_cohort_retention",
    "q145_copurchase_components",
    "q146_streaming_outer_attribution",
    "q147_bitmap_distinct_rollup",
    "q148_transition_matrix",
    "q149_psi_drift",
    "q150_association_rules",
    # -- the r6-stale cohort (VERDICT r8 #5): every query whose LAST
    #    driver-green row is round 6, cumulative-greens ascending
    #    (the sixteen once-green first), then name
    "q110_constraint_audit",
    "q111_langid_ngram",
    "q112_substring_dedup",
    "q113_shard_manifest",
    "q114_mixture_weights",
    "q115_cdc_chunks",
    "q116_semdedup",
    "q117_returned_revenue",
    "q118_large_volume_orders",
    "q119_disjunctive_revenue",
    "q120_supplier_diversity",
    "q121_sole_late_supplier",
    "q122_kmv_overlap",
    "q123_bpe_tokenize",
    "q124_novelty_curve",
    "q125_label_noise",
    #    ... then the twenty-two twice-green, by name
    "q65_grouped_ols",
    "q75_pii_redaction",
    "q76_quality_funnel",
    "q77_boilerplate_shingles",
    "q78_exists_late_orders",
    "q79_below_avg_quantity",
    "q80_dormant_high_balance",
    "q81_winsorized_stats",
    "q82_pagerank",
    "q83_zorder_layout",
    "q84_bloom_semi_join",
    "q85_mixture_sample",
    "q86_local_supplier_volume",
    "q87_rank_family",
    "q89_variant_props",
    "q90_mad_outliers",
    "q91_k_per_group_sample",
    "q92_gap_fill",
    "q93_volume_shipping",
    "q94_market_share",
    "q95_scd2_history",
    "q96_fuzzy_name_match",
]
