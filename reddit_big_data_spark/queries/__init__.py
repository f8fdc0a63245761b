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

Round-6 window composition (the VERDICT r5 #1 rotation):
1. q100-q111 (+ q112-q127, new this round) — the queries with NO
   driver-green row ever (local mirror only until now). They lead
   unconditionally (q126/q127, added last, take the final two slots).
2. The rest of the 50 slots go to the r4-cohort queries ranked by
   cumulative driver-green count (computed from CORRECTNESS_r01..r05):
   the 22 with exactly ONE green (q65, q75-q87, q89-q96).

Everything past the cap was driver-green in rounds 4 AND 5 windows
cumulatively (triple-green: q07, q10-q18, q20, q26) or green in the
round-5 window itself; all stay covered by the local oracle mirror
(tests/test_queries_oracle.py) every round.
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
    multimodal,
    mlq,
)

# First 50 names = the driver correctness window for THIS round.
WINDOW_ORDER: list[str] = [
    # -- never driver-green: the round-5 additions (mirror-green only)
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
    "q110_constraint_audit",
    "q111_langid_ngram",
    # -- never driver-green: new this round (exact substring dedup,
    #    shard manifest, temperature mixture weights, CDC chunk dedup)
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
    # -- one cumulative green (r4 only)
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
    # -- never driver-green: the final r6 additions (TPC-H Q6/Q15
    #    shapes). They take the last two slots from the twice-green
    #    q08/q21 — a first green for a new query outranks a third for an
    #    already-proven one; q08/q21, the rest of the twice-green cohort
    #    (q27/q28/q37-q39/q47/q49) and the triple-green backbone
    #    (q01/q02/q04-q06/q09) all stay covered by the local oracle
    #    mirror every round.
    "q126_forecast_revenue",
    "q127_top_supplier",
]
