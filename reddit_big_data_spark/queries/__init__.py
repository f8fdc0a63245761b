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

THE ROTATION INVARIANT (restated honestly in round 10, VERDICT r9 #2):
with R registered queries and a 50-slot window, "every query
driver-green within the last K rounds" needs (K+1)*50 >= R. At 160+
queries the old <=2-round promise (capacity 150) is arithmetically
impossible; the contract from round 10 onward is:

  (a) <=3-ROUND STALENESS: every registered query's last driver-green
      row is at most three rounds old (window capacity 4*50 = 200;
      registry growth is budgeted against that ceiling — past ~190
      registered queries, consolidation precedes new breadth);
  (b) MIRROR-GREEN EVERY ROUND: every registered query — in or out of
      the window — is hash-verified against its DuckDB oracle every
      round by tests/test_queries_oracle.py, the local mirror of the
      driver's t2 check;
  (c) NEVER-GREEN FIRST: queries with no driver-green row ever lead
      the next window unconditionally.

THE WINDOW IS COMPUTED MECHANICALLY (round 12 on): `python rotation.py`
prints the next window from the CORRECTNESS_r*.json history and the
registry (total order: last-green-round asc, cumulative-greens asc,
number asc). tests/test_rotation.py pins that the committed list below
IS `compute_window(all_queries, history r01..r11)` byte-for-byte, and
tests/test_rotation.py::test_no_query_exceeds_staleness_limit turns
invariant (a) into CI: it fails if running this window next round would
leave any registered query >3 rounds driver-stale (VERDICT r11 #5).

Round-15 window composition: the verbatim `python rotation.py` output
over CORRECTNESS_r01..r14 and the registry (diff empty; see the
WINDOW_ORDER comment below for the cohort breakdown). Registry grows
172 -> 174 this round — TWO net new queries (q173 TPC-H Q20 promoted
from the partsupp library, completing driver-green coverage of all 22
TPC-H shapes, and q174 the watermark-bounded reorder-buffer profile,
the tenth streaming pillar), exactly VERDICT r14's <=2 budget and its
<=174 cap.

GROWTH POLICY PAST ~190 (VERDICT r13 #6, decided here before capacity
forces it): the 200-query ceiling is ARITHMETIC — the driver window is
fixed at 50 and invariant (a) promises <=3-round staleness, so
(K+1)*cap = 200 is a hard bound, and 190 is the working ceiling (a
10-slot buffer so one round's additions can never strand a cohort).
From 191 registered queries onward, growth is NET-ZERO: a new
registration must retire an existing query in the same round, chosen
as (in preference order) (1) a narrow variant whose operator surface a
later composite query fully subsumes (e.g. a single-sketch rollup
subsumed by a multi-sketch pipeline), (2) the cheaper of two queries
pinning the SAME SURVEY §2 rows per the VERDICT coverage table. A
retired query's body and oracle move to the library pattern
(tests keep DuckDB-verifying it, like Q20 in queries/partsupp.py)
so correctness coverage is never lost — only its driver-window slot is
reclaimed. The window cap itself is the driver's contract, not ours to
raise; if a future driver widens t2 past 50, the ceiling recomputes to
(K+1)*cap and this policy's thresholds shift with it.
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
    partsupp,
    mlq,
    pipeline,
)

# First 50 names = the driver correctness window for THIS round.
#
# Round-16 window composition (verbatim `python rotation.py` output over
# CORRECTNESS_r01..r15 and the registry; diff is empty):
# 1. The ONE never-driver-green entry (invariant (c)): q175, the
#    multi-batch reorder-buffer drain (VERDICT r15 #2) — this round's
#    single net-new registration (<=2 budget; registry 174 -> 175,
#    within the <=176 cap the verdict set).
# 2. The FULL 24-query r12-stale cohort at the 3-round limit (invariant
#    (a) breaks if any slips): q122-q125 (KMV/BPE/novelty/label-noise),
#    q65, q75-q77 (PII/quality/boilerplate), q31-q36 (the MinHash/
#    SimHash/Jaccard/winnowing/cluster/simjoin dedup core), q40/q42/
#    q44-q46/q48 (ANN + k-means + int8 + embedding dedup), q50/q51/
#    q55/q66 — the LLM-pipeline heart of the registry, all last
#    driver-green r12.
# 3. Oldest-stale fill to 50 from the r13-last-green cohort, cumulative
#    greens ascending then number: q169/q170, q151-q161, q128-q135,
#    q22/q24, q41/q43. q59_sketch_rollup (r13-green) is displaced by
#    q175 and leads the r17 window inside the 3-round bound —
#    tests/test_rotation.py::test_no_query_exceeds_staleness_limit
#    verifies the arithmetic.
WINDOW_ORDER: list[str] = [
    "q175_streaming_reordered_multibatch",
    "q122_kmv_overlap",
    "q123_bpe_tokenize",
    "q124_novelty_curve",
    "q125_label_noise",
    "q65_grouped_ols",
    "q75_pii_redaction",
    "q76_quality_funnel",
    "q77_boilerplate_shingles",
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
    "q169_codec_stats",
    "q170_product_type_profit",
    "q151_rolling_revenue",
    "q152_khop_reachability",
    "q153_streaming_sliding_windows",
    "q154_benford_audit",
    "q155_chi2_independence",
    "q156_ks_two_sample",
    "q157_daily_acf",
    "q158_rfm_segmentation",
    "q159_pareto_abc",
    "q160_gini_revenue",
    "q161_corpus_pipeline",
    "q128_unigram_tokenize",
    "q129_tokenizer_compare",
    "q130_neardup_retention",
    "q131_streaming_windowed_counts",
    "q132_streaming_dedup",
    "q133_streaming_enrich",
    "q134_streaming_attribution",
    "q135_streaming_sketch_rollup",
    "q22_approx_distinct_percentiles",
    "q24_summary_stats",
    "q41_lsh_ann",
    "q43_ivf_ann",
]
