"""Targeted tests for the round-4 operator families: subquery shapes,
cleaning, PageRank, robust stats, layout (Z-order + Bloom), mixture
sampling. The oracle sweep (test_queries_oracle.py) already pins each
query's values against DuckDB; these tests pin the OPERATOR PROPERTIES
that the value check alone would not distinguish (prune effectiveness,
locality bounds, budget feasibility, independence from the SQL twin).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from reddit_big_data_spark.sources.io import read_table
from tests.conftest import SF_SMOKE


def test_pagerank_matches_numpy_power_iteration(spark):
    """q82's join+agg rounds must equal an independent dense power
    iteration on the same graph (not just the SQL twin, which shares the
    relational formulation)."""
    from reddit_big_data_spark.queries.graph import _D, _ITERS, q82_pagerank

    orders = read_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
        .collect()
    )
    edges = [(r.src, r.dst) for r in pairs] + [(r.dst, r.src) for r in pairs]
    nodes = sorted({s for s, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(_ITERS):
        nxt = np.full(n, (1.0 - _D) / n)
        for s, d in edges:
            nxt[idx[d]] += _D * r[idx[s]] / deg[idx[s]]
        r = nxt
    want = sorted(
        ((round(v, 6), node) for node, v in zip(nodes, r)),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = [(row.rank, row.node) for row in q82_pagerank(spark, SF_SMOKE).collect()]
    assert got == want
    # symmetric graph, no dangling mass: total rank is conserved at 1
    assert abs(r.sum() - 1.0) < 1e-9


def test_bloom_filter_prunes_without_false_negatives(spark):
    from reddit_big_data_spark.queries.layout import (
        _PREMIUM_BAL,
        bloom_build,
        bloom_might_contain,
    )

    supp = (
        read_table(spark, SF_SMOKE, "supplier")
        .filter(F.col("s_acctbal") > _PREMIUM_BAL)
        .select("s_suppkey")
    )
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_suppkey")
    bloom = bloom_build(supp, "s_suppkey")
    survivors = set(
        r.l_suppkey
        for r in li.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain("l_suppkey"))
        .select("l_suppkey")
        .distinct()
        .collect()
    )
    truth = set(
        r.l_suppkey
        for r in li.join(
            supp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("l_suppkey")
        .distinct()
        .collect()
    )
    all_keys = set(r.l_suppkey for r in li.select("l_suppkey").distinct().collect())
    assert truth <= survivors  # no false negatives, ever
    # and the bitmap must actually prune (m=8192, k=3 over a few dozen
    # keys => near-zero fp rate; a no-op filter would fail here)
    assert len(survivors) < len(all_keys)


def test_zorder_buckets_bound_both_dimensions(spark):
    """Each Z-bucket fixes the top 2 quantized bits of BOTH dims, so its
    bounding box spans at most a quarter of each range — the data-skipping
    property a linear sort cannot give for the secondary column."""
    from reddit_big_data_spark.queries.layout import (
        _PRICE_HI,
        _PRICE_LO,
        _QTY_HI,
        _QTY_LO,
        q83_zorder_layout,
    )

    rows = q83_zorder_layout(spark, SF_SMOKE).collect()
    assert rows
    qty_quarter = (_QTY_HI - _QTY_LO) / 4
    price_quarter = (_PRICE_HI - _PRICE_LO) / 4
    for r in rows:
        assert r.qty_max - r.qty_min <= qty_quarter + 1e-9
        assert r.price_max - r.price_min <= price_quarter + 1e-9


def test_mixture_sample_respects_budgets(spark):
    from reddit_big_data_spark.queries.mixture import _BUDGETS, q85_mixture_sample

    rows = q85_mixture_sample(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.tokens <= _BUDGETS[r.lang]
        assert r.n_docs > 0


def test_pii_redaction_leaves_no_residual(spark):
    from reddit_big_data_spark.queries.cleaning import q75_pii_redaction

    rows = q75_pii_redaction(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.residual_pii == 0
        assert r.emails == r.docs  # one injected email per doc


def test_quality_funnel_is_monotone(spark):
    from reddit_big_data_spark.queries.cleaning import q76_quality_funnel

    rows = q76_quality_funnel(spark, SF_SMOKE).collect()
    counts = [r.survivors for r in sorted(rows, key=lambda r: r.stage)]
    assert len(counts) == 6
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_winsorized_mean_lies_within_bounds(spark):
    from reddit_big_data_spark.queries.robust import q81_winsorized_stats

    for r in q81_winsorized_stats(spark, SF_SMOKE).collect():
        assert r.p05 <= r.mean_winsorized <= r.p95


def test_scd2_history_versions(spark):
    """Row-level SCD2 semantics: unchanged stays open from t1; changed
    yields a closed v1 row AND an open v2 row; removed closes; added
    opens at t2."""
    from reddit_big_data_spark.operators.diff import scd2_history

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (4, 40.0)], "k long, v double"
    )
    rows = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(old, new, ["k"], ["v"], "t1", "t2").collect()
    }
    assert rows == {
        (1, 10.0, "t1", None, True),      # unchanged: open since t1
        (2, 20.0, "t1", "t2", False),     # changed: v1 closed at t2
        (2, 99.0, "t2", None, True),      # changed: v2 open
        (3, 30.0, "t1", "t2", False),     # removed: closed at t2
        (4, 40.0, "t2", None, True),      # added: open at t2
    }


def test_window_order_is_well_formed():
    """WINDOW_ORDER (the explicit driver-window list) must name only
    registered queries, contain no duplicates, and fill the full 50-slot
    window so no slot is an accidental repeat."""
    import reddit_big_data_spark.queries as qpkg
    from reddit_big_data_spark.registry import all_queries

    order = qpkg.WINDOW_ORDER
    qs = all_queries()
    assert len(order) == len(set(order)), "duplicate names in WINDOW_ORDER"
    unknown = [n for n in order if n not in qs]
    assert not unknown, f"WINDOW_ORDER names not registered: {unknown}"
    # EXACTLY 50: more would silently evict tail entries from the driver
    # window (the composition drift WINDOW_ORDER exists to prevent);
    # fewer would fill slots by import-order accident.
    assert len(order) == 50, f"window list must be exactly 50, got {len(order)}"
    # the registry serves the window names first, in order
    assert list(qs)[: len(order)] == order
    # every window slot must be a REAL green candidate: a rows-only query
    # in the window wastes a driver-checkable slot (VERDICT r4 #1 on q88)
    no_oracle = [n for n in order if qs[n].oracle is None]
    assert not no_oracle, f"oracle-less queries occupy window slots: {no_oracle}"


def test_sf_pinned_marks_exactly_the_values_snapshots():
    """sf_pinned (r12, consumed by oracle_sweep.py) must be set on
    precisely the queries whose oracle is a VALUES snapshot of the
    sf0.01 corpus — i.e. every oracle that embeds a VALUES literal as
    its data source rather than reading the parquet views. A VALUES
    oracle without the flag would make the cross-sf sweep report a
    legitimate scale-bound row as a failure; the flag on a genuine SQL
    oracle would silently exempt it from the sweep."""
    from reddit_big_data_spark.registry import all_queries

    import re

    tables = (
        "region|nation|customer|supplier|part|orders|lineitem|events|"
        "documents|embeddings"
    )
    flagged = set()
    values_oracles = set()
    for name, q in all_queries().items():
        if q.sf_pinned:
            flagged.add(name)
        # a data-snapshot oracle reads ONLY its VALUES literal; genuine
        # oracles may use VALUES parameter tables (q47's sample rates)
        # but always also read at least one of the ten parquet views
        if (
            q.oracle
            and "FROM (VALUES" in q.oracle
            and not re.search(rf"\b(FROM|JOIN)\s+({tables})\b", q.oracle)
        ):
            values_oracles.add(name)
    assert flagged == values_oracles, (
        f"sf_pinned vs FROM-(VALUES) oracles diverge: "
        f"only-flagged={sorted(flagged - values_oracles)}, "
        f"only-values={sorted(values_oracles - flagged)}"
    )


def test_weighted_sample_overrepresents_heavy_weights(spark):
    """Efraimidis-Spirakis property on the q99 scoring rule: with weight
    ratio 10:1 between two equal-sized classes, the top-100 of 2000 must
    be dominated by the heavy class (expected inclusion ~10x; the hash
    draw is deterministic so this is a fixed, replayable outcome)."""
    from pyspark.sql import functions as F

    rows = [(i, "heavy" if i % 2 == 0 else "light") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id: long, cls: string")
    w = F.when(F.col("cls") == "heavy", 10.0).otherwise(1.0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        + 0.5
    ) / float(1 << 48)
    top = (
        df.select("cls", (F.log(u) / w).alias("key"))
        .orderBy(F.desc("key"))
        .limit(100)
        .groupBy("cls")
        .count()
        .collect()
    )
    counts = {r["cls"]: r["count"] for r in top}
    assert counts.get("heavy", 0) >= 80, counts
