"""q22's approximate estimators pinned within tolerance of the exact
answers (the rows-only entry's accuracy contract)."""

from __future__ import annotations

from reddit_big_data_spark.registry import all_queries
from tests.conftest import SF_ORACLE


def test_approx_within_tolerance_of_exact(spark):
    qs = all_queries()
    exact = {
        r["l_returnflag"]: r
        for r in qs["q16_distinct_percentiles"].fn(spark, SF_ORACLE).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in qs["q22_approx_distinct_percentiles"].fn(spark, SF_ORACLE).collect()
    }
    assert exact.keys() == approx.keys()
    for k, e in exact.items():
        a = approx[k]
        # q22 now carries its estimator-vs-exact comparison in-query
        # (error-bound booleans, the driver-checkable contract); this
        # test asserts those bounds held AND that q22's exact columns
        # agree with q16's independently computed exact values.
        assert a["nd_parts_ok"] and a["nd_supps_ok"], (k, a)
        assert a["median_in_band"] and a["p90_in_band"], (k, a)
        assert a["exact_nd_parts"] == e["nd_parts"]
        assert a["exact_nd_supps"] == e["nd_supps"]
        assert abs(a["exact_median"] - e["median_price"]) <= 0.01
        assert abs(a["exact_p90"] - e["p90_price"]) <= 0.01
