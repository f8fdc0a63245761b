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
        assert abs(a["nd_parts_approx"] - e["nd_parts"]) / e["nd_parts"] < 0.05
        assert abs(a["nd_supps_approx"] - e["nd_supps"]) / e["nd_supps"] < 0.05
        assert abs(a["median_approx"] - e["median_price"]) / e["median_price"] < 0.02
        assert abs(a["p90_approx"] - e["p90_price"]) / e["p90_price"] < 0.02
