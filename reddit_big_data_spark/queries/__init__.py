"""Correctness-query modules. Importing this package registers every query
into ``reddit_big_data_spark.registry``; each module maps to a SURVEY.md §2
operator family.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness gate verifies the
first 50 registrations (registration order == import order here), so the
window rotates each round toward the queries most in need of a fresh
driver-green row. Round-4 priority, in order:

1. mlq — q65's NTZ-cast failure was round 3's only red row; its fix (and
   the rest of the ML family) must land back inside the window.
2. The round-4 additions, never driver-checked: subqueries (q78-q80),
   cleaning (q75-q77), graph (q82), robust (q81), mixture (q85),
   layout (q83-q84).
3. relational/temporal/windows + text — green in round 2 but rotated past
   the cap in round 3; their 24 queries re-enter.
4. dedup opens the tail of the window (q30-q34 repeats).

Everything past the cap was driver-green in round 3 and stays covered by
tests/test_queries_oracle.py, the local mirror of the driver check.
"""

from reddit_big_data_spark.queries import (  # noqa: F401
    mlq,
    subqueries,
    cleaning,
    graph,
    robust,
    mixture,
    layout,
    multijoin,
    modern,
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
)
