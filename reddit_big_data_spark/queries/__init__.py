"""Correctness-query modules. Importing this package registers every query
into ``reddit_big_data_spark.registry``; each module maps to a SURVEY.md §2
operator family.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness gate verifies the
first 50 registrations (registration order == import order here). Round 2
left q22-q25, q52-q58, q60-q65 past the cap with only pytest evidence, so
the never-driver-checked families (ml, multimodal, approx/pivot/cube,
sentiment, sessionization/as-of/range joins, salted agg) now import FIRST
and the twice-green relational/temporal/window basics rotate past the cap
(they stay covered by tests/test_queries_oracle.py, the local mirror of
the driver check).
"""

from reddit_big_data_spark.queries import (  # noqa: F401
    mlq,
    multimodal,
    approx,
    sentiment,
    sessions,
    events,
    nested,
    cooc,
    cms,
    maintenance,
    udtfq,
    subqueries,
    cleaning,
    graph,
    robust,
    mixture,
    layout,
    dedup,
    similarity,
    text,
    windows,
    temporal,
    relational,
)
