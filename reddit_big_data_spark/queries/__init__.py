"""Correctness-query modules. Importing this package registers every query
into ``reddit_big_data_spark.registry``; each module maps to a SURVEY.md §2
operator family."""

from reddit_big_data_spark.queries import (  # noqa: F401
    relational,
    temporal,
    windows,
    text,
    dedup,
    similarity,
    events,
    mlq,
    multimodal,
    approx,
    sentiment,
    sessions,
)
