"""Central query registry backing ``__spark_entry__.py``.

Every operator family registers its correctness queries here with an
optional DuckDB oracle SQL. The driver contract (t2) runs each Spark query
at sf0.01 and hash-compares against the oracle (row count + schema +
order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded identically on both sides (a raw double can
  differ in the last ulp between engines);
- session timezone is pinned to UTC before any temporal query runs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from reddit_big_data_spark.session import apply_runtime_confs

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    # True when the oracle is a VALUES snapshot of one specific corpus
    # (the seeded-ML confusion matrices pinned at sf0.01): such a query
    # is only oracle-comparable AT that corpus, and cross-sf robustness
    # sweeps (oracle_sweep.py) must skip it rather than report a
    # legitimate scale-bound mismatch as a failure.
    sf_pinned: bool = False


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    sf_pinned: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(
            name=name, fn=wrapped, oracle=oracle, doc=doc, sf_pinned=sf_pinned
        )
        # Return the wrapper so direct imports also get the UTC/AQE conf
        # pinning, not just registry-mediated calls.
        return wrapped

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect: query modules self-register.
    import reddit_big_data_spark.queries as _qpkg

    # Serve WINDOW_ORDER names first: the driver's correctness gate
    # checks the FIRST 50 entries, so the window composition is an
    # explicit reviewed list (queries/__init__.py), not an accident of
    # module import order (ADVICE r4).
    ordered: dict[str, Query] = {}
    for name in getattr(_qpkg, "WINDOW_ORDER", []):
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
