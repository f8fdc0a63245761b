"""Skew-mitigation operators: salted aggregation and salted broadcast-
replicated joins.

AQE's skew-join split (on in session.py) handles sort-merge skew
automatically; these helpers cover the two cases AQE can't:

- a groupBy where ONE key holds a huge fraction of rows (the partial
  aggregate for that key still lands on one reducer): salt the key,
  aggregate twice;
- a join against a small-but-hot dimension where specific fact keys
  dominate: replicate the dim side per salt so each hot key's rows
  spread over `n_salt` tasks.

Salts are DETERMINISTIC (hash of the row content, not rand()) so reruns
and retried tasks produce identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (phase1 partial, phase2 combine) decompositions for algebraic aggregates.
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    aggs: {out_col: (fn, in_col)} with fn in count/sum/min/max/avg.
    avg decomposes into (sum, count) partials combined as sum/sum.

    Phase 1 groups by (keys..., salt) — a hot key's rows split across
    n_salt reducers; phase 2 combines the n_salt partials per key (at most
    n_salt rows per key, trivially balanced).

    CONTRACT (float semantics): results are REASSOCIATION-EQUIVALENT to
    the plain groupBy, not bit-identical. count/min/max are exact; sums
    over integer/decimal inputs are exact (addition is associative); a
    FLOAT sum/avg reassociates additions across salt partials and can
    differ from the plain plan by O(n·eps) of Σ|v| — including a
    catastrophic cancellation when mixed-sign terms cancel (e.g.
    [+1.19e-05, -1.19e-05, +1.18e-38] sums to 0.0 under one grouping and
    1.18e-38 under another). This is exactly the semantics plain Spark's
    own partial aggregation already has across partitions; callers needing
    a tolerance should scale it absolutely to the input mass
    (abs_tol ≈ 1e-9 * Σ|v|), never relatively.
    """
    salt = F.pmod(F.hash(F.struct(*[F.col(c) for c in df.columns])), F.lit(n_salt))
    phase1_exprs = []
    phase2_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            phase1_exprs += [
                F.sum(col).alias(f"__s_{out}"),
                F.count(col).alias(f"__c_{out}"),
            ]
            phase2_exprs.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        elif fn in _ALGEBRAIC:
            partial, combine = _ALGEBRAIC[fn]
            phase1_exprs.append(partial(col).alias(f"__p_{out}"))
            # count partials combine by SUM; sum/min/max by themselves
            phase2_exprs.append(combine(F.col(f"__p_{out}")).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_exprs)
    return phase1.groupBy(*keys).agg(*phase2_exprs)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join: the dim side is replicated n_salt
    times (dim must be small — it is broadcast anyway), the fact side gets
    a deterministic row-content salt, and the join key becomes
    (key, salt) — each hot key's fact rows spread across n_salt streams.
    """
    fact_salt = F.pmod(
        F.hash(F.struct(*[F.col(c) for c in facts.columns])), F.lit(n_salt)
    )
    salted_facts = facts.withColumn("__salt", fact_salt)
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = salted_facts.join(F.broadcast(replicated), [key, "__salt"], how)
    return out.drop("__salt")
