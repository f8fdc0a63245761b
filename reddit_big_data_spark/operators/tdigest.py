"""t-digest quantile sketch (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests", arXiv:1902.04023): the mergeable QUANTILE
sibling of the HLL (distinct), CMS (frequency) and KMV (distinct +
crude quantile) sketches in operators/sketches.py.

Why it completes the rollup toolbox: a 100 TB pipeline pre-aggregates each
ingest partition (day/shard) into one fixed-size digest, then answers
"p99 over any key/day range" by MERGING digests — O(parts x delta)
centroids touched, never the raw rows. KMV's quantile estimate degrades
as 1/sqrt(k) of the DISTINCT values; t-digest bounds the RANK error of
row-level quantiles and is ~100x more accurate near the tails for the
same sketch size (the k1 scale function concentrates centroid resolution
at q -> 0/1).

Spark mapping: the digest build/merge is genuinely non-SQL (greedy
scale-function clustering), so this is the sanctioned escape hatch from
the brief — Arrow-batched ``applyInPandas`` per group, never
row-at-a-time Python. Each group's state is a FIXED-SIZE pair of arrays
(means, weights: <= ~2*delta centroids), so the partial rows are tiny no
matter how many input rows, exactly like kmv_partials.

Determinism: centroid construction sorts by value and uses no RNG. Ties
on equal means can group differently across runs if input order differs,
but any resulting digest stays inside the published rank-error envelope —
callers asserting exact equality should assert on QUANTILE BOUNDS (the
q97 oracle pattern), not centroid bytes.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DIGEST_FIELDS = [
    T.StructField("means", T.ArrayType(T.DoubleType()), False),
    T.StructField("weights", T.ArrayType(T.DoubleType()), False),
    T.StructField("n", T.DoubleType(), False),
    T.StructField("vmin", T.DoubleType(), False),
    T.StructField("vmax", T.DoubleType(), False),
]


def _k1(q: np.ndarray | float, delta: int):
    """k1 scale function: delta/(2*pi) * asin(2q - 1). Its unit steps
    bound centroid weights to ~ 4*N*q(1-q)/delta — fine near the tails,
    coarse in the middle, which is what bounds RANK error by O(1/delta)
    everywhere and O(q/delta) at the edges."""
    return delta / (2.0 * math.pi) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))


def _compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Dunning's merging construction: sort centroids by mean, then sweep
    once, merging neighbors while the merged centroid's k1 span stays
    <= 1. Works identically for raw values (weight 1) and digest merges."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    w_before = 0.0  # total weight already emitted
    cur_m, cur_w = float(means[0]), float(weights[0])
    k_lower = _k1(0.0, delta)
    for m, w in zip(means[1:], weights[1:]):
        q_if_merged = (w_before + cur_w + float(w)) / total
        if _k1(q_if_merged, delta) - k_lower <= 1.0:
            cur_w += float(w)
            cur_m += (float(m) - cur_m) * float(w) / cur_w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            k_lower = _k1(w_before / total, delta)
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _quantile(
    means: np.ndarray,
    weights: np.ndarray,
    vmin: float,
    vmax: float,
    q: float,
) -> float:
    """Standard centroid interpolation: each centroid i sits at cumulative
    rank (sum of w_<i) + w_i/2; interpolate linearly between neighbors,
    pinning the extremes to the true min/max kept alongside the digest."""
    n = float(weights.sum())
    if n == 0:
        return float("nan")
    centers = np.cumsum(weights) - weights / 2.0
    xs = np.concatenate(([0.0], centers, [n]))
    ys = np.concatenate(([vmin], means, [vmax]))
    return float(np.interp(q * n, xs, ys))


def tdigest_partials(
    df: DataFrame,
    key_col: str,
    part_col: str,
    value_col: str,
    delta: int = 100,
) -> DataFrame:
    """Level 1 (the materialize-once ingest aggregation): one t-digest of
    `value_col` per (key, part) as (means, weights, n, vmin, vmax) —
    fixed-size per group regardless of input rows."""
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("part", T.StringType()),
        ]
        + _DIGEST_FIELDS
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].to_numpy(dtype=float)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        m, w = _compress(v, np.ones_like(v), delta)
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "part": [str(pdf[part_col].iloc[0])],
                "means": [m.tolist()],
                "weights": [w.tolist()],
                "n": [float(len(v))],
                "vmin": [float(v.min())],
                "vmax": [float(v.max())],
            }
        )

    return (
        df.select(key_col, part_col, value_col)
        .groupBy(key_col, part_col)
        .applyInPandas(build, schema)
    )


def tdigest_merge_quantiles(
    partials: DataFrame,
    quantiles: list[float],
    delta: int = 100,
) -> DataFrame:
    """Level 2: merge each key's part-digests (concatenate centroids,
    re-compress) and read off the requested quantiles — touching
    O(parts x delta) centroid rows per key, never the raw data.

    Output: (key, est_q<NN> double ...) with one column per requested
    quantile, e.g. est_q50 for 0.5."""
    cols = [f"est_q{int(round(q * 100)):02d}" for q in quantiles]
    schema = T.StructType(
        [T.StructField("key", T.StringType())]
        + [T.StructField(c, T.DoubleType()) for c in cols]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate([np.asarray(a, dtype=float) for a in pdf["means"]])
        weights = np.concatenate(
            [np.asarray(a, dtype=float) for a in pdf["weights"]]
        )
        m, w = _compress(means, weights, delta)
        vmin = float(pdf["vmin"].min())
        vmax = float(pdf["vmax"].max())
        row = {"key": [pdf["key"].iloc[0]]}
        for q, c in zip(quantiles, cols):
            row[c] = [_quantile(m, w, vmin, vmax, q)]
        return pd.DataFrame(row)

    return partials.groupBy("key").applyInPandas(merge, schema)


def tdigest_quantiles(
    df: DataFrame,
    key_col: str,
    part_col: str,
    value_col: str,
    quantiles: list[float],
    delta: int = 100,
) -> DataFrame:
    """Partials + merge in one call (the two-level rollup shape)."""
    return tdigest_merge_quantiles(
        tdigest_partials(df, key_col, part_col, value_col, delta),
        quantiles,
        delta,
    ).withColumnRenamed("key", key_col)
