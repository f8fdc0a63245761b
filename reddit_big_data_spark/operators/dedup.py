"""Deduplication operators for LLM-scale data pipelines: exact fingerprint
dedup, word-shingling, MinHash signatures, LSH banding, and candidate-pair
generation that NEVER goes all-pairs.

The reference has no dedup (its working sets are id-keyed Reddit dumps);
this family is the training-data-pipeline extension the builder brief
demands. Design for 100 TB:

- Fingerprints and MinHash use md5 (JVM-side, codegen'd; also available in
  DuckDB so every step is oracle-checkable).
- MinHash = min over md5(seed || shingle) per seed: the lexicographic min
  of an md5 hex digest is a uniform random permutation minimum, no
  numeric-overflow games needed.
- LSH: signatures are split into bands; docs sharing any (band_idx,
  band_hash) bucket become candidates via a SELF-JOIN ON THE BUCKET KEY —
  a hash join whose cost is sum(bucket_size^2), not n^2. The exact Jaccard
  filter then removes false positives; false-negative probability at
  Jaccard j is (1 - j^rows)^bands (standard S-curve).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_set_fingerprint(tokens: Column) -> Column:
    """Exact-dedup key: md5 of the sorted distinct token set. Two docs with
    the same bag of words (any order/multiplicity) collide — the cheap
    first-pass dedup gate before MinHash."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens))))


def word_shingles(tokens: Column, k: int = 2) -> Column:
    """Distinct word k-shingles of a token array, as strings.

    transform over a 0-based index sequence; slice is 1-based. Docs shorter
    than k yield an empty array.
    """
    n = F.size(tokens)
    # Guard n < k explicitly: Spark's sequence(1, 0) yields a DESCENDING
    # [1, 0], not an empty array.
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )


def char_shingles(text: Column, k: int = 3) -> Column:
    """Distinct character k-grams — the n-gram-Jaccard flavor of near-dup."""
    n = F.length(text)
    # Column.substr takes Column positions (F.substring wants Python ints).
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: text.substr(i, F.lit(k)),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: array of num_hashes lexicographic-min md5 digests,
    one per seeded 'permutation'. NULL-safe: empty shingle sets produce
    NULL mins and never collide into buckets (md5 of NULL is NULL)."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s)))
            )
            for i in range(num_hashes)
        ]
    )


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Collapse a signature into `bands` bucket keys (md5 of each row-group).
    Returns array<string> of length `bands`."""
    return F.array(
        *[
            F.md5(F.concat_ws("|", F.slice(signature, b * rows + 1, rows)))
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    bands: int = 16,
    rows: int = 2,
) -> DataFrame:
    """(id_a, id_b) candidate pairs sharing >=1 LSH bucket, id_a < id_b.

    Plan shape: explode bands -> shuffle on (band_idx, band_hash) -> hash
    self-join inside buckets -> distinct. No cartesian product anywhere;
    verify with the unit test asserting the plan has no CartesianProduct.
    """
    sig = minhash_signature(F.col(shingle_col), bands * rows)
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(lsh_band_keys(sig, bands, rows)).alias("band_idx", "band_hash"),
    ).filter(F.col("band_hash").isNotNull())
    left = banded.withColumnsRenamed({"__id": "id_a"})
    right = banded.withColumnsRenamed({"__id": "id_b"})
    return (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def near_duplicates(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    threshold: float = 0.6,
    bands: int = 16,
    rows: int = 2,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification:
    (id_a, id_b, jaccard) for pairs >= threshold. The LSH stage prunes the
    pair space; the join back to shingle sets verifies candidates exactly,
    so precision is 1.0 and recall is 1-(1-t^rows)^bands at t=threshold."""
    pairs = lsh_candidate_pairs(df, id_col, shingle_col, bands, rows)
    sets_a = df.select(
        F.col(id_col).alias("id_a"), F.col(shingle_col).alias("__sh_a")
    )
    sets_b = df.select(
        F.col(id_col).alias("id_b"), F.col(shingle_col).alias("__sh_b")
    )
    return (
        pairs.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn("jaccard", jaccard(F.col("__sh_a"), F.col("__sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_bits(df: DataFrame, id_col: str, token_col: str, bits: int = 32) -> DataFrame:
    """SimHash: per-doc `bits`-bit signature as a bit-string column.

    Each token votes +1/-1 on bit j according to hex digit j of its md5
    (digit >= 8 -> 1). A near-identical token multiset flips few votes, so
    near-dups land at small hamming distance. Fully native: explode tokens
    x explode bit positions -> groupBy(doc, pos) sum -> assemble string.
    """
    tok = df.select(F.col(id_col).alias("__id"), F.explode(token_col).alias("__t"))
    tok = tok.withColumn("__h", F.md5(F.col("__t")))
    votes = (
        tok.select(
            "__id",
            F.explode(F.sequence(F.lit(1), F.lit(bits))).alias("pos"),
            "__h",
        )
        .withColumn(
            "vote",
            F.when(
                F.instr(F.lit("89abcdef"), F.substring(F.col("__h"), F.col("pos"), 1)) > 0,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        .groupBy("__id", "pos")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        votes.withColumn("bit", F.when(F.col("v") >= 0, F.lit("1")).otherwise(F.lit("0")))
        .groupBy("__id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "bit"))),
                    lambda s: s["bit"],
                ),
            ).alias("simhash")
        )
        .withColumnRenamed("__id", id_col)
    )
