"""Byte-pair-encoding tokenizer: train on the corpus, apply at scale.

q103 computes the INNER-LOOP statistic (weighted adjacent-pair counts);
this module runs the full loop and then tokenizes a corpus with the
learned merges — the capability a pretraining pipeline actually ships:

- TRAIN (Sennrich et al., "Neural Machine Translation of Rare Words with
  Subword Units", ACL 2016, Algorithm 1): greedy — repeatedly merge the
  most frequent adjacent symbol pair. Training runs DRIVER-SIDE on the
  frequency-weighted top-`vocab_rows` word list (one collect of a
  word-count aggregate): the same train-on-a-bounded-synopsis contract
  as the PQ/IVF codebooks (operators/clustering.py) — real tokenizers
  are trained on word-count tables, which are vocabulary-sized at any
  corpus scale, and the frequency weighting makes the truncation loss
  negligible. Deterministic: ties on pair frequency break to the
  lexicographically smallest pair.

- APPLY: the dictionary trick (q68's vocabulary stemming, q103's pair
  extraction): merges apply once per DISTINCT word — |vocab| rows, not
  |corpus| — via an Arrow-batched pandas UDF (sequential merge
  application is genuinely non-SQL: each merge rewrites the symbol
  sequence the next merge scans), and tokenized words join back to the
  corpus on the word key. The merge list rides the UDF closure
  (n_merges pairs of short strings — broadcast-sized).

Round-trip invariant (property-tested): concatenating a word's subword
tokens reproduces the word exactly — BPE only ever merges adjacent
symbols, never rewrites them.
"""

# NOTE: no `from __future__ import annotations` here — it would turn the
# pandas UDF's `pd.Series` type hints into strings, which pyspark's
# eval-type inference cannot resolve (UNSUPPORTED_SIGNATURE).
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_counts(
    words: list[tuple[tuple[str, ...], int]],
) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for sym, freq in words:
        for a, b in zip(sym, sym[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def word_count_synopsis(
    df: DataFrame, text_col: str, vocab_rows: int = 50_000
) -> list:
    """The bounded training synopsis both tokenizer trainers share
    (train_bpe here, train_unigram in operators/unigram.py): one
    distributed whitespace word-count aggregate, one bounded collect of
    the top `vocab_rows` (word, freq) pairs by (freq desc, word asc) —
    vocabulary-sized at any corpus scale."""
    wc = (
        df.select(F.explode(F.split(text_col, r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "w")
        .limit(int(vocab_rows))
        .collect()
    )
    return [(r["w"], int(r["freq"])) for r in wc]


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    vocab_rows: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merge pairs from the whitespace-word counts
    of `text_col`. One distributed word-count aggregate, one bounded
    collect (top `vocab_rows` by frequency, ties to the smaller word),
    then the greedy Sennrich loop driver-side. Returns the ordered merge
    list — the tokenizer artifact `bpe_encode` applies."""
    words = [
        (tuple(w), f)
        for w, f in word_count_synopsis(df, text_col, vocab_rows)
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        counts = _pair_counts(words)
        if not counts:
            break
        # highest frequency, ties to the lexicographically SMALLEST pair
        # — fully deterministic, mirroring q103's ordering contract
        maxc = max(counts.values())
        best = min(p for p, c in counts.items() if c == maxc)
        merges.append(best)
        words = [(_merge_word(s, best), f) for s, f in words]
    return merges


def dict_trick_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    segment_udf,
    include_empty: bool = True,
) -> DataFrame:
    """THE shared dictionary-trick tokenizer-apply plan (ADVICE r7: this
    was duplicated verbatim in bpe_encode and unigram_encode; one copy
    keeps the two behaviorally identical by construction). `segment_udf`
    is an Arrow-batched pandas UDF mapping a word Series to
    array<string> piece lists — the ONLY part that differs between
    tokenizer families.

    Plan shape: the corpus posexplodes into (id, pos, word); the UDF
    runs once per DISTINCT word (|vocab| rows, not |corpus|); tokenized
    words join back on the word key and reassemble in word order. The
    tokenized dictionary is persisted: the corpus text is necessarily
    read twice — once to derive the distinct vocabulary, once as the
    join's probe side (the dictionary trick's floor without caching
    corpus-sized state) — and the cache pins that at exactly two scans
    per ACTION SET; clearCache is the mop-up point
    (tests/test_cache_ledger.py).

    TOTAL over input ids by default (ADVICE r6): a document whose text
    has no non-empty words survives as (id, tokens=[], n_tokens=0)
    rather than vanishing — the explode+filter+groupBy alone would drop
    the id and inner-joining consumers would silently lose those docs.
    The completeness left-join shuffles only (id) keys, nothing
    text-sized; consumers that only report on tokenizABLE docs pass
    ``include_empty=False`` and skip that join entirely (review r7)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(text_col, r"\s+")).alias("__pos", "__w"),
    ).filter(F.col("__w") != "")
    vocab = (
        toks.select("__w")
        .distinct()
        .withColumn("__sub", segment_udf(F.col("__w")))
        .persist()
    )
    encoded = (
        toks.join(vocab, "__w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", F.col("__sub")))
                    ),
                    lambda s: s["__sub"],
                )
            ).alias("tokens")
        )
    )
    if not include_empty:
        return encoded.withColumn("n_tokens", F.size("tokens").cast("int"))
    return (
        df.select(id_col)
        .join(encoded, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(
                F.col("tokens"), F.array().cast("array<string>")
            ).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("int"))
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    include_empty: bool = True,
) -> DataFrame:
    """(id, tokens array<string>, n_tokens int): tokenize each text with
    the learned merges. Merge application runs once per DISTINCT word
    inside an Arrow-batched pandas UDF (sequential merge application is
    genuinely non-SQL); everything else is `dict_trick_encode`'s shared
    plan — see its docstring for the caching and TOTAL-over-ids
    contracts."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    frozen = [tuple(m) for m in merges]

    @pandas_udf("array<string>")
    def _apply(words: pd.Series) -> pd.Series:
        def enc(w: str) -> list[str]:
            sym = tuple(w)
            for m in frozen:
                if len(sym) < 2:
                    break
                sym = _merge_word(sym, m)
            return list(sym)

        return words.map(enc)

    return dict_trick_encode(df, id_col, text_col, _apply, include_empty)
