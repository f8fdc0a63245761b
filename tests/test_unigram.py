"""Unigram-LM tokenizer (operators/unigram.py): training determinism,
coverage, compression, round-trip, and the greedy-longest-match apply
contract q128's oracle replays."""

from __future__ import annotations

import pytest


def test_greedy_segment_longest_match():
    from reddit_big_data_spark.operators.unigram import greedy_segment

    pieces = {"th", "the", "in", "ing"}
    assert greedy_segment("the", pieces, 4) == ["the"]
    assert greedy_segment("thin", pieces, 4) == ["th", "in"]
    assert greedy_segment("thing", pieces, 4) == ["th", "ing"]
    # unknown chars fall back to single-char tokens
    assert greedy_segment("xq", pieces, 4) == ["x", "q"]
    assert greedy_segment("", pieces, 4) == []


def test_viterbi_prefers_probable_and_fewer_pieces():
    import math

    from reddit_big_data_spark.operators.unigram import _viterbi

    logp = {"a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.5)}
    assert _viterbi("ab", logp, 2) == ("ab",)
    # equal-probability tie -> fewer pieces wins
    logp2 = {"a": math.log(0.25), "aa": math.log(0.0625)}
    assert _viterbi("aa", logp2, 2) == ("aa",)


def test_train_unigram_learns_frequent_substrings(spark):
    from reddit_big_data_spark.operators.unigram import train_unigram

    rows = [("the thing is the thing they think",)] * 20 + [
        ("unrelated words here",)
    ] * 2
    df = spark.createDataFrame(rows, "text: string")
    pieces = train_unigram(df, "text", vocab_size=40)
    assert pieces == sorted(pieces) and len(pieces) <= 40
    # coverage: every character of the corpus survives as a piece
    chars = set("".join(w for r in rows for w in r[0].split()))
    assert chars <= set(pieces)
    # the dominant substring family is learned
    assert any(p in ("th", "the", "thing") for p in pieces)
    # determinism
    assert pieces == train_unigram(df, "text", vocab_size=40)


def test_unigram_encode_round_trip_and_totality(spark):
    from reddit_big_data_spark.operators.unigram import (
        train_unigram,
        unigram_encode,
    )

    df = spark.createDataFrame(
        [
            (1, "the things they think"),
            (2, "thinking the thing through"),
            (3, "   "),
        ],
        "doc_id: int, text: string",
    )
    pieces = train_unigram(df, "text", vocab_size=30)
    out = {
        r["doc_id"]: r
        for r in unigram_encode(df, "doc_id", "text", pieces).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[3]["tokens"] == [] and out[3]["n_tokens"] == 0
    # round-trip: concatenated pieces reproduce the words, in order
    assert "".join(out[1]["tokens"]) == "thethingstheythink"
    assert out[1]["n_tokens"] == len(out[1]["tokens"])
    # compression: multi-char pieces beat char-level tokenization
    n_chars = len("thethingstheythink")
    assert 0 < out[1]["n_tokens"] < n_chars


def test_unigram_encode_matches_driver_side_greedy(spark):
    """The distributed dictionary-trick path must equal a driver-side
    greedy segmentation word by word (q128's oracle relies on it)."""
    from reddit_big_data_spark.operators.unigram import (
        greedy_segment,
        unigram_encode,
    )
    from reddit_big_data_spark.queries.cooc import _Q128_PIECES

    texts = [
        (1, "the nation is thinking together"),
        (2, "standard internal representation"),
        (3, "zz qq xx"),
    ]
    df = spark.createDataFrame(texts, "doc_id: int, text: string")
    pset = frozenset(_Q128_PIECES)
    mx = max(len(p) for p in pset)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in unigram_encode(df, "doc_id", "text", _Q128_PIECES).collect()
    }
    for i, text in texts:
        want = [t for w in text.split() for t in greedy_segment(w, pset, mx)]
        assert got[i] == want, (i, got[i], want)


def test_train_unigram_rejects_zero_prune_rounds(spark):
    from reddit_big_data_spark.operators.unigram import train_unigram

    df = spark.createDataFrame([("the thing",)], "text: string")
    with pytest.raises(ValueError, match="prune_rounds"):
        train_unigram(df, "text", vocab_size=10, prune_rounds=0)


def test_q128_word_length_contract(spark):
    """Review r7 (x2): words longer than _MAX_WORD chars are excluded
    from BOTH the tokenizer input and the char count on the Spark side
    (the oracle's shared words CTE carries the same bound). This
    exercises the PRODUCTION helpers q128 and q129 consume
    (_capped_words_array / _WORDS_CTE) — not a copy of the expression —
    so an edit to the bound or filter in queries/cooc.py fails here."""
    from pyspark.sql import functions as F

    from reddit_big_data_spark.queries.cooc import (
        _MAX_WORD,
        _WORDS_CTE,
        _capped_words_array,
    )

    long_word = "x" * (_MAX_WORD + 6)
    df = spark.createDataFrame(
        [(1, f"short {long_word} words")], "doc_id: int, text: string"
    )
    wordsarr = _capped_words_array()
    row = df.select(
        F.array_join(wordsarr, " ").alias("t"),
        F.aggregate(wordsarr, F.lit(0), lambda a, w: a + F.length(w)).alias("nc"),
    ).collect()[0]
    assert row["t"] == "short words"
    assert row["nc"] == len("shortwords")
    # the oracle side of the contract carries the SAME bound
    assert f"length(w) <= {_MAX_WORD}" in _WORDS_CTE
