"""BPE tokenizer: driver-side greedy training on the word-count synopsis
+ dictionary-trick distributed application (operators/bpe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_train_bpe_learns_frequent_pairs(spark):
    # "ab" appears far more than anything else -> first merge is (a, b)
    df = spark.createDataFrame(
        [("ab ab ab ab cd",), ("ab ab xy",)], "text: string"
    )
    from reddit_big_data_spark.operators.bpe import train_bpe

    merges = train_bpe(df, "text", n_merges=2)
    assert merges[0] == ("a", "b")
    assert train_bpe(df, "text", n_merges=2) == merges  # deterministic


def test_bpe_encode_round_trip_and_dictionary_shape(spark):
    """Concatenating a word's subwords reproduces the word exactly, token
    counts are consistent, and repeated words tokenize identically."""
    from reddit_big_data_spark.operators.bpe import bpe_encode, train_bpe

    rows = [
        (1, "the quick brown fox the quick"),
        (2, "the lazy dog"),
        (3, "quick quick quick"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    merges = train_bpe(df, "text", n_merges=20)
    out = {r["doc_id"]: r for r in bpe_encode(df, "doc_id", "text", merges).collect()}
    for doc_id, text in rows:
        words = text.split()
        toks = out[doc_id]["tokens"]
        assert out[doc_id]["n_tokens"] == len(toks)
        # round-trip: tokens concatenate back to the original words in order
        assert "".join(toks) == "".join(words)
        assert len(toks) <= sum(len(w) for w in words)
    # same word -> same subwords everywhere: doc 3 is 3x 'quick'
    t3 = out[3]["tokens"]
    assert len(t3) % 3 == 0
    third = len(t3) // 3
    assert t3[:third] == t3[third : 2 * third] == t3[2 * third :]


def test_bpe_merge_word_applies_leftmost_nonoverlapping():
    from reddit_big_data_spark.operators.bpe import _merge_word

    # aaa + (a,a) -> (aa, a): leftmost pair merges first, no overlap reuse
    assert _merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert _merge_word(("x", "y"), ("a", "b")) == ("x", "y")


def test_bracket_replace_replay_matches_merge_word():
    """The q123 oracle replays each merge as a left-to-right
    non-overlapping replace over '<sym>'-wrapped strings (Python
    str.replace shares those exact semantics with DuckDB's replace).
    Pin the equivalence on adversarial words — BACK-TO-BACK occurrences
    of the same pair ('training', 'banana', 'aaa') are where a
    shared-delimiter encoding diverges (review r6)."""
    from reddit_big_data_spark.operators.bpe import _merge_word

    merges = [("i", "n"), ("a", "n"), ("an", "a"), ("a", "a"), ("t", "r")]
    for w in ["training", "banana", "aaa", "aaaa", "mississippi", "nn", "x"]:
        sym = tuple(w)
        s = "".join(f"<{c}>" for c in w)
        for a, b in merges:
            sym = _merge_word(sym, (a, b))
            s = s.replace(f"<{a}><{b}>", f"<{a}{b}>")
        replay = tuple(t for t in s[1:-1].split("><")) if s else ()
        assert replay == sym, (w, replay, sym)
        assert s.count("<") == len(sym)


def test_bpe_encode_total_over_ids(spark):
    """ADVICE r6: docs whose text has no non-empty words must survive as
    (id, [], 0) instead of vanishing — inner-joining consumers would
    otherwise silently lose them."""
    from reddit_big_data_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame(
        [(1, "the thin"), (2, "   "), (3, "")],
        "doc_id: int, text: string",
    )
    out = {r["doc_id"]: r for r in bpe_encode(df, "doc_id", "text", [("t", "h")]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["tokens"] == ["th", "e", "th", "i", "n"]
    assert out[2]["tokens"] == [] and out[2]["n_tokens"] == 0
    assert out[3]["tokens"] == [] and out[3]["n_tokens"] == 0
