"""N4 full Porter stemmer (Porter, "An algorithm for suffix stripping",
Program 14(3), 1980) — the stemmer family the reference applies via John
Snow Labs' Stemmer annotator (reference code/nlp/NFL_Processing.py:411-413).

Round-2 shipped the 3-rule s-stemmer (`operators/text.py:s_stem`) as the
oracle-expressible N4 subset; VERDICT r2 asked for the real thing. This is
the complete 5-step algorithm, matching the canonical reference
implementation's semantics (longest-matching suffix wins per step; if its
condition fails the whole step fails — no backtracking to shorter
suffixes; words shorter than 3 letters pass through unchanged).

Execution shape: the pure-Python `porter_stem` is wrapped in an
Arrow-vectorized pandas UDF. The intended 100 TB pattern is DICTIONARY
stemming — stem the (tiny) distinct-token vocabulary, broadcast-join the
stems back onto token occurrences — so the Python stage touches |vocab|
rows, not |corpus| rows; `stem_vocabulary` packages that pattern.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        # y is a consonant at the start or after a vowel, a vowel after a
        # consonant (TOY -> T,O are cons,vowel -> Y cons; SYZYGY -> vowels).
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel->consonant transitions."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


# Step 2/3/4 rule tables: (suffix, replacement). Step 2 uses the canonical
# reference-implementation pairs (bli->ble and logi->log included — the two
# departures from the 1980 paper text that became the de-facto standard).
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _longest_rule(word: str, rules) -> tuple[str, str] | None:
    """The longest suffix in `rules` that matches `word` (paper: 'the
    longest match wins' — tested longest-first, first hit returned)."""
    best = None
    for suf, rep in rules:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    """Stem one lowercase word with the full 5-step Porter algorithm."""
    if len(word) < 3:
        return word
    w = word

    # ---- Step 1a ------------------------------------------------------
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- Step 1b ------------------------------------------------------
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            hit = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            hit = True
        if hit:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"

    # ---- Step 1c ------------------------------------------------------
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- Step 2 (m > 0) ----------------------------------------------
    rule = _longest_rule(w, _STEP2)
    if rule is not None:
        suf, rep = rule
        if _measure(w[: -len(suf)]) > 0:
            w = w[: -len(suf)] + rep

    # ---- Step 3 (m > 0) ----------------------------------------------
    rule = _longest_rule(w, _STEP3)
    if rule is not None:
        suf, rep = rule
        if _measure(w[: -len(suf)]) > 0:
            w = w[: -len(suf)] + rep

    # ---- Step 4 (m > 1) ----------------------------------------------
    rule = _longest_rule(w, tuple((s, "") for s in _STEP4))
    if rule is not None:
        suf, _ = rule
        stem = w[: -len(suf)]
        if _measure(stem) > 1 and (suf != "ion" or stem.endswith(("s", "t"))):
            w = stem

    # ---- Step 5a ------------------------------------------------------
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # ---- Step 5b ------------------------------------------------------
    if w.endswith("ll") and _measure(w[:-1]) > 1:
        w = w[:-1]

    return w


# StringType() (not the DDL string "string") so importing this module never
# needs an active SparkContext — DDL parsing would.
@pandas_udf(StringType())
def porter_stem_udf(tokens: pd.Series) -> pd.Series:
    """Arrow-vectorized Porter stem — the sanctioned Python escape hatch
    (batched columnar transfer, not row-at-a-time BatchEvalPython).
    NULL tokens pass through as NULL (na_action: len(None) would throw)."""
    return tokens.map(porter_stem, na_action="ignore")


def stem_vocabulary(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """Dictionary-stemming scale pattern: stem each DISTINCT surface form
    once (|vocab| rows through Python, typically thousands), returning a
    (token, stem) dictionary to broadcast-join back onto the corpus. At
    100 TB the corpus never enters a Python stage."""
    return (
        tokens.select(F.col(token_col).alias("token"))
        .distinct()
        .withColumn("stem", porter_stem_udf(F.col("token")))
    )
