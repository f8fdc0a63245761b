"""Unit tests for the full Porter stemmer (operators/porter.py) against
the classic vocabulary from Porter 1980 — every example the paper walks
through its five steps, with FULL-pipeline outputs (e.g. 'relational'
passes step 2's ational->ate AND step 5a's e-drop, landing on 'relat').
Reference parity target: the Stemmer annotator at
code/nlp/NFL_Processing.py:411-413."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reddit_big_data_spark.operators.porter import porter_stem, stem_vocabulary

# (word, full-pipeline Porter stem) — drawn from the 1980 paper's step
# examples and the canonical reference-implementation vocabulary.
CLASSIC = [
    # step 1a
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    # step 1b (+ cleanup)
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
    ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
    # step 1c
    ("happy", "happi"), ("sky", "sky"),
    # step 2 (then 4/5 continue)
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    # step 4
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # short words pass through
    ("a", "a"), ("is", "is"), ("be", "be"),
]


@pytest.mark.parametrize("word,expected", CLASSIC, ids=lambda v: str(v))
def test_classic_vocabulary(word, expected):
    assert porter_stem(word) == expected


def test_s_stemmer_conflations_now_covered():
    # VERDICT r2 §missing-4: 'bats/batting/batted'-style conflation the
    # 3-rule s-stemmer could not perform.
    assert porter_stem("batting") == "bat"
    assert porter_stem("batted") == "bat"
    assert porter_stem("bats") == "bat"


def test_stem_vocabulary_dictionary(spark):
    toks = spark.createDataFrame(
        [("running",), ("runs",), ("running",), ("happiness",)], ["token"]
    )
    d = {r["token"]: r["stem"] for r in stem_vocabulary(toks).collect()}
    # distinct-vocab dictionary: 3 entries, not 4
    assert d == {"running": "run", "runs": "run", "happiness": "happi"}


def test_matches_pure_python_through_spark(spark):
    words = [w for w, _ in CLASSIC]
    df = spark.createDataFrame([(w,) for w in words], ["token"])
    out = {r["token"]: r["stem"] for r in stem_vocabulary(df).collect()}
    assert out == {w: porter_stem(w) for w in words}
