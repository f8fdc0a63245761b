"""Session-conf contract pins (round 16, VERDICT r15 #3): ANSI mode is
the package DEFAULT — the Spark 4 cluster default a production deploy
gets — with SPARK_GRAFT_ANSI=0 as the explicit legacy opt-out. The whole
registry is hash-green under BOTH modes (two full r15 mirror runs
preceded the flip); these tests pin the flip's plumbing so a regression
in the env parsing cannot silently run the canonical suite in legacy
mode while the changelog claims ANSI."""

from __future__ import annotations

import os

from reddit_big_data_spark.session import RUNTIME_CONFS, ansi_enabled


def test_ansi_default_is_on():
    # unset and affirmative values => ANSI
    assert ansi_enabled("1") is True
    assert ansi_enabled("true") is True
    assert ansi_enabled("yes") is True
    # explicit opt-outs => legacy
    assert ansi_enabled("0") is False
    assert ansi_enabled("false") is False
    assert ansi_enabled("") is False


def test_runtime_confs_carry_the_ansi_decision():
    expected = "true" if ansi_enabled() else "false"
    assert RUNTIME_CONFS["spark.sql.ansi.enabled"] == expected


def test_live_session_runs_the_configured_mode(spark):
    """The session the whole suite runs on must actually be in the mode
    the environment selected — ANSI-on in the canonical run, legacy only
    under SPARK_GRAFT_ANSI=0."""
    expected = (
        "true"
        if ansi_enabled(os.environ.get("SPARK_GRAFT_ANSI", "1"))
        else "false"
    )
    assert spark.conf.get("spark.sql.ansi.enabled") == expected
