"""oracle_sweep.py watchdog contract (round 12).

The cross-sf sweep's --timeout mode is what makes an sf0.1 pass feasible
(the q130/q31-q36 brute-force oracles are quadratic in DuckDB there), so
the interrupt semantics must hold: a too-slow oracle raises
InterruptException inside the budget's neighborhood, a fast oracle is
untouched, and the SAME connection keeps serving later oracles — the
sweep reuses one connection with all ten table views registered.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oracle_sweep import _fetch_oracle  # noqa: E402

_SLOW_SQL = (
    "WITH RECURSIVE r(i) AS (SELECT 1 UNION ALL SELECT i+1 FROM r "
    "WHERE i < 2000000000) SELECT max(i) AS m FROM r"
)


def test_fetch_oracle_times_out_and_connection_survives():
    con = duckdb.connect()
    t0 = time.monotonic()
    with pytest.raises(duckdb.InterruptException):
        _fetch_oracle(con, _SLOW_SQL, timeout_s=0.5)
    # Interrupt fired near the budget, not at the query's natural end
    # (the recursive CTE would run for minutes).
    assert time.monotonic() - t0 < 30
    # The connection must keep serving the rest of the sweep.
    assert con.execute("SELECT 41 + 1").fetchone() == (42,)


def test_fetch_oracle_fast_query_unaffected_by_budget():
    con = duckdb.connect()
    df = _fetch_oracle(con, "SELECT 7 AS x", timeout_s=5.0)
    assert df["x"].tolist() == [7]


def test_fetch_oracle_no_timeout_path():
    con = duckdb.connect()
    df = _fetch_oracle(con, "SELECT 3 AS x", timeout_s=None)
    assert df["x"].tolist() == [3]


def test_idle_interrupt_does_not_poison_next_oracle():
    """The watchdog can lose the race: the oracle finishes just under
    budget and interrupt() fires on an idle connection. On this DuckDB
    an idle interrupt is a no-op — pinned here so a version where the
    stale flag aborts the NEXT oracle (turning it into a spurious
    ORACLE-TIMEOUT, i.e. silent coverage loss) fails loudly."""
    con = duckdb.connect()
    con.interrupt()
    assert con.execute("SELECT 1").fetchone() == (1,)


def test_only_filter_rejects_unknown_names():
    """A typo'd --only must exit non-zero instead of sweeping nothing
    and reporting green (review r12)."""
    from oracle_sweep import sweep

    assert sweep("/root/testdata/sf0.001", only={"q31_minhash_nearddup"}) == 2


def test_main_rejects_zero_and_missing_timeout(monkeypatch):
    from oracle_sweep import main

    monkeypatch.setattr(
        sys, "argv", ["oracle_sweep.py", "/x", "--timeout", "0"]
    )
    assert main() == 2
    monkeypatch.setattr(sys, "argv", ["oracle_sweep.py", "--timeout"])
    assert main() == 2
    monkeypatch.setattr(sys, "argv", ["oracle_sweep.py", "--only"])
    assert main() == 2
    # review r14: 'nan' makes Event.wait return immediately (every
    # oracle spuriously times out, sweep exits 0 comparing nothing);
    # 'inf' overflows the wait and kills the watchdog thread
    for bad in ("nan", "inf", "-inf"):
        monkeypatch.setattr(
            sys, "argv", ["oracle_sweep.py", "/x", "--timeout", bad]
        )
        assert main() == 2, bad


def test_main_rejects_malformed_invocations(monkeypatch):
    """ADVICE r13: junk flags and extra positionals must error (exit 2)
    instead of being dropped — a malformed narrow re-verification would
    otherwise compare fewer queries than intended while exiting 0."""
    from oracle_sweep import main

    monkeypatch.setattr(sys, "argv", ["oracle_sweep.py", "--olny", "q01"])
    assert main() == 2
    monkeypatch.setattr(
        sys, "argv", ["oracle_sweep.py", "/a", "/b", "--timeout", "5"]
    )
    assert main() == 2
    # '--only --timeout' (value looks like a flag) is a usage error, not
    # a query named '--timeout'
    monkeypatch.setattr(
        sys, "argv", ["oracle_sweep.py", "--only", "--timeout"]
    )
    assert main() == 2


def test_main_honors_every_only_occurrence(monkeypatch):
    """ADVICE r13: a second --only must UNION with the first, not be
    silently ignored."""
    import oracle_sweep as osw

    seen = {}

    def fake_sweep(sf_dir, timeout_s=None, only=None):
        seen["sf_dir"], seen["only"] = sf_dir, only
        return 0

    monkeypatch.setattr(osw, "sweep", fake_sweep)
    monkeypatch.setattr(
        sys,
        "argv",
        ["oracle_sweep.py", "/x", "--only", "q01,q02", "--only", "q03"],
    )
    assert osw.main() == 0
    assert seen == {"sf_dir": "/x", "only": {"q01", "q02", "q03"}}


def test_truth_fixture_write_load_and_stale_detection(
    spark, tmp_path, monkeypatch, capsys
):
    """VERDICT r12 #4 mechanics on a fast query with the auto-fixture
    threshold forced to 0: first sweep derives the truth live and writes
    the fixture; second sweep compares against the stored truth (no
    DuckDB run); a digest change (corpus regen / oracle edit) must print
    a LOUD FIXTURE-STALE line and re-derive rather than silently compare
    against the orphaned truth."""
    import oracle_sweep as osw

    monkeypatch.setattr(osw, "FIXTURE_DIR", str(tmp_path))
    monkeypatch.setattr(osw, "AUTO_FIXTURE_SECS", 0.0)
    name = "q52_binary_payloads"

    assert osw.sweep("/root/testdata/sf0.001", only={name}) == 0
    out = capsys.readouterr().out
    assert "truth fixture written" in out
    files = sorted(tmp_path.glob(f"{name}.*.parquet"))
    assert len(files) == 1

    assert osw.sweep("/root/testdata/sf0.001", only={name}) == 0
    out = capsys.readouterr().out
    assert "[fixture]" in out and "truth fixture written" not in out

    # orphan the fixture: same name, wrong digests
    stale = tmp_path / f"{name}.{'0' * 16}.{'0' * 12}.parquet"
    files[0].rename(stale)
    assert osw.sweep("/root/testdata/sf0.001", only={name}) == 0
    out = capsys.readouterr().out
    assert "FIXTURE-STALE" in out  # loud re-derivation, not silent reuse


def test_corrupted_fixture_content_rederives_live(
    spark, tmp_path, monkeypatch, capsys
):
    """ADVICE r13: the filename digests prove (corpus, oracle SQL)
    lineage but not byte integrity — a fixture whose CONTENT no longer
    matches its derivation-time sidecar must be discarded loudly and the
    truth re-derived, never silently compared against."""
    import oracle_sweep as osw

    monkeypatch.setattr(osw, "FIXTURE_DIR", str(tmp_path))
    monkeypatch.setattr(osw, "AUTO_FIXTURE_SECS", 0.0)
    name = "q52_binary_payloads"

    assert osw.sweep("/root/testdata/sf0.001", only={name}) == 0
    [fpath] = sorted(tmp_path.glob(f"{name}.*.parquet"))
    assert (tmp_path / (fpath.name + ".md5")).exists()
    capsys.readouterr()

    # hand-edit the truth: flip the last byte
    raw = bytearray(fpath.read_bytes())
    raw[-1] ^= 0xFF
    fpath.write_bytes(bytes(raw))
    assert osw.sweep("/root/testdata/sf0.001", only={name}) == 0
    out = capsys.readouterr().out
    assert "FIXTURE-CORRUPT" in out and "[fixture]" not in out
    # the re-derivation rewrote a checksum-valid fixture, and exactly
    # one sidecar remains (the corrupt pair was removed TOGETHER —
    # an orphaned .md5 would linger forever otherwise, review r14)
    [fpath2] = sorted(tmp_path.glob(f"{name}.*.parquet"))
    assert osw.fixture_content_ok(str(fpath2))
    assert len(list(tmp_path.glob("*.md5"))) == 1

    # a missing sidecar is equally untrusted
    (tmp_path / (fpath2.name + ".md5")).unlink()
    assert osw.sweep("/root/testdata/sf0.001", only={name}) == 0
    assert "FIXTURE-CORRUPT" in capsys.readouterr().out


def test_mirror_uses_and_distrusts_truth_fixtures(
    spark, duck, tmp_path, monkeypatch
):
    """The suite's t2 mirror (oracle_harness) reuses the sweep's truth
    fixtures (VERDICT r13 #4 wall-time): a checksummed fixture IS the
    compared truth (planting a wrong one makes the compare fail — proof
    it was read), a checksum-less fixture is distrusted and the mirror
    falls back to the live DuckDB oracle."""
    import pandas as pd

    import oracle_sweep as osw
    from reddit_big_data_spark.registry import all_queries
    from tests import oracle_harness as oh
    from tests.conftest import SF_ORACLE

    monkeypatch.setattr(osw, "FIXTURE_DIR", str(tmp_path))
    q = all_queries()["q52_binary_payloads"]

    # no fixture: live DuckDB path, green
    assert oh.run_and_compare(spark, duck, q, SF_ORACLE) == []

    # plant a WRONG truth with a VALID sidecar: the mirror must read it
    # and therefore mismatch — proving the fixture short-circuits DuckDB
    wrong = duck.execute(q.oracle).fetchdf()
    wrong.loc[0, "cnt"] = wrong.loc[0, "cnt"] + 1
    fpath = osw.fixture_path(
        q.name, q.oracle, osw.corpus_digest(SF_ORACLE)
    )
    pd.DataFrame(wrong).to_parquet(fpath, index=False)
    osw.write_fixture_sidecar(fpath)
    errors = oh.run_and_compare(spark, duck, q, SF_ORACLE)
    assert errors, "a checksummed fixture must be the compared truth"

    # break the sidecar: the corrupt fixture is distrusted, live run green
    with open(fpath + ".md5", "w") as f:
        f.write("0" * 32 + "\n")
    assert oh.run_and_compare(spark, duck, q, SF_ORACLE) == []


def test_corpus_digest_distinguishes_scale_factors():
    from oracle_sweep import corpus_digest

    a = corpus_digest("/root/testdata/sf0.001")
    assert a == corpus_digest("/root/testdata/sf0.001")  # deterministic
    assert a != corpus_digest("/root/testdata/sf0.01")


def test_committed_fixtures_match_current_corpus_and_oracles():
    """Fixture-rot guard: every COMMITTED truth fixture's filename key
    must match SOME shipped corpus's current digest and its query's
    current oracle-SQL digest (slow oracles self-fixture at whichever
    corpus they exceed the threshold — q130/q35 do at sf0.01 too). A
    testdata regeneration or an oracle edit that orphans a fixture
    fails HERE in CI, not just as a slow re-derivation inside the next
    sweep. Skips when no shipped corpus is present."""
    import glob
    import os

    import pytest as _pytest

    from oracle_sweep import (
        FIXTURE_DIR,
        corpus_digest,
        fixture_content_ok,
        fixture_path,
    )
    from reddit_big_data_spark.registry import all_queries
    from tests.conftest import SF_LARGE, SF_ORACLE, SF_SMOKE

    files = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.parquet")))
    if not files:
        return  # nothing committed yet
    corpora = [d for d in (SF_SMOKE, SF_ORACLE, SF_LARGE) if os.path.isdir(d)]
    if not corpora:
        _pytest.skip("no shipped corpus present on this checkout")
    registered = all_queries()
    expected = {
        fixture_path(name, q.oracle, corpus_digest(d))
        for d in corpora
        for name, q in registered.items()
        if q.oracle is not None
    }
    orphans = [os.path.basename(f) for f in files if f not in expected]
    assert not orphans, (
        "truth fixtures orphaned by a corpus regen or oracle edit "
        f"(delete or re-derive them): {orphans}"
    )
    # ADVICE r13: lineage digests alone don't prove byte integrity —
    # every committed fixture must also match its derivation-time
    # content sidecar, so a hand-edited truth fails HERE in CI.
    corrupt = [os.path.basename(f) for f in files if not fixture_content_ok(f)]
    assert not corrupt, (
        "truth fixtures whose bytes fail their content checksum "
        f"(re-derive them): {corrupt}"
    )
    # ...and no sidecar may outlive its parquet (the FIXTURE-CORRUPT
    # path removes both; an orphan .md5 means something deleted the
    # truth by hand — review r14)
    orphan_sidecars = [
        os.path.basename(s)
        for s in glob.glob(os.path.join(FIXTURE_DIR, "*.parquet.md5"))
        if s[: -len(".md5")] not in set(files)
    ]
    assert not orphan_sidecars, (
        f"checksum sidecars without their fixture parquet: {orphan_sidecars}"
    )


def test_rotating_audit_catches_consistently_regenerated_wrong_fixture(
    spark, duck, tmp_path, monkeypatch
):
    """ADVICE r14: a wrong fixture regenerated TOGETHER with its sidecar
    passes both the checksum and (if Spark were wrong the same way) the
    mirror compare. The rotating per-round live audit closes that hole:
    when the query is this run's pick, the truth is re-derived from
    DuckDB and a divergent fixture fails LOUDLY — before the Spark
    compare, so the failure names the fixture, not the query."""
    import pandas as pd

    import oracle_sweep as osw
    from reddit_big_data_spark.registry import all_queries
    from tests import oracle_harness as oh
    from tests.conftest import SF_ORACLE

    monkeypatch.setattr(osw, "FIXTURE_DIR", str(tmp_path))
    q = all_queries()["q52_binary_payloads"]
    monkeypatch.setattr(oh, "rotating_audit_pick", lambda: q.name)

    # consistently-regenerated wrong pair: wrong parquet, VALID sidecar
    wrong = duck.execute(q.oracle).fetchdf()
    wrong.loc[0, "cnt"] = wrong.loc[0, "cnt"] + 1
    fpath = osw.fixture_path(q.name, q.oracle, osw.corpus_digest(SF_ORACLE))
    pd.DataFrame(wrong).to_parquet(fpath, index=False)
    osw.write_fixture_sidecar(fpath)
    assert osw.fixture_content_ok(fpath)  # the rot guard is blind to it

    errors = oh.run_and_compare(spark, duck, q, SF_ORACLE)
    assert errors and "disagrees with a live oracle re-derivation" in errors[0]

    # a CORRECT fixture sails through the audit (live == fixture)
    right = duck.execute(q.oracle).fetchdf()
    pd.DataFrame(right).to_parquet(fpath, index=False)
    osw.write_fixture_sidecar(fpath)
    assert oh.run_and_compare(spark, duck, q, SF_ORACLE) == []


def test_rotating_audit_pick_is_deterministic_and_fixture_backed():
    """The pick is deterministic within a run (one live re-derivation
    per suite run), names a committed fixture-backed query, and rotates
    on the recorded round count so a full cycle bounds fixture-rot
    persistence."""
    import glob
    import os

    from oracle_sweep import FIXTURE_DIR
    from tests import oracle_harness as oh

    pick = oh.rotating_audit_pick()
    assert pick == oh.rotating_audit_pick()  # deterministic
    names = sorted(
        {
            f.split(".")[0]
            for f in os.listdir(FIXTURE_DIR)
            if f.endswith(".parquet")
        }
    )
    assert pick in names
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = len(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert pick == names[rounds % len(names)]


def test_rotating_audit_degrades_loudly_past_time_budget(
    spark, duck, tmp_path, monkeypatch
):
    """ADVICE r15: the live re-derivation is bounded — fixtures exist
    precisely because some oracles are slow, so a quadratic oracle
    drifting past the budget must not charge every suite run that picks
    it an unbounded cost. Past LIVE_AUDIT_BUDGET_SECS the audit WARNS
    (never silent) and compares against the checksummed fixture only;
    the full live cross-check still happens in the unbounded
    oracle_sweep run."""
    import duckdb
    import pandas as pd
    import pytest

    import oracle_sweep as osw
    from reddit_big_data_spark.registry import all_queries
    from tests import oracle_harness as oh
    from tests.conftest import SF_ORACLE

    monkeypatch.setattr(osw, "FIXTURE_DIR", str(tmp_path))
    q = all_queries()["q52_binary_payloads"]
    monkeypatch.setattr(oh, "rotating_audit_pick", lambda: q.name)
    right = duck.execute(q.oracle).fetchdf()
    fpath = osw.fixture_path(q.name, q.oracle, osw.corpus_digest(SF_ORACLE))
    pd.DataFrame(right).to_parquet(fpath, index=False)
    osw.write_fixture_sidecar(fpath)

    def slow_oracle(con, sql, timeout_s):
        raise duckdb.InterruptException("simulated budget overrun")

    monkeypatch.setattr(osw, "_fetch_oracle", slow_oracle)
    with pytest.warns(UserWarning, match="rotating live audit exceeded"):
        errors = oh.run_and_compare(spark, duck, q, SF_ORACLE)
    # the fixture path still carried the compare — green, not skipped
    assert errors == []
