"""Cross-sf oracle robustness sweep: run EVERY registered query
dtype-strict against its DuckDB oracle at an arbitrary scale factor —
the driver's t2 gate only ever checks sf0.01, so corpus-scale
assumptions (rounding-boundary ties, interpolation conventions,
corpus-gap recall assumptions) can hide until a testdata regeneration
flips them. This sweep is the detector: its round-12 debut at sf0.001
caught three latent cross-engine rounding hazards (q22/q90's
interpolated-median 2dp tie, q73's /8 4dp tie — Spark rounds a double's
shortest decimal repr HALF_UP while DuckDB rounds in binary, so the
SAME double can round differently at an exact tie).

Queries registered with ``sf_pinned=True`` (the seeded-ML VALUES
snapshots, fixed functions of the sf0.01 corpus) are skipped as
legitimately scale-bound, not failures.

Usage:
    python oracle_sweep.py                        # sf0.001 (default)
    python oracle_sweep.py /root/testdata/sf0.01  # the driver's corpus
Exit code 0 iff no COMPARED oracle mismatched or errored. ``--timeout``
and ``--only`` narrow the compared set (timed-out oracles and skipped
names are reported but are out of the run's domain, not failures), so a
0 from a narrowed run certifies only what the summary line says it
compared (ADVICE r12).

SENSIBLE DOMAIN: sf0.001 and sf0.01 run every oracle to completion.
Several oracles are deliberately brute-force (q130's all-pairs
similarity CTE, the q31-q36 simjoin truths) — correct at any scale but
quadratic in DuckDB, so an unbounded sf0.1 sweep spends HOURS in
single-box oracle evaluation (measured: q130's oracle alone exceeded
15 min there before being killed). ``--timeout SECS`` makes sf0.1
feasible: a watchdog interrupts any oracle past the budget and reports
it as ORACLE-TIMEOUT (out of the sweep's domain, NOT a failure — the
Spark side still executed to completion at that corpus), so the ~95%
of oracles that ARE linear still get the full dtype-strict compare at
the 10x corpus where rounding-tie exposure is highest.

TRUTH FIXTURES (VERDICT r12 #4): the quadratic truths need deriving
only ONCE per (corpus, oracle SQL). Any oracle that takes longer than
``AUTO_FIXTURE_SECS`` writes its result to
``tests/fixtures/oracle_truth/{name}.{corpus_md5}.{sql_md5}.parquet``;
later sweeps load the fixture instead of re-running DuckDB, so the
routine sf0.1 sweep completes with ZERO oracle-timeout rows once the
slow truths are materialized (one unbounded --only run). Staleness is
structural: the key embeds the md5 of every table file AND of the
oracle SQL, so a testdata regeneration or an oracle edit misses the
key — the sweep then prints a LOUD ``FIXTURE-STALE`` line naming the
orphaned files and re-derives the truth live (timing out rather than
silently comparing against the wrong corpus's truth). Delete a fixture
file to force re-derivation.
"""

from __future__ import annotations

import glob
import hashlib
import os
import sys
import threading
import time


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "tests", "fixtures", "oracle_truth",
)
# An oracle slower than this self-fixtures on its first successful run —
# no hand-maintained slow list to drift (the quadratic q130/q35/q36
# truths take minutes-to-an-hour at sf0.1; everything linear is seconds).
AUTO_FIXTURE_SECS = 30.0


def corpus_digest(sf_dir: str) -> str:
    """md5 over every table file's bytes (~17 MB at sf0.1 — instant).
    Conservative on purpose: regenerating ANY table invalidates every
    fixture for that corpus rather than tracking per-query lineage."""
    h = hashlib.md5()
    for t in TABLES:
        with open(os.path.join(sf_dir, t) + ".parquet", "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def fixture_path(name: str, oracle_sql: str, cdig: str) -> str:
    sdig = hashlib.md5(oracle_sql.encode()).hexdigest()[:12]
    return os.path.join(FIXTURE_DIR, f"{name}.{cdig}.{sdig}.parquet")


def _file_md5(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def write_fixture_sidecar(fpath: str) -> None:
    """Content checksum written at derivation time (ADVICE r13): the
    filename digests prove the fixture belongs to (corpus, oracle SQL),
    the sidecar proves its BYTES are the ones derived then — a corrupted
    or hand-edited truth parquet fails the check instead of silently
    becoming the oracle for the quadratic queries."""
    with open(fpath + ".md5", "w") as f:
        f.write(_file_md5(fpath) + "\n")


def fixture_content_ok(fpath: str) -> bool:
    """True iff the sidecar exists and matches the parquet's bytes."""
    try:
        with open(fpath + ".md5") as f:
            expected = f.read().strip()
    except FileNotFoundError:
        return False
    return _file_md5(fpath) == expected


def stale_fixtures(name: str, current_path: str) -> list[str]:
    """Fixture files for `name` whose corpus/SQL digest no longer matches
    — orphans from a regenerated corpus or an edited oracle."""
    pattern = os.path.join(FIXTURE_DIR, f"{name}.*.parquet")
    return sorted(p for p in glob.glob(pattern) if p != current_path)


def _fetch_oracle(con, sql: str, timeout_s: float | None):
    """Run one oracle, interrupting past the budget.

    DuckDB's ``Connection.interrupt()`` is thread-safe and aborts the
    in-flight ``execute`` with duckdb.InterruptException, which the
    caller maps to an ORACLE-TIMEOUT verdict.
    """
    if not timeout_s:
        return con.execute(sql).fetchdf()
    done = threading.Event()

    def watchdog() -> None:
        # re-check after the wait (review r16): a query completing
        # exactly at the budget could otherwise be interrupted AFTER
        # completion, leaving the interrupt flag to abort the NEXT
        # oracle on this shared connection — a loud spurious failure,
        # not a false green, but a flake worth narrowing. The recheck
        # shrinks the race to the instruction gap between is_set and
        # interrupt; budgets are set 4x the measured worst case, so the
        # residual window is practically unreachable.
        if not done.wait(timeout_s) and not done.is_set():
            con.interrupt()

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return con.execute(sql).fetchdf()
    finally:
        done.set()
        t.join()


def sweep(
    sf_dir: str,
    timeout_s: float | None = None,
    only: set[str] | None = None,
) -> int:
    import duckdb

    from reddit_big_data_spark.registry import all_queries
    from reddit_big_data_spark.session import get_spark

    registered = all_queries()
    if only is not None:
        unknown = sorted(only - set(registered))
        if unknown:
            # a typo'd --only would otherwise sweep nothing and exit 0 —
            # a targeted re-verification that silently verified nothing
            print(f"--only names not in the registry: {unknown}")
            return 2
    import pandas as pd

    spark = get_spark(app_name="oracle_sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    cdig = corpus_digest(sf_dir)
    ok = skipped = rows_only = fixtures_used = 0
    failures: list[str] = []
    timeouts: list[str] = []
    for name, q in sorted(registered.items()):
        if only is not None and name not in only:
            continue
        if q.sf_pinned:
            skipped += 1
            print(f"{name}: SKIP (sf_pinned snapshot)", flush=True)
            continue
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
            if q.oracle is None:
                rows_only += 1
                print(f"{name}: rows-only ({len(sdf)} rows)", flush=True)
                continue
            fpath = fixture_path(name, q.oracle, cdig)
            from_fixture = os.path.exists(fpath)
            if from_fixture and not fixture_content_ok(fpath):
                # bytes no longer match the derivation-time sidecar (or
                # the sidecar is missing): never compare against a
                # possibly-tampered truth — re-derive live instead
                print(
                    f"{name}: FIXTURE-CORRUPT — "
                    f"{os.path.basename(fpath)} fails its content "
                    f"checksum, re-deriving the truth live",
                    flush=True,
                )
                os.remove(fpath)
                # drop the sidecar too: if the re-derivation times out
                # (or is fast enough not to re-fixture), a stale .md5
                # would otherwise linger orphaned forever (review r14)
                try:
                    os.remove(fpath + ".md5")
                except FileNotFoundError:
                    pass
                from_fixture = False
            if from_fixture:
                ddf = pd.read_parquet(fpath)
            else:
                orphans = stale_fixtures(name, fpath)
                if orphans:
                    print(
                        f"{name}: FIXTURE-STALE — corpus or oracle changed "
                        f"since these truths were derived, re-deriving live: "
                        f"{[os.path.basename(p) for p in orphans]}",
                        flush=True,
                    )
                t0 = time.monotonic()
                try:
                    ddf = _fetch_oracle(con, q.oracle, timeout_s)
                except duckdb.InterruptException:
                    timeouts.append(name)
                    print(
                        f"{name}: ORACLE-TIMEOUT >{timeout_s}s "
                        f"(spark side ran: {len(sdf)} rows; materialize the "
                        f"truth fixture once via "
                        f"`python oracle_sweep.py {sf_dir} --only {name}`)",
                        flush=True,
                    )
                    continue
                if time.monotonic() - t0 > AUTO_FIXTURE_SECS:
                    os.makedirs(FIXTURE_DIR, exist_ok=True)
                    ddf.to_parquet(fpath, index=False)
                    write_fixture_sidecar(fpath)
                    print(
                        f"{name}: truth fixture written "
                        f"({os.path.basename(fpath)})",
                        flush=True,
                    )
            cols = sorted(sdf.columns)
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = ddf[cols].sort_values(cols).reset_index(drop=True)
            if a.equals(b):
                ok += 1
                fixtures_used += from_fixture
                suffix = " [fixture]" if from_fixture else ""
                print(f"{name}: OK ({len(a)} rows){suffix}", flush=True)
            else:
                failures.append(name)
                print(
                    f"{name}: MISMATCH rows {len(a)} vs {len(b)}",
                    flush=True,
                )
        except Exception as exc:  # keep sweeping
            failures.append(name)
            print(
                f"{name}: ERROR {type(exc).__name__}: {str(exc)[:200]}",
                flush=True,
            )
        spark.catalog.clearCache()
        from reddit_big_data_spark.plans.cache import release_local_checkpoints

        release_local_checkpoints(spark)
    print(
        f"\nORACLE SWEEP {sf_dir}: {ok} hash-green "
        f"({fixtures_used} vs stored truth fixtures) + {rows_only} rows-only, "
        f"{skipped} sf-pinned skipped, "
        f"{len(timeouts)} oracle-timeout {timeouts}, failures: {failures}",
        flush=True,
    )
    return 1 if failures else 0


def main() -> int:
    """Left-to-right flag walk (ADVICE r13): EVERY --only occurrence is
    honored (their name sets union), an unrecognized --flag or a second
    positional errors instead of being silently dropped — a malformed
    invocation must not narrow a re-verification while still exiting 0."""
    args = sys.argv[1:]
    timeout_s: float | None = None
    only_sets: list[set[str]] = []
    positional: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--timeout":
            if i + 1 >= len(args):
                print("usage: --timeout SECS (positive number)")
                return 2
            try:
                timeout_s = float(args[i + 1])
            except ValueError:
                # '--timeout abc' / '--timeout --only' would otherwise die
                # in an uncaught ValueError traceback instead of usage
                # (ADVICE r12)
                print("usage: --timeout SECS (positive number)")
                return 2
            import math

            if timeout_s <= 0 or not math.isfinite(timeout_s):
                # a falsy 0 would silently mean 'unbounded' (the
                # hours-long sf0.1 hang the flag exists to prevent);
                # 'nan' makes Event.wait return immediately (every
                # oracle spuriously times out, sweep exits 0 comparing
                # nothing) and 'inf' overflows the wait, killing the
                # watchdog thread (review r14)
                print("usage: --timeout SECS must be a finite number > 0")
                return 2
            i += 2
        elif a == "--only":
            # single-dash values too (ADVICE r14): '-q01' would otherwise
            # fall through to the positional branch and surface as a
            # confusing sf_dir / extra-arguments error
            if i + 1 >= len(args) or args[i + 1].startswith("-"):
                print("usage: --only name1,name2,...")
                return 2
            only_sets.append(set(args[i + 1].split(",")))
            i += 2
        elif a.startswith("--"):
            print(f"unrecognized flag: {a}")
            return 2
        else:
            positional.append(a)
            i += 1
    if len(positional) > 1:
        print(f"unexpected extra arguments: {positional[1:]}")
        return 2
    only = set().union(*only_sets) if only_sets else None
    sf_dir = positional[0] if positional else "/root/testdata/sf0.001"
    return sweep(sf_dir, timeout_s=timeout_s, only=only)


if __name__ == "__main__":
    raise SystemExit(main())
