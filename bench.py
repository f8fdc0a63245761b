"""Benchmark runner: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to execute fully with a noop-format write (all rows
computed, nothing collected to the driver), so the timing covers the real
scan/shuffle/agg work rather than driver serialization.

MIN-OF-N INTERLEAVED (VERDICT r5 #3): the per-round bench box swings 2-10x
on byte-identical queries (SURVEY §6), which made single-run per-query
deltas between rounds unactionable. Each query is now timed
$SPARK_GRAFT_BENCH_REPS times (default 3) ROUND-ROBIN — pass 1 runs q01..
qNN, then pass 2, then pass 3 — so a load spike hits one pass of many
queries instead of all reps of one query. Reported per-query value = min
across passes (the least-noise estimate of the code's true cost);
`queries` in the JSON line stays {qNN: min_sec} for cross-round driver
compatibility. Full per-pass detail {min, runs, spread} goes to
BENCH_DETAIL.json next to this file — kept OUT of the stdout line because
the driver captures a bounded stdout tail (round 2's full-name keys
already overflowed it once).

CROSS-ROUND SOURCE OF TRUTH (VERDICT r10 #7a, r11 #3): the driver's
BENCH_rN.json stores only the LAST ~2 KB of this script's stdout — at
160+ queries the JSON line no longer fits, so BENCH_rN.json holds a
truncated fragment. Per-query cross-round diffs must read the detail
files: BENCH_DETAIL.json (the latest run, overwritten every time) and
BENCH_DETAIL_r{N}.json (the same payload persisted per round, N = max
existing BENCH_r*.json + 1 — i.e. the round the driver is about to
record; the driver's own sweep is the round's last run and therefore
the copy that survives). Both carry every query's {min, runs, spread}.
Runs at a non-default core count (the driver's scaling sweep) write
BENCH_DETAIL_r{N}_c{cpus}.json instead, so they cannot shadow the
canonical full-core record (VERDICT r16 #4).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _force(df) -> None:
    # noop datasource: full computation, zero sink cost.
    df.write.mode("overwrite").format("noop").save()


# Box-calibration sentinels (VERDICT r15 #4): two consecutive rounds'
# cross-round deltas (r14 -12.6%, r15 +13%) had to be adjudicated with
# ad-hoc interleaved A/Bs because the per-round VM's speed drifts.
# These five queries are the standing calibration set — moderate-cost
# (>=0.5 s, so per-run jitter is small relative to the value),
# code-stable, spanning scan/agg (q05, q21), corpus n-gram aggregation
# (q70), exact dedup (q30), and text repetition (q37). The baseline is
# their min-of-3 from the r14 driver bench at sf0.1
# (BENCH_DETAIL_r14.json) — the box both the r14 and r15 verdicts
# anchored their drift adjudication on. r17: q16 was swapped out for
# q70 (r14 min 1.6096 from the same BENCH_DETAIL_r14.json run; q70's
# only change since r14 is a collect-time None guard with zero per-row
# cost) so the q16 percentile rewrite the r16 verdict queued could land
# without invalidating the calibration. Every sf0.1 run now reports
# box_factor = sentinel_total / SENTINEL_BASELINE_TOTAL and a
# sentinel-normalized total alongside the raw one, so classifying a
# cross-round delta as box drift vs code change is mechanical: compare
# normalized totals, not raw ones. EDITING ANY SENTINEL QUERY'S CODE
# INVALIDATES THE CALIBRATION — replace it here (with a fresh baseline
# from the round before the edit) in the same commit.
SENTINEL_BASELINE = {
    "q05": 0.5498,
    "q21": 0.6315,
    "q30": 0.5881,
    "q37": 1.2003,
    "q70": 1.6096,
}
SENTINEL_BASELINE_SF = 0.1
SENTINEL_BASELINE_TOTAL = round(sum(SENTINEL_BASELINE.values()), 4)


def sentinel_block(short_timings: dict[str, float], sf: float) -> dict:
    """The calibration block for a bench run: present-sentinel totals,
    the box factor vs the r14 baseline, or factor None off-sf / when a
    sentinel is missing (a partial sentinel set would silently skew the
    factor, so it refuses instead)."""
    present = {k: short_timings[k] for k in SENTINEL_BASELINE if k in short_timings}
    block: dict = {
        "sentinels": present,
        "baseline": SENTINEL_BASELINE,
        "baseline_sf": SENTINEL_BASELINE_SF,
        "box_factor": None,
    }
    if sf == SENTINEL_BASELINE_SF and len(present) == len(SENTINEL_BASELINE):
        total = sum(present.values())
        block["box_factor"] = round(total / SENTINEL_BASELINE_TOTAL, 4)
    return block


def current_round(repo_root: str) -> int:
    """The round the driver is about to record = max existing
    BENCH_r*.json + 1 (the driver writes BENCH_rN.json AFTER running
    this script). Names the per-round detail copy (VERDICT r11 #3)."""
    import glob
    import re

    recorded = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_root, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return max(recorded, default=0) + 1


def per_round_detail_path(repo_root: str, cpus: int) -> str:
    """Path for the per-round detail copy. VERDICT r16 #4 (naming wart):
    the driver's post-record scaling sweep runs this script at a
    NON-default core count, and an unsuffixed per-round copy from that
    sweep would shadow the canonical record for the next round.
    Off-default-cpu runs therefore carry a _c{cpus} suffix; only runs at
    the box's full core count write the plain BENCH_DETAIL_r{N}.json the
    cross-round tooling reads."""
    cpu_suffix = "" if cpus == (os.cpu_count() or cpus) else f"_c{cpus}"
    return os.path.join(
        repo_root,
        f"BENCH_DETAIL_r{current_round(repo_root):02d}{cpu_suffix}.json",
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from reddit_big_data_spark.plans.cache import release_local_checkpoints
    from reddit_big_data_spark.registry import all_queries
    from reddit_big_data_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus)
    queries = all_queries()

    # Warm the JVM/codegen paths once on a trivial action so the first timed
    # query doesn't pay session start-up.
    spark.range(1000).selectExpr("sum(id)").collect()
    # ... and the parquet reader + whole-stage-codegen + Arrow Python worker
    # pool on one UNTIMED small query, so the alphabetically-first timed
    # queries don't absorb one-time costs every later query rides for free
    # (standard bench hygiene: measure steady state, not cold start).
    try:
        queries["q12_top_n_rows"].fn(spark, sf_dir).collect()
    except Exception as exc:
        # A failed warmup means the first timed queries absorb cold-start
        # costs — surface it instead of silently skewing them (ADVICE r4).
        print(f"bench: warmup query failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    spark.range(100).mapInPandas(lambda it: it, "id long").count()
    spark.catalog.clearCache()

    runs: dict[str, list[float]] = {name: [] for name in queries}
    errors: dict[str, str] = {}
    order = sorted(queries)
    for rep in range(reps):
        for name in order:
            try:
                # Time construction + execution: iterative operators
                # (connected components, k-means, sketch-seeded plans) do
                # real cluster work while BUILDING the DataFrame, and
                # excluding it would under-report them. Each pass rebuilds
                # the DataFrame so plan-construction cost is inside every
                # sample, same as round-5 single-run numbers.
                t0 = time.perf_counter()
                df = queries[name].fn(spark, sf_dir)
                _force(df)
                runs[name].append(round(time.perf_counter() - t0, 4))
            except Exception as exc:  # keep benching the rest
                # Retry on every remaining pass: a load spike must not
                # permanently exclude a query (that would defeat the
                # min-of-N noise defense). A query is a FAILURE only if
                # every pass failed — a later success supersedes earlier
                # transient errors, an earlier success means the failed
                # pass just contributes no sample.
                errors[name] = f"{type(exc).__name__}: {exc}"[:80]
                print(f"bench: {name} FAILED (pass {rep + 1}): "
                      f"{errors[name]}", file=sys.stderr)
            finally:
                # Operators that persist() internally (simjoin, LSH, IVF,
                # global-rank) cannot unpersist what their consumer hasn't
                # materialized yet; dropping the cache between queries
                # keeps blocks from accumulating across the sweep and
                # distorting later timings (ADVICE r2). localCheckpoint
                # blocks are ContextCleaner-owned and outlive clearCache —
                # release them explicitly at the query boundary
                # (VERDICT r6 #5).
                spark.catalog.clearCache()
                release_local_checkpoints(spark)

    timings = {name: min(r) for name, r in runs.items() if r}
    detail = {
        name.split("_", 1)[0]: {
            "min": min(r),
            "spread": round(max(r) - min(r), 4),
            "runs": r,
        }
        for name, r in sorted(runs.items())
        if r
    }
    repo_root = os.path.dirname(os.path.abspath(__file__))
    short = {name.split("_", 1)[0]: t for name, t in sorted(timings.items())}
    calib = sentinel_block(short, sf)
    detail_payload = {"sf": sf, "cpus": cpus, "reps": reps,
                      "sentinel_calibration": calib,
                      "queries": detail}
    detail_paths = [os.path.join(repo_root, "BENCH_DETAIL.json")]
    # VERDICT r11 #3: BENCH_DETAIL.json is overwritten every run and the
    # driver's BENCH_rN.json keeps only a ~2 KB stdout tail, so per-query
    # cross-round diffs silently lost the first ~47 queries. Also write a
    # per-round copy (BENCH_DETAIL_r{N}.json, N = the round the driver is
    # about to record = max existing BENCH_r*.json + 1) so every round's
    # full {min, runs, spread} table survives; repeated runs within a
    # round overwrite the same file, so the driver's own sweep — the last
    # run of the round — is what persists.
    detail_paths.append(per_round_detail_path(repo_root, cpus))
    for detail_path in detail_paths:
        try:
            with open(detail_path, "w") as f:
                json.dump(detail_payload, f, indent=1, sort_keys=True)
        except OSError as exc:
            print(f"bench: could not write {detail_path}: {exc}",
                  file=sys.stderr)

    total = round(sum(timings.values()), 4)
    # The round-2 baseline subset (VERDICT r6 #6): BENCH_r02 timed exactly
    # q01..q66 at sf0.1 (157.8468s total). Emitting that subset's total
    # here makes the judge's 2x-bar comparison a single artifact read
    # instead of a hand-join of BENCH_DETAIL against BENCH_r02.
    baseline_prefixes = {f"q{i:02d}" for i in range(1, 67)}
    baseline_subset = {
        name: t
        for name, t in timings.items()
        if name.split("_", 1)[0] in baseline_prefixes
    }
    baseline_total = round(sum(baseline_subset.values()), 4)
    # Short qNN keys: the driver captures a bounded tail of stdout and
    # parses the JSON line out of it — round 2's full-name keys pushed the
    # line past the window and parsed=null. qNN prefixes are unique.
    result = {
        "metric": "total_query_wall_sec",
        "value": total,  # total of per-query MINS across the reps passes
        "unit": "sec",
        "queries": short,
        "sf": sf,
        "cpus": cpus,
        "n_queries": len(timings),
        "reps": reps,
        # Sum of mins over the 66 BENCH_r02 queries (q01..q66): compare
        # directly against r02's 157.8468s when sf == 0.1.
        "baseline_subset_total_sec": baseline_total,
        "baseline_subset_n": len(baseline_subset),
        # Box calibration (VERDICT r15 #4): this box's speed relative to
        # the r14 sentinel baseline. Cross-round comparisons should quote
        # the sentinel-normalized totals — raw totals confound code
        # changes with per-round VM drift (measured 1.1-1.5x between
        # rounds on byte-identical code). None off-sf0.1.
        "box_factor": calib["box_factor"],
        "normalized_total_sec": (
            round(total / calib["box_factor"], 4)
            if calib["box_factor"]
            else None
        ),
        "normalized_baseline_subset_sec": (
            round(baseline_total / calib["box_factor"], 4)
            if calib["box_factor"]
            else None
        ),
        # Aggregate noise indicator: sum of per-query (max-min) across the
        # interleaved passes — large values mean the box was noisy and
        # cross-round per-query deltas should not be trusted (SURVEY §6).
        "spread_total": round(
            sum(max(r) - min(r) for r in runs.values() if r), 2
        ),
        # Box context for cross-round comparisons: per-round VMs have
        # measured 1.5x apart with 2-10x per-query swings (SURVEY §6) —
        # the load average lets a reader judge how noisy this run was.
        "load_1m": round(os.getloadavg()[0], 2),
    }
    # failed = zero successful passes; transient per-pass errors on a
    # query that has at least one sample are not failures (its min just
    # rests on fewer samples).
    failures = {name: errors[name] for name in errors if not runs[name]}
    if failures:
        result["failures"] = {
            name.split("_", 1)[0]: msg for name, msg in failures.items()
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
