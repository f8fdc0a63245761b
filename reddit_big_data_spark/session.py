"""SparkSession factory with scale-sane defaults.

The reference relies on Databricks Runtime defaults
(reference: code/project_starter_script.py:8). We pin the configs that
matter for a 1000-executor / 100 TB deployment and that also behave well
on local[N]:

- AQE on (runtime re-plan: coalesce shuffle partitions, skew-join split,
  sort-merge -> broadcast conversion once sizes are known).
- Arrow on for every driver edge (toPandas / pandas UDFs).
- Session timezone pinned to UTC so temporal semantics are deterministic
  and oracle-comparable (parquet timestamps are UTC micros; DuckDB reads
  them naive).
- Shuffle partitions sized to the parallelism of the target, not the
  Spark default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and desirable) to apply to an externally created
# session at runtime — everything here is a runtime-settable SQL conf.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Prune nested struct fields at the parquet scan (the reference's
    # submissions table is nested-heavy: SURVEY.md §1.2).
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # Read side: keep scan partitions near the default 128 MB so a 100 TB
    # table yields ~800k well-sized tasks rather than a few huge ones.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # The testdata's events.parquet stores TIMESTAMP(NANOS), which Spark's
    # vectorized reader rejects; read as long nanos and convert explicitly
    # (truncating to micros, matching DuckDB's nanos->micros behavior).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}
# Probed and declined (r17): spark.sql.parquet.aggregatePushdown would
# turn the corpus-sizing count() scalars into footer reads, but it only
# applies on the DSv2 parquet path — parquet sits in the default
# spark.sql.sources.useV1SourceList, and flipping the whole package to
# DSv2 to save ~0.3 s of count() is a plan-shape change far outside this
# round's risk budget.

# ANSI mode is the DEFAULT (round 16, VERDICT r15 #3): it is the Spark 4
# default on real clusters, where a raw x/0 or overflowing cast THROWS
# instead of yielding NULL. The package contract (VERDICT r14 #2) is that
# every query and operator is ANSI-clean — divisions that can see a zero
# denominator use try_divide / nullif guards, casts that can see
# malformed input use try_cast — proven by two full green oracle-mirror
# runs under the flag in r15 before the flip. SPARK_GRAFT_ANSI=0 opts
# back into legacy (NULL-yielding) mode for older-cluster parity; the
# round's canonical suite run is ANSI-on, with one legacy mirror run
# recorded alongside it (both modes must stay hash-green).
def ansi_enabled(env_val: str | None = None) -> bool:
    """ANSI-on unless explicitly opted out: unset/1/anything-truthy =>
    ANSI (the Spark 4 cluster default); 0/false/empty => legacy mode."""
    if env_val is None:
        env_val = os.environ.get("SPARK_GRAFT_ANSI", "1")
    return env_val not in ("0", "false", "")


RUNTIME_CONFS["spark.sql.ansi.enabled"] = (
    "true" if ansi_enabled() else "false"
)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Pin runtime confs on an existing session (e.g. the driver's).

    Queries in this package assume UTC session time and AQE; calling this
    is idempotent and cheap.
    """
    # Confs whose silent loss produces WRONG RESULTS (not just slower
    # plans): fail loudly at the set site instead of surfacing later as a
    # confusing parquet-reader or timestamp mismatch far from the cause.
    critical = {"spark.sql.session.timeZone", "spark.sql.legacy.parquet.nanosAsLong"}
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:  # pragma: no cover - build-specific confs
            if k in critical:
                raise RuntimeError(
                    f"required conf {k}={v} could not be set on this session"
                ) from exc
            import warnings

            warnings.warn(f"could not set {k}={v}: {exc}", stacklevel=2)
    return spark


def get_spark(
    app_name: str = "reddit_big_data_spark",
    cpus: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a local session sized for `cpus` threads.

    `extra_confs` lets a harness set confs that must be in place at
    session CREATION (static confs like spark.ui.retainedStages — the
    scaling harness disables stage eviction so cumulative
    AppStatusStore deltas stay exact, VERDICT r11 #7a). No effect on an
    already-created session: getOrCreate returns the existing one."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # date_format 'MMMM'/'E' render in the JVM default locale; pin
        # English so q17-style name columns match the (always-English)
        # DuckDB strftime oracle on any host locale.
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.language=en -Duser.country=US",
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
