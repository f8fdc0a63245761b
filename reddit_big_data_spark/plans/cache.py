"""Explicit release path for localCheckpoint blocks (VERDICT r6 #5).

The session cache contract (tests/test_cache_ledger.py) is that
``spark.catalog.clearCache()`` between queries reclaims every
operator-internal ``persist()``. What clearCache CANNOT reach are
``localCheckpoint()`` blocks: they are owned by the ContextCleaner,
which only unpersists them after the JVM garbage-collects the plan that
holds them — and a long-lived driver (py4j keeps object handles alive
until Python finalizers run; the status store keeps recent executions
warm) can keep them pinned indefinitely. At bench scale they are small
(prefix rows, edge lists, scalar probes), but in a long 100 TB session
they would accumulate.

``release_local_checkpoints(spark)`` closes the loop: it walks the
context's persistent-RDD map and explicitly unpersists every block
whose lineage head marks it as a local checkpoint. Call it ONLY at a
query boundary — after every consumer of the current query's frames has
run its action — because a released checkpoint cannot be recomputed
(localCheckpoint truncates lineage by design). bench.py and the test
suite's between-query mop-up both call it right after clearCache.
"""

from __future__ import annotations


def release_local_checkpoints(spark, blocking: bool = False) -> list[int]:
    """Unpersist every ContextCleaner-owned localCheckpoint block.

    Returns the released RDD ids. Safe ONLY between queries: any plan
    still holding one of these frames loses its data irrecoverably
    (lineage was truncated at checkpoint time)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released: list[int] = []
    for rid in list(jmap.keySet().toArray()):
        jrdd = jmap[rid]
        head = jrdd.toDebugString().splitlines()[0]
        if "localCheckpoint" in head:
            jrdd.unpersist(blocking)
            released.append(int(rid))
    return released
