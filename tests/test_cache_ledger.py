"""Cache-ledger guard (VERDICT r5 #6): prove `spark.catalog.clearCache()`
is a SUFFICIENT mop-up after every registered query.

THE CENTRAL CACHE CONTRACT. Operators may persist() internally with a
lifetime longer than their function call, because the returned lazy plan
still reads the cached state:

- ANN index builds: `operators/pq.py` pq_topk (normalized corpus) and
  ivfpq_topk (normalized corpus, coarse cells, residuals);
  `operators/similarity.py` ivf_topk (cell assignment).
- Candidate pipelines: `operators/simjoin.py` similarity_join (hashed
  sets), `operators/dedup.py` minhash signatures,
  `queries/dedup.py` incremental near-dup (persisted signatures).
- `operators/clustering.py` kmeans_centers persists ONLY for the train
  loop and unpersists before returning (no entry outlives the call).

Every such persist MUST go through Dataset.persist() so it registers in
the SQL cache manager — then the session-level clearCache that bench.py
and tests/conftest.py run between queries reclaims it. What this sweep
rejects is the leak class that mop-up CANNOT reach: RDD-level persists
or any cached state that survives clearCache. localCheckpoint() blocks
are exempt — they are lineage-truncation state owned by the
ContextCleaner, which unpersists them as soon as the plan that holds
them is garbage-collected (they are also small: prefix rows, edge lists,
exact-top-k probes — never a corpus).
"""

from __future__ import annotations

import pytest

from reddit_big_data_spark.registry import all_queries
from tests.conftest import SF_SMOKE

_QUERIES = sorted(all_queries().values(), key=lambda q: q.name)


@pytest.mark.parametrize("query", _QUERIES, ids=lambda q: q.name)
def test_clear_cache_is_sufficient_mop_up(spark, query):
    df = query.fn(spark, SF_SMOKE)
    df.write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    leaked = []
    for rid in list(jmap.keySet().toArray()):
        head = jmap[rid].toDebugString().splitlines()[0]
        if "localCheckpoint" not in head:
            leaked.append(f"RDD {rid}: {head}")
    assert not leaked, (
        f"{query.name} left cached RDDs that clearCache cannot reclaim "
        f"(persist outside the SQL cache manager?):\n" + "\n".join(leaked)
    )
