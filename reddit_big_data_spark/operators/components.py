"""Connected components over an edge DataFrame — the terminal step of
every dedup pipeline: near-dup PAIRS become duplicate CLUSTERS, and each
cluster keeps one canonical document.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round, a node adopts the minimum label among itself
and its neighbors; convergence when no label changes. Rounds needed = the
longest shortest-path from any node to its component's minimum — small
for dedup graphs (near-dup clusters are dense and tiny). For adversarial
long-chain graphs, the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014) converges in O(log n) rounds with the same per-round join shape —
the swap is localized here.

Scale notes: each round is one shuffle join (edges x labels, keyed on the
node id) plus a groupBy-min — partial aggregation collapses the neighbor
lists map-side. Labels are localCheckpoint()ed every round: lineage would
otherwise double per iteration and re-execute the whole history on every
action. The convergence test is a count() per round (driver scalar, not a
collect of data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_union_find(edge_rows: list, spark, id_type) -> DataFrame:
    """Union-find with path compression over collected edges — the
    small-graph short-circuit. Components are labeled by their minimum
    member id, matching the distributed path exactly."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min: keep the smaller id as the root so the root IS
            # the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    from pyspark.sql import types as T

    rows = [(x, find(x)) for x in parent]
    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("comp", id_type)]
    )
    return spark.createDataFrame(rows, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Return (id, component) for every node appearing in `edges`, where
    component = the minimum node id reachable through undirected edges.

    Two paths, chosen by edge count (the same shape-gated strategy AQE
    applies to joins): at or under `driver_threshold` edges the graph is
    solved by driver-side union-find (<=16 MB collected at the default —
    one pass, no per-round job launches, which dominate wall time on
    dedup-sized graphs); above it, iterative distributed min-label
    propagation. Both label components by their minimum member id.

    Raises RuntimeError if the distributed path hasn't converged within
    max_iter rounds (dedup graphs converge in a handful; hitting the cap
    means the input is not a dedup-shaped graph and the large-star
    variant should be used).
    """
    # Materialize the edge list once: the count, and every propagation
    # round after it, reuse this instead of re-executing the upstream plan
    # (e.g. a similarity join) per action.
    sym = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .localCheckpoint()
    )
    if sym.count() <= 2 * driver_threshold:  # sym holds both directions
        directed = sym.filter(F.col("src") < F.col("dst"))
        return _driver_union_find(
            [(r["src"], r["dst"]) for r in directed.collect()],
            edges.sparkSession,
            sym.schema["src"].dataType,
        )
    # Symmetric edge list => every node occurs as a src.
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("comp").alias("__nbr"))
            .withColumnRenamed("dst", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("__nbr", "comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Collapse verified near-dup pairs into clusters: (doc_id, cluster_id,
    cluster_size), cluster_id = the minimum member id (the canonical
    survivor a pipeline would keep). Only clustered docs appear — every
    node in `pairs` has >= 1 edge, so all cluster sizes are >= 2."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "comp").select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
    )
