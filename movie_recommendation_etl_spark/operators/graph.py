"""Cluster resolution for near-dup pairs: distributed connected components.

A near-dup pipeline (operators/neardup.py) stops at PAIRS; deduplication at
100 TB needs the transitive closure — pair (a,b) and (b,c) must land doc a,
b, c in ONE cluster with one survivor. (The reference has no near-dup at
all — transform/execute.py:80 is a plain dropDuplicates(["id"]) — so this is
a north-star training-data-pipeline extension, not a parity port.)

Algorithm: Pregel-style minimum-label propagation. Every node starts labeled
with its own id; each round every node takes the min of its label and its
neighbors' labels; fixpoint = each node labeled with the min id of its
component. Rounds needed = graph diameter — for near-dup graphs that is tiny
(clusters are cliques-ish of copies), so the driver-side loop is bounded and
each round is one shuffle join + one map-side-combined min agg. The
convergence check is a single count action per round (no row data ever
reaches the driver).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 50,
) -> DataFrame:
    """(src, dst) edge list -> (node, cluster_id) with cluster_id = min node
    id in the connected component. Undirected: edges are symmetrized.

    Every round ends in ``localCheckpoint(eager=True)``: persisting alone is
    NOT enough for iterative plans — the logical plan still grows a level
    per round and Catalyst re-analyzes the whole tree each time (measured
    1.3s -> 49s per round by iteration 5 without truncation; flat with it).
    localCheckpoint stores blocks on executors, which is fine for a batch
    job; a long-running production cluster would point
    ``sparkContext.setCheckpointDir`` at reliable storage and use
    ``checkpoint()`` so executor loss cannot kill the lineage.

    Raises after ``max_iter`` rounds without convergence (a near-dup graph
    that deep means the banding threshold is catastrophically loose).
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    rev = edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    sym = fwd.union(rev).distinct().persist(StorageLevel.MEMORY_AND_DISK)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            nbr = (
                sym.join(labels, sym["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("lbl").alias("nbr_lbl"))
            )
            # The convergence flag rides the same pass as the label update —
            # a separate old-vs-new join would add a shuffle per round.
            new_lbl = F.least(F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl")))
            updated = (
                labels.join(nbr, labels["node"] == nbr["a"], "left")
                .select(
                    "node",
                    new_lbl.alias("lbl"),
                    # frame-qualified: the bare name would risk binding to
                    # the new "lbl" alias under lateral-alias resolution
                    (new_lbl != labels["lbl"]).alias("__changed"),
                )
                .localCheckpoint(eager=True)
            )
            changed = updated.filter("__changed").limit(1).count()
            labels = updated.drop("__changed")
            if changed == 0:
                return labels.select("node", F.col("lbl").alias("cluster_id"))
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
