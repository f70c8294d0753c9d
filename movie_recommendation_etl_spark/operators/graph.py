"""Cluster resolution for near-dup pairs: distributed connected components.

A near-dup pipeline (operators/neardup.py) stops at PAIRS; deduplication at
100 TB needs the transitive closure — pair (a,b) and (b,c) must land doc a,
b, c in ONE cluster with one survivor. (The reference has no near-dup at
all — transform/execute.py:80 is a plain dropDuplicates(["id"]) — so this is
a north-star training-data-pipeline extension, not a parity port.)

Algorithm: Pregel-style minimum-label propagation with pointer doubling.
Every node starts labeled with its own id; each round every node takes the
min of its label, its neighbors' labels, and its label's label (the
doubling hop — label distance halves per round); fixpoint = each node
labeled with the min id of its component. Rounds needed = O(log diameter) —
for near-dup graphs (cliques-ish clusters plus occasional chains) that is
2-4 rounds, each one candidate join + one union-min hash aggregation + one
hop join (two big-frame exchanges per round). Convergence is detected by
the exact (decimal) label sum going stationary — labels only decrease, so
an unchanged sum proves an unchanged labeling with one scalar aggregation
per round (no row data ever reaches the driver).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_labels(pairs: list[tuple]) -> dict:
    """Driver-side union-find with min-id roots — the small-graph fast
    path's kernel. Path-compressing; union always roots at the smaller
    id, so the final find(x) IS the component minimum (identical to the
    distributed fixpoint)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    small_graph_threshold: int = 100_000,
    broadcast_label_threshold: int = 1_000_000,
    edges_distinct: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """(src, dst) edge list -> (node, cluster_id) with cluster_id = min node
    id in the connected component. Undirected: edges are symmetrized.
    Edges with a NULL endpoint are dropped (both paths — r18): they carry
    no connectivity, and a null node id never appears in the output.

    Every round ends in a checkpoint: persisting alone is NOT enough for
    iterative plans — the logical plan still grows a level per round and
    Catalyst re-analyzes the whole tree each time (measured 1.3s -> 49s per
    round by iteration 5 without truncation; flat with it). By default the
    checkpoint is ``localCheckpoint`` (executor blocks — fine for a batch
    job). Pass ``checkpoint_dir`` (reliable storage: HDFS/S3) to switch to
    RELIABLE ``checkpoint()`` so executor loss mid-run cannot kill the
    lineage; the scope helper (operators/_checkpoint.py) restores the
    session's previous checkpoint dir and deletes this run's checkpoint
    files after the result is detached onto local blocks — per-round
    durability without leaking a labels copy per iteration. Results are
    identical either way (asserted in tests/test_graph_property.py).

    Raises after ``max_iter`` rounds without convergence (a near-dup graph
    that deep means the banding threshold is catastrophically loose).

    ``broadcast_label_threshold`` (r18) picks the middle tier between the
    driver fast path and the full shuffled fixpoint: when the node count
    (known free from the seed aggregation) is at or under it, each
    round's two joins broadcast the LABELS side — nodes-sized, tiny next
    to the symmetrized edge frame — so the 2 x |edges| rows are never
    shuffled or sorted per round; the only per-round exchange left is the
    map-side-combined min aggregation. Measured on a 377k-node / 5.3M-edge
    near-dup graph: the sort-merge rounds' sym sorts dominate CC cost,
    and the broadcast tier removes them. The default (1M nodes ~ 50 MB
    broadcast) is conservative for a 16 GB driver; a billion-node graph
    takes the shuffled plan untouched. The label evolution is identical —
    only the join strategy changes (equality fuzzed in
    tests/test_graph_property.py).

    ``edges_distinct`` (r20) declares that the input edge list is already
    duplicate-free as DIRECTED pairs with no reverse twins — e.g. the
    verified near-dup pairs every repo caller feeds in, which are distinct
    with ``doc_a < doc_b`` by construction. The symmetrized frame
    ``fwd ∪ rev`` is then provably duplicate-free (fwd has a<b, rev has
    a>b, no overlap), so its ``distinct()`` — a full shuffle + hash
    aggregation of 2·|edges| rows, the single largest exchange in a 1-2
    round run (guide §2.4: "a distinct on data that is already unique") —
    is skipped. Labels are UNAFFECTED either way: duplicate edges cannot
    change a min-label fixpoint (min is idempotent), so a caller passing
    True on non-distinct input still gets identical results, just with
    redundant per-round candidate rows instead of one up-front dedup.

    ``stats`` (optional dict) receives ``{"rounds": n}`` — the number of
    propagation rounds actually executed. 0 on the empty-edge
    short-circuit and on the small-graph fast path (which additionally
    reports ``fast_path_edges``); a seed labeling that is already final
    still reports 1 on the distributed path, because detecting
    convergence takes one propagation+comparison round
    (the loop has no oracle for "already converged" short of running it).
    Tests pin the expected
    round count on known graphs so a seeding/convergence change that
    silently adds rounds fails a test instead of drifting the bench
    (pointer doubling: rounds = O(log diameter), 1-2 on clique-ish
    near-dup graphs).
    """
    from movie_recommendation_etl_spark.operators._checkpoint import (
        reliable_checkpoint_scope,
    )

    # Null-endpoint edges are dropped on BOTH paths (r18, VERDICT r17 #4b):
    # an edge with a null endpoint carries no connectivity, and the r17
    # shape — fast path dropna()ing while the distributed path carried a
    # null-`a` group through the symmetrized frame — let the two paths
    # produce different label sets on the same (degenerate) input despite
    # the identical-labels contract. tests/test_graph_property.py plants
    # null endpoints and fuzzes both paths against each other.
    clean = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).dropna()

    # Small-graph fast path (r17): every distributed round costs 2-3 jobs
    # of pure scheduling latency (~2.6 s measured for a 1.8k-node graph on
    # local[32] — the same per-stage tax right_size_materialized kills
    # elsewhere), while a bounded edge list resolves driver-side in
    # milliseconds. The edge frame is persisted and counted FIRST (r18,
    # VERDICT r17 #4a): one full, fully-parallel execution of a lazy
    # lineage — not the r17 count()+toPandas() pair that ran it twice,
    # and deliberately NOT limit(n+1).toPandas(), whose CollectLimit
    # executes serial scale-up waves (1, 4x, ... partitions — several
    # sequential job boundaries at the 0.3-0.8 s/stage tax this fast path
    # exists to avoid). The fast path's collect then reads the cache; the
    # distributed path builds its symmetrized frame off the same cache
    # (no recompute) and releases it once sym is materialized. Pass
    # small_graph_threshold=0 to force the distributed path (the
    # round-count tests do) — the gate cache is skipped entirely, so a
    # billion-pair graph never pays an extra materialization it didn't
    # opt into.
    src_type = edges.schema[src].dataType
    gate_cached = bool(
        small_graph_threshold and src_type == edges.schema[dst].dataType
    )
    if gate_cached:
        clean = clean.persist(StorageLevel.MEMORY_AND_DISK)
        # Release the gate cache on ANY exit from the fast path (r19,
        # ADVICE r18: a toPandas/createDataFrame failure between persist
        # and the success-path unpersist leaked the MEMORY_AND_DISK cache
        # for the session — sym below is released in a finally, the gate
        # cache deserves the same guarantee).
        try:
            n_edges = clean.count()
            if n_edges <= small_graph_threshold:
                from pyspark.sql import types as T

                pdf = clean.toPandas()
                clean.unpersist()
                labels = _union_find_labels(
                    list(zip(pdf["a"].tolist(), pdf["b"].tolist()))
                )
                if stats is not None:
                    stats["rounds"] = 0
                    stats["fast_path_edges"] = n_edges
                schema = T.StructType(
                    [
                        T.StructField("node", src_type),
                        T.StructField("cluster_id", src_type),
                    ]
                )
                return edges.sparkSession.createDataFrame(
                    sorted(labels.items()), schema
                )
        except BaseException:
            clean.unpersist()
            raise

    fwd = clean
    rev = clean.select(F.col("b").alias("a"), F.col("a").alias("b"))
    sym = fwd.union(rev)
    if not edges_distinct:
        sym = sym.distinct()
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)

    with reliable_checkpoint_scope(
        edges.sparkSession, checkpoint_dir
    ) as _ckpt:
        # Seed labels with min(node, min neighbor) instead of the identity:
        # from identity labels, round 1's expensive sym-join reduces to
        # exactly this aggregation (neighbor labels ARE neighbor ids), so
        # seeding this way buys the first propagation hop with one
        # map-side-combined agg — no join — and replaces the node-list
        # distinct (same shuffle key) rather than adding a shuffle. One
        # fewer full round on typical near-dup graphs.
        try:
            labels = _ckpt(
                sym.groupBy("a")
                .agg(F.min("b").alias("__mb"))
                .select(
                    F.col("a").alias("node"),
                    F.least(F.col("a"), F.col("__mb")).alias("lbl"),
                )
            )
        finally:
            if gate_cached:
                # the eager seed checkpoint just materialized sym off the
                # gate cache (or died trying — r19, ADVICE r18: release on
                # the failure path too); sym's own persist carries the
                # rounds from here
                clean.unpersist()
        try:
            # Convergence tracking: labels only ever DECREASE (every update
            # is a min with more candidates), so the exact label sum is
            # stationary iff no label changed — one decimal-exact
            # aggregation per round replaces the old per-row __changed
            # flag, whose old-vs-new bookkeeping forced a third join.
            #
            # Seeded from the INITIAL labeling, not None: an already-
            # converged seed (common: clique-ish near-dup clusters where
            # min(node, min-neighbor) is final) now exits after round 1,
            # and an EMPTY edge list short-circuits here instead of
            # summing NULL forever and raising after max_iter rounds —
            # zero near-dup pairs is a perfectly normal corpus.
            if stats is not None:
                stats["rounds"] = 0
            # Node count rides the SAME aggregation as the convergence
            # sum — the broadcast-tier gate costs zero extra jobs.
            first = labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            prev_sum, n_nodes = first["s"], first["n"]
            if prev_sum is None:
                return labels.select(
                    "node", F.col("lbl").alias("cluster_id")
                ).localCheckpoint(eager=True)
            bcast = (
                broadcast_label_threshold
                and n_nodes <= broadcast_label_threshold
            )
            if stats is not None:
                stats["broadcast_tier"] = bool(bcast)
            for _round in range(max_iter):
                # min(own label, neighbors' labels) as ONE shuffle: union
                # the neighbor-candidate stream with the labels themselves
                # and take the per-node min — replaces the former
                # join+agg+left-join round shape (two exchanges on the big
                # frame) with a single hash aggregation; the join that
                # produces candidates shuffles sym once on b (labels
                # arrive hash-partitioned on node from the previous
                # round's agg). In the broadcast tier the nodes-sized
                # labels side broadcasts instead, so sym streams straight
                # off its cached blocks — no shuffle, no sort of the
                # 2 x |edges| frame at all.
                cand = sym.join(
                    F.broadcast(labels) if bcast else labels,
                    sym["b"] == labels["node"],
                ).select(sym["a"].alias("node"), "lbl")
                stepped = (
                    labels.unionByName(cand)
                    .groupBy("node")
                    .agg(F.min("lbl").alias("lbl"))
                )
                if bcast:
                    # Materialize before the self-referencing hop join:
                    # broadcasting `hop` would otherwise rebuild stepped's
                    # whole lineage (the big cand scan) a second time per
                    # round. Nodes-sized by the gate, so the checkpoint is
                    # small; _ckpt keeps the reliable-mode durability
                    # contract.
                    stepped = _ckpt(stepped)
                # Pointer doubling: follow the label one extra hop (label of
                # my label) so label distance halves per round — convergence
                # in O(log diameter) rounds instead of O(diameter). Every
                # lbl is an existing node id (a min over node ids), so the
                # hop join always matches; left join keeps the no-match case
                # safe anyway.
                hop = stepped.select(
                    F.col("node").alias("h_node"), F.col("lbl").alias("h_lbl")
                )
                doubled_lbl = F.least(
                    F.col("lbl"), F.coalesce("h_lbl", F.col("lbl"))
                )
                updated = _ckpt(
                    stepped.join(
                        F.broadcast(hop) if bcast else hop,
                        stepped["lbl"] == hop["h_node"],
                        "left",
                    )
                    .select("node", doubled_lbl.alias("lbl"))
                )
                # Exact decimal sum. decimal(38,0) holds ~1e38 of total
                # label mass — unreachable in practice, but non-ANSI
                # overflow would return NULL, and two NULL rounds must not
                # compare equal: require cur_sum non-NULL to converge.
                cur_sum = updated.agg(
                    F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
                ).first()["s"]
                labels = updated
                if stats is not None:
                    stats["rounds"] = _round + 1
                if cur_sum is not None and cur_sum == prev_sum:
                    # detach the result from the (about-to-be-deleted)
                    # reliable files; a no-op cost in local mode
                    return labels.select(
                        "node", F.col("lbl").alias("cluster_id")
                    ).localCheckpoint(eager=True)
                prev_sum = cur_sum
        finally:
            sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
