"""SemDeDup-style semantic deduplication over an embedding column.

The public recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540, applied to
LAION/C4): k-means the corpus embeddings, compare pairs ONLY within each
cluster, and keep one representative from every group whose pairwise
cosine clears an epsilon. It removes *semantic* duplicates — re-encodes,
paraphrases, re-crops — that lexical MinHash (operators/neardup.py) and
sign-pattern SRP blocking (plans/dedup_similarity.py q53) can miss, and it
is the third, complementary recall profile in this engine's near-dup
stack: exact fingerprint < lexical shingle < embedding band < semantic
cell.

Scale shape:
- The coarse quantizer is the SAME bounded-sample KMeans the IVF tier
  uses (ml/ivf.py:fit_ivf_centroids) — one bounded scan to fit, one
  scan-stage transform to assign cells. ``n_centroids`` is THE knob:
  pick k ~ corpus/target_cell_size so the within-cell pair join stays
  bounded (the paper runs k=50k over 5 B LAION rows for ~100k-row
  cells). Pair enumeration is an EQUI-join on the cell id — shuffle-
  friendly, AQE-splittable, never all-pairs across cells.
- Each row's L2 norm is precomputed as a SCALAR column before the
  shuffle, and the epsilon test is ``dot(a,b) >= eps * na * nb``
  (equivalent to cosine >= eps for positive norms) — one dot fold per
  pair, one norm fold per row. Deliberately NOT an array-normalizing
  ``transform``: a lambda body that embeds the norm fold re-evaluates
  it per ELEMENT (HOFs don't CSE), turning the scan into O(d^2) per
  row; a scalar column crosses the exchange materialized.
- Transitive closure of the epsilon graph reuses the distributed
  connected-components operator (operators/graph.py — O(log diameter)
  rounds, pointer doubling), so a chain a~b~c collapses to ONE group
  even when cos(a, c) < eps, and the survivor choice is deterministic
  (min id per group — the engine-wide deterministic-survivor policy,
  operators/dedup.py; the paper keeps a random/centroid-far member,
  which is not rerun-stable).

Deliberate semantics, documented for parity readers: duplicates split
across two cells are NOT compared (the paper's known blocking trade-off);
raising n_probe-style multi-assignment would trade shuffle volume for
recall and is intentionally out of scope. Zero-norm embeddings have no
defined cosine and are never flagged as duplicates.

The reference has no embedding operators at all (its only dedup is
``dropDuplicates(["id"])`` — transform/execute.py:80); this is a
north-star training-data extension.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.vectors import dot, norm2

log = logging.getLogger(__name__)


def semantic_dup_groups(
    cells: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    eps: float = 0.95,
    max_cell_size: int = 10_000,
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Within-cell epsilon-cosine grouping over a cell-assigned corpus
    (ml/ivf.py:assign_cells output — or any blocking column you like in
    ``cell_col``).

    Returns one row per input row: (id_col, cell_col, group_id, is_kept)
    where ``group_id`` is the min id of the row's epsilon-connected
    within-cell group (its own id when unique) and ``is_kept`` marks the
    deterministic survivor. Input ids must be unique (run exact dedup
    first — the engine's curation order already does).

    ``max_cell_size`` bounds the within-cell quadratic (the r14 bucket-
    guard policy, extended here in r15): k-means sends a mass-duplicated
    embedding cluster to ONE cell no matter how large ``n_centroids`` is,
    and the plain within-cell self-join would emit B*(B-1)/2 pairs for a
    B-row cell. Cells over the cap are LOUDLY logged and hub-joined
    instead — every member pairs only against the cell's min-id row, with
    the same epsilon verification — so candidate volume stays linear.
    Semantics of the degraded cells: epsilon-duplicates OF THE HUB (which
    includes every exact/near-exact re-encode, cos ~ 1 to everything)
    still land in one group; merely-similar chains that connect only
    through non-hub members may fragment. ``stats`` receives
    ``{"overflow_cells": n, "max_cell_size_seen": m}``.

    The input frame is consumed three times (both sides of the pair join
    plus the final labeling join) — plus a cell-size pass for the guard:
    at corpus scale persist it — or pass the cell-partitioned frame of a
    persisted IVF index (ml/ivf.py:load_ivf_index), whose parquet
    re-reads are cheap and column-pruned. Laziness of the corpus frame is
    preserved here on purpose; an internal persist of a corpus-sized
    frame is the caller's memory call, not the operator's.
    """
    base = cells.select(
        F.col(id_col).alias("__id"),
        F.col(cell_col).alias("__cell"),
        F.col(vec_col).alias("__vec"),
        norm2(F.col(vec_col)).alias("__nrm"),
    )
    # Cell-size guard (see docstring): the overflow frame is bounded at
    # rows/max_cell_size entries — eager checkpoint + count, the same
    # detection shape as operators/neardup.banded_candidate_pairs.
    over = (
        base.groupBy("__cell")
        .agg(F.count(F.lit(1)).alias("__csz"), F.min("__id").alias("__hub"))
        .filter(F.col("__csz") > max_cell_size)
        .localCheckpoint(eager=True)
    )
    n_over = over.count()
    if stats is not None:
        stats["overflow_cells"] = n_over
    if n_over:
        biggest = over.agg(F.max("__csz")).first()[0]
        if stats is not None:
            stats["max_cell_size_seen"] = biggest
        log.warning(
            "semantic_dup_groups: %d cell(s) exceed max_cell_size=%d "
            "(largest: %d rows); pairing those cells' members against "
            "their min-id hub only — epsilon-duplicates of the hub still "
            "group together, non-hub-connected chains may fragment",
            n_over,
            max_cell_size,
            biggest,
        )
        normal = base.join(over, "__cell", "left_anti")
        over_members = base.join(over, "__cell")
        hubs = over_members.filter(F.col("__id") == F.col("__hub")).select(
            F.col("__cell").alias("__hcell"),
            F.col("__vec").alias("__hvec"),
            F.col("__nrm").alias("__hnrm"),
        )
        star_edges = (
            over_members.filter(F.col("__id") != F.col("__hub"))
            .join(hubs, F.col("__cell") == F.col("__hcell"))
            .filter(
                (F.col("__hnrm") > 0.0)
                & (F.col("__nrm") > 0.0)
                & (
                    dot(F.col("__hvec"), F.col("__vec"))
                    >= F.lit(float(eps)) * F.col("__hnrm") * F.col("__nrm")
                )
            )
            .select(
                F.col("__hub").alias("src"), F.col("__id").alias("dst")
            )
        )
    else:
        normal, star_edges = base, None
    a = normal.alias("a")
    b = normal.alias("b")
    # zero-norm rows have no defined cosine: the > 0 guards keep them out
    # (without them, dot = 0 >= eps * 0 would pair every zero vector)
    edges = (
        a.join(
            b,
            (F.col("a.__cell") == F.col("b.__cell"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .filter(
            (F.col("a.__nrm") > 0.0)
            & (F.col("b.__nrm") > 0.0)
            & (
                dot(F.col("a.__vec"), F.col("b.__vec"))
                >= F.lit(float(eps)) * F.col("a.__nrm") * F.col("b.__nrm")
            )
        )
        .select(
            F.col("a.__id").alias("src"), F.col("b.__id").alias("dst")
        )
    )
    if star_edges is not None:
        edges = edges.unionByName(star_edges)
    from movie_recommendation_etl_spark.operators.graph import (
        connected_components,
    )

    # Materialize the (small, O(ε-pairs)) edge frame before CC like every
    # other caller: connected_components reads the edges twice on the
    # distributed path (the bounded gate collect + the symmetrize scan;
    # one action each since r18) — on a lazy frame the second read
    # re-executes the per-pair dot-product join (r17).
    edges = edges.localCheckpoint(eager=True)
    comp = connected_components(
        edges, checkpoint_dir=checkpoint_dir, stats=stats
    )
    out = (
        base.join(comp, base["__id"] == comp["node"], "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__cell").alias(cell_col),
            F.coalesce(F.col("cluster_id"), F.col("__id")).alias(
                "group_id"
            ),
        )
        .withColumn("is_kept", F.col("group_id") == F.col(id_col))
    )
    return out


def semantic_dedup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.95,
    n_centroids: int = 16,
    model=None,
    keep: str = "min_id",
    max_cell_size: int = 10_000,
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """One-call SemDeDup: fit (or reuse) the coarse quantizer, assign
    cells, group within-cell epsilon-duplicates, and return the input
    rows filtered to the survivors (original columns preserved; the
    cell/group metadata stays internal — use ``semantic_dup_groups``
    directly for audit output).

    ``keep`` picks the retention policy, deterministic either way:
    - ``"min_id"`` (default): the engine-wide deterministic-survivor rule.
    - ``"centroid_far"``: the paper's policy — keep the group member with
      the LOWEST cosine to its cell centroid (ties broken by min id),
      retaining the most atypical example of each duplicate family. One
      extra broadcast join against the tiny centroid table plus one
      group-keyed window; the paper's random choice is not rerun-stable,
      so it is deliberately not offered.

    Pass a prefitted ``model`` (ml/ivf.py KMeansModel) to share the
    quantizer with an IVF ANN index — dedup and serving then agree on the
    cell geometry for free.
    """
    from movie_recommendation_etl_spark.ml.ivf import (
        _centroids_df,
        assign_cells,
        fit_ivf_centroids,
    )

    if keep not in ("min_id", "centroid_far"):
        raise ValueError(f"unknown keep policy: {keep!r}")
    if model is None:
        model = fit_ivf_centroids(
            emb, vec_col, id_col=id_col, n_centroids=n_centroids
        )
    cells = assign_cells(model, emb, vec_col)
    groups = semantic_dup_groups(
        cells,
        id_col=id_col,
        vec_col=vec_col,
        eps=eps,
        max_cell_size=max_cell_size,
        checkpoint_dir=checkpoint_dir,
        stats=stats,
    )
    if keep == "min_id":
        kept = groups.filter("is_kept").select(id_col)
    else:
        from movie_recommendation_etl_spark.functions.vectors import cosine
        from movie_recommendation_etl_spark.operators.dedup import (
            asc_nulls_last,
            dedup_keep_first,
        )

        cent = F.broadcast(_centroids_df(model, emb.sparkSession))
        scored = (
            cells.join(cent, "cell")
            .select(
                id_col,
                cosine(F.col(vec_col), F.col("centroid")).alias("__csim"),
            )
        )
        # one survivor per duplicate group, farthest-from-centroid first:
        # the r16 min_by aggregate form (operators/dedup.py) — a window
        # here would funnel a mega-group (mass-duplicated embeddings chain
        # across cells into ONE connected component) into a single sorting
        # task; the agg pre-reduces it per input partition.
        kept = dedup_keep_first(
            groups.join(scored, id_col).select("group_id", id_col, "__csim"),
            ["group_id"],
            [asc_nulls_last("__csim"), F.col(id_col)],
        ).select(id_col)
    return emb.join(kept, id_col, "left_semi")
