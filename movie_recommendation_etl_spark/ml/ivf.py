"""IVF (inverted-file) approximate nearest neighbors: KMeans coarse
quantizer + probe-limited equi-join search.

The scale path for embedding similarity when LSH recall disappoints:
partition the corpus into centroids' Voronoi cells, then search only the
``n_probe`` cells nearest each query. Candidate enumeration is an EQUI-join
on cluster id — shuffle-friendly, prunable, never all-pairs (a cross join at
100 TB is the thing this module exists to avoid). Centroids are tiny and
broadcast; per-query cell selection is a broadcast nested-loop over
n_centroids rows.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.vectors import cosine

SEED = 42


_SAMPLE_MOD = 1 << 20


def fit_ivf_centroids(
    emb: DataFrame,
    array_col: str = "embedding",
    *,
    id_col: str | None = None,
    n_centroids: int = 16,
    seed: int = SEED,
    max_fit_rows: int = 100_000,
    sample_fraction: float | None = None,
) -> KMeansModel:
    """Fit the coarse quantizer on a bounded sample, never the full corpus.

    Standard IVF practice: centroid quality saturates at ~1000 training
    points per centroid, so the fit reads at most ``max_fit_rows`` rows
    however large the corpus is — WITHOUT a counting prepass (the r3 fit
    paid a full ``count()`` plus a per-row vector→string cast before any
    clustering; two avoidable passes at 100 TB):

    - ``sample_fraction`` set: a deterministic fixed-modulus hash slice,
      ``pmod(xxhash64(key), 2^20) < 2^20·fraction`` — the q55 hash-mod
      pattern. Keyed on ``id_col`` when given (a cheap scalar; never a
      vector stringification), else on the array column as a last resort.
      Rerun-stable and uniform in expectation; no count needed because the
      modulus is fixed, not corpus-sized. At scale pass fraction ≈
      max_fit_rows / |corpus| estimate — an overestimate only means the
      limit cap below binds early.
    - Always: a ``limit(max_fit_rows)`` hard cap. Spark stops scheduling
      scan tasks once the limit is satisfied, so the fit's input pass is
      bounded by the cap, not the corpus.

    The sample is repartitioned to a few partitions: KMeans runs one
    scheduling wave per pass per partition, so a small training set spread
    over the session's full parallelism spends its wall-clock on task
    dispatch, not arithmetic (the repartition shuffles only the ≤ cap
    sample, never the corpus).
    """
    if sample_fraction is not None:
        key = F.col(id_col) if id_col else F.col(array_col).cast("string")
        emb = emb.filter(
            F.pmod(F.xxhash64(key), F.lit(_SAMPLE_MOD))
            < int(_SAMPLE_MOD * sample_fraction)
        )
    vecs = emb.select(array_to_vector(array_col).alias("__vec")).limit(
        max_fit_rows
    )
    rows_per_part = 25_000  # a pass over 25k 64-dim vectors is ~ms of CPU
    target_parts = max(1, max_fit_rows // rows_per_part)
    # random init + capped iterations: kmeans|| init costs ~2 extra jobs per
    # k-means round and each Spark job has fixed dispatch latency; a coarse
    # quantizer's cells only need to be roughly balanced (the n_probe search
    # re-ranks exactly), which 8 rounds from random init already delivers
    # (recall gate: tests/test_ivf_skew.py).
    km = KMeans(
        k=n_centroids,
        seed=seed,
        featuresCol="__vec",
        predictionCol="__cell",
        initMode="random",
        maxIter=8,
    )
    return km.fit(vecs.repartition(int(target_parts)))


def assign_cells(
    model: KMeansModel, emb: DataFrame, array_col: str = "embedding"
) -> DataFrame:
    """Attach the coarse cell id to every row (scan-stage transform)."""
    with_vec = emb.withColumn("__vec", array_to_vector(array_col))
    return model.transform(with_vec).drop("__vec").withColumnRenamed(
        "__cell", "cell"
    )


_CENTROID_SCHEMA = "cell: int, centroid: array<double>"


def _centroid_rows(model: KMeansModel) -> list[tuple]:
    return [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]


def _centroids_df(model: KMeansModel, spark) -> DataFrame:
    return spark.createDataFrame(_centroid_rows(model), _CENTROID_SCHEMA)


def ivf_knn(
    model: KMeansModel,
    dataset: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    array_col: str = "embedding",
    top_k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Probe-limited cosine top-k: (1) pick each query's n_probe nearest
    cells against the broadcast centroid table, (2) equi-join queries to
    dataset rows in those cells, (3) window top-k by cosine."""
    return ivf_knn_from_index(
        _centroids_df(model, dataset.sparkSession),
        assign_cells(model, dataset, array_col),
        queries,
        id_col=id_col,
        query_id_col=query_id_col,
        array_col=array_col,
        top_k=top_k,
        n_probe=n_probe,
    )


def save_ivf_index(
    model: KMeansModel,
    dataset: DataFrame,
    path: str,
    *,
    array_col: str = "embedding",
    quantize: bool = False,
    pq=None,
) -> None:
    """Persist the IVF index for serving: the tiny centroid table plus the
    cell-assigned corpus written ``partitionBy("cell")`` — so a probe-limited
    query's equi-join on cell becomes directory-level partition pruning at
    the parquet scan (n_probe of n_centroids directories read, the rest
    never touched). One columnar write of the corpus; no KMeans refit or
    re-assignment on restart (the LSH twin: save_ann_index).

    ``quantize=True`` additionally stores an int8 copy of each vector
    (functions.vectors.quantize_int8, the FAISS-SQ8 shape): the candidate
    scan then reads the 1-byte lanes only — ~4x less IO on the column that
    dominates similarity search at 100 TB — and ivf_recommend re-ranks the
    surviving handful of candidates against the full-precision column.

    ``pq`` (a fitted ml/pq.py:PQModel) additionally stores the m-code PQ
    column plus each vector's true L2 norm (the IVF-PQ tier: the candidate
    scan reads ~m smallints + one double per row instead of d floats — the
    codes-in-memory shape billion-vector systems serve from), and persists
    the codebooks under ``{path}/pq`` so a fresh process can rebuild query
    LUTs without refitting. Composable with ``quantize`` (both candidate
    representations stored; serving picks one)."""
    from movie_recommendation_etl_spark.functions.vectors import (
        norm2,
        quantize_int8,
    )

    from movie_recommendation_etl_spark.sources.writers import (
        write_local_rows_parquet,
    )

    # single-slice local write, not coalesce(1) — see write_local_rows_parquet
    write_local_rows_parquet(
        dataset.sparkSession,
        _centroid_rows(model),
        _CENTROID_SCHEMA,
        f"{path}/centroids",
        mode="overwrite",
    )
    cells = assign_cells(model, dataset, array_col)
    if quantize:
        cells = cells.withColumn("qvec", quantize_int8(F.col(array_col)))
    if pq is not None:
        from movie_recommendation_etl_spark.ml.pq import (
            encode_pq,
            save_pq_model,
        )

        cells = encode_pq(pq, cells, array_col).withColumn(
            "vnorm", norm2(F.col(array_col))
        )
        save_pq_model(dataset.sparkSession, pq, f"{path}/pq")
    cells.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/cells"
    )


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a save_ivf_index() directory → (centroids, cell-assigned
    corpus). The corpus frame keeps its cell partitioning column, so
    ivf_knn_from_index's cell equi-join prunes partitions."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/cells"),
    )


def _quantize_query(query_emb: list[float]):
    """Driver-side mirror of quantize_int8 for the literal query struct:
    scale = max|x|/127, q_i = half-up round(x_i/scale) (Spark F.round is
    HALF_UP; python round() is banker's — copysign/floor matches Spark)."""
    import math

    absmax = max(abs(float(x)) for x in query_emb)
    if absmax == 0.0:
        return 0.0, [0] * len(query_emb)
    scale = absmax / 127.0
    q = [
        int(math.copysign(math.floor(abs(float(x)) / scale + 0.5), x))
        for x in query_emb
    ]
    return scale, q


def _quantized_candidates(
    cells: DataFrame,
    probe: list[int],
    query_emb: list[float],
    *,
    id_col: str,
    n_candidates: int,
) -> DataFrame:
    """Stage-1 candidate scan of the quantized serving path: reads ONLY
    (id, qvec) from the probed cell directories — parquet column pruning
    keeps the full-precision float column unread (the ~4x IO saving), and
    the literal cell IN-list keeps the static partition pruning. Integer
    dot products in the hot loop (cosine_quantized)."""
    from movie_recommendation_etl_spark.functions.vectors import (
        cosine_quantized,
    )

    scale, q = _quantize_query(query_emb)
    q_lit = F.struct(
        F.lit(float(scale)).cast("double").alias("scale"),
        F.array(*[F.lit(int(x)).cast("tinyint") for x in q]).alias("q"),
    )
    return (
        cells.filter(F.col("cell").isin(probe))
        .select(
            id_col,
            cosine_quantized(q_lit, F.col("qvec")).alias("qsim"),
        )
        .orderBy(F.col("qsim").desc_nulls_last(), F.col(id_col))
        .limit(n_candidates)
    )


def _pq_candidates(
    cells: DataFrame,
    probe: list[int],
    query_emb: list[float],
    pq_model,
    *,
    id_col: str,
    n_candidates: int,
) -> DataFrame:
    """Stage-1 candidate scan of the IVF-PQ serving path: reads ONLY
    (id, pq_code, vnorm) from the probed cell directories — the float
    vector column stays unread entirely (vs SQ8's 1-byte lanes, PQ reads
    m smallints; at d=64/m=8 that is ~16x less candidate-scan IO than the
    float column). The ADC score is a pure-Catalyst LUT fold (ml/pq.py:
    adc_dot); cosine divides by the stored true norm. Zero-norm rows score
    NULL and sink below every candidate."""
    from movie_recommendation_etl_spark.ml.pq import adc_dot, adc_lut

    lut = adc_lut(pq_model, query_emb)
    nq = sum(float(x) * float(x) for x in query_emb) ** 0.5
    sim = F.when(
        F.col("vnorm") * F.lit(nq) == 0.0, F.lit(None).cast("double")
    ).otherwise(
        adc_dot(F.col("pq_code"), lut) / (F.col("vnorm") * F.lit(nq))
    )
    return (
        cells.filter(F.col("cell").isin(probe))
        .select(id_col, sim.alias("qsim"))
        .orderBy(F.col("qsim").desc_nulls_last(), F.col(id_col))
        .limit(n_candidates)
    )


def ivf_recommend(
    centroids_df: DataFrame,
    cells: DataFrame,
    query_emb: list[float],
    *,
    id_col: str = "vec_id",
    array_col: str = "embedding",
    top_k: int = 5,
    n_probe: int = 4,
    use_quantized: bool = False,
    pq_model=None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Single-query serving over a persisted index: pick the n_probe
    nearest cells DRIVER-SIDE (the centroid table is n_centroids rows —
    bounded metadata, same class of collect as recommend()'s key lookup)
    and filter the cell-partitioned corpus with a LITERAL IN-list, so the
    parquet scan carries static PartitionFilters — only n_probe of
    n_centroids directories are opened, plan-assertable, no join at all.
    The batch path (ivf_knn_from_index) keeps the join formulation for
    many queries at once.

    With ``use_quantized=True`` against an index saved with
    ``quantize=True``: stage 1 scores candidates over the int8 column only
    (column pruning leaves the float vectors unread — ~4x less scan IO),
    stage 2 exactly re-ranks the top ``top_k*rerank_factor`` survivors
    against the full-precision column. SQ8 cosine is within ~1% of exact
    (bound tested in tests/test_neardup_similarity.py), so with the
    default rerank_factor the final top_k matches the full-precision
    answer unless true similarities are packed tighter than the
    quantization error.

    With ``pq_model`` (a PQModel matching an index saved with ``pq=``):
    same two-stage shape, but stage 1 is the ADC scan over the m-smallint
    code column + stored norm (see _pq_candidates) — the most compressed
    candidate representation this engine serves from. When both are
    requested, PQ wins (it reads less)."""
    centroid_rows = centroids_df.collect()

    def _cos(c: list[float]) -> float:
        d = sum(float(x) * float(y) for x, y in zip(query_emb, c))
        nq = sum(float(x) * float(x) for x in query_emb) ** 0.5
        nc = sum(float(y) * float(y) for y in c) ** 0.5
        return d / (nq * nc) if nq and nc else 0.0

    probe = [
        r["cell"]
        for r in sorted(
            centroid_rows, key=lambda r: (-_cos(r["centroid"]), r["cell"])
        )[:n_probe]
    ]
    q_lit = F.array(*[F.lit(float(x)) for x in query_emb])
    scoped = cells.filter(F.col("cell").isin(probe))
    if pq_model is not None and "pq_code" in cells.columns:
        cand = _pq_candidates(
            cells,
            probe,
            query_emb,
            pq_model,
            id_col=id_col,
            n_candidates=top_k * rerank_factor,
        )
        cand_ids = [r[id_col] for r in cand.collect()]  # bounded: k*factor
        scoped = scoped.filter(F.col(id_col).isin(cand_ids))
    elif use_quantized and "qvec" in cells.columns:
        # Two-stage SQ8 serving: the wide scan touches only the int8 lanes;
        # the exact re-rank re-reads the probed directories with an id
        # IN-list (row-group min/max pruning) for top_k*rerank_factor rows.
        cand = _quantized_candidates(
            cells,
            probe,
            query_emb,
            id_col=id_col,
            n_candidates=top_k * rerank_factor,
        )
        cand_ids = [r[id_col] for r in cand.collect()]  # bounded: k*factor
        scoped = scoped.filter(F.col(id_col).isin(cand_ids))
    return (
        scoped.select(
            F.col(id_col).alias("neighbor_id"),
            cosine(q_lit, F.col(array_col)).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
        .limit(top_k)
        .withColumn(
            "rnk",
            F.row_number().over(
                W.orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
            ),
        )
    )


def ivf_knn_from_index(
    centroids_df: DataFrame,
    ds_cells: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    array_col: str = "embedding",
    top_k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """The IVF search core over materialized index frames (either freshly
    assigned via the fitted model, or loaded from a persisted index)."""
    centroids = F.broadcast(centroids_df)

    q_cells = (
        queries.crossJoin(centroids)
        .withColumn(
            "__cdist", cosine(F.col(array_col), F.col("centroid"))
        )
        .withColumn(
            "__crank",
            F.row_number().over(
                W.partitionBy(query_id_col).orderBy(
                    F.col("__cdist").desc(), F.col("cell")
                )
            ),
        )
        .filter(F.col("__crank") <= n_probe)
        .select(query_id_col, F.col(array_col).alias("__q_emb"), "cell")
    )

    pairs = q_cells.join(ds_cells, "cell").select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("__q_emb"), F.col(array_col)).alias("cosine_sim"),
    )
    # Per-QUERY window: query ids are high-cardinality, so partitions
    # spread across reducers and each holds only that query's probed
    # candidates (~n_probe x avg cell) — the single-window form is the
    # right shape here (operators/topk.py's contract; the two-stage form
    # is for LOW-cardinality groups). A pathologically hot CELL inflates
    # the join fan-out itself before this window — bound that upstream
    # with semantic/exact dedup of mass-duplicated embeddings.
    w = W.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
    )
