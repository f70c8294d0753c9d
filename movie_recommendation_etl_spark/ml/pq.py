"""Product quantization (PQ) for embedding columns: m-byte codes + ADC scan.

The third compression tier of the ANN stack, after full-precision floats
and SQ8 (functions/vectors.py:quantize_int8, ~4x). PQ is the public
FAISS/ScaNN recipe for billion-vector search: split each d-dim vector into
``m`` subvectors, k-means each subspace into ``ksub`` centroids, and store
only the per-subspace centroid ids — ``m`` small ints per vector instead of
``d`` floats (d=64, m=8: 256 B -> ~8-16 B, before parquet dictionary
encoding shrinks the near-uniform code ints further). Queries score
candidates with ADC (asymmetric distance computation): one m x ksub lookup
table of exact query-sub x centroid dot products, then each candidate's
approximate dot product is m table lookups — no float vector is read at
all in the candidate scan.

Spark-first shape, stage by stage:

- FIT reads ONE bounded sample of the corpus (the same hash-mod +
  ``limit`` discipline as ml/ivf.py:fit_ivf_centroids — no counting
  prepass, scan tasks stop at the cap) and k-means the m subspaces
  DRIVER-SIDE in vectorized numpy. Deliberate divergence from the IVF
  fit's MLlib KMeans: PQ needs m independent fits of tiny problems
  (<= max_fit_rows rows, d/m dims each), and m MLlib fits pay m x
  maxIter Spark job dispatches to distribute milliseconds of arithmetic;
  the collected sample is bounded metadata by construction
  (max_fit_rows x d floats, ~25 MB at the defaults — same class as the
  centroid-table collect in ivf_recommend).
- ENCODE is the one Arrow ``pandas_udf`` in the pipeline, and it runs at
  INDEX-BUILD time only (amortized once per corpus write, like the
  parquet encode itself). A 256-way argmin against literal centroids is
  exactly the expression Catalyst cannot codegen without a
  quadratic-size tree, i.e. the documented boundary where the engine
  drops to vectorized numpy over Arrow batches.
- ADC SERVING is pure Catalyst: the per-query lookup table is an
  ``array<array<double>>`` literal (m x ksub doubles — constant-folded
  once per query plan), and the candidate score is
  ``zip_with(code, lut, (c, l) -> l[c]) |> sum`` — JVM codegen riding
  the scan of the ``pq_code`` column, no Python worker at serve time
  (plan-asserted in tests/test_pq.py).

Cosine comes from ADC the same way the SQ8 path gets it: the index stores
each vector's true L2 norm (one double, computed JVM-side at encode time),
and cosine ~= adc_dot / (|q| * vnorm). The serving path re-ranks the top
``k * rerank_factor`` ADC survivors against the full-precision column, so
quantization error costs candidates, not final-answer precision.

The reference has no embedding operators at all (its vectors are TF-IDF
sparse, consumed only by LSH — transform/execute.py:250-258); PQ extends
the north-star similarity stack (q60 brute / q61 LSH / q62 IVF) with the
memory-resident-codes tier those systems use at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42

_SAMPLE_MOD = 1 << 20


@dataclass(frozen=True, eq=False)
class PQModel:
    """Per-subspace codebooks: shape (m, ksub, d // m), float64.

    ``eq=False``: the generated __eq__ would `==` the numpy field and
    raise on truth-testing the elementwise result; compare codebooks
    explicitly (np.array_equal) where identity matters (tests do)."""

    dim: int
    m: int
    ksub: int
    codebooks: np.ndarray  # (m, ksub, dsub)

    @property
    def dsub(self) -> int:
        return self.dim // self.m


def _lloyd(
    x: np.ndarray, k: int, *, iters: int, rng: np.random.Generator
) -> np.ndarray:
    """Vectorized Lloyd k-means for one subspace (n x dsub sample, tiny by
    construction). Empty clusters reseed to the point farthest from its
    assigned centroid — the standard FAISS-style repair, keeps all ksub
    codes usable."""
    n = x.shape[0]
    cent = x[rng.choice(n, size=min(k, n), replace=False)].copy()
    if cent.shape[0] < k:
        # degenerate tiny sample: cycle it to k rows (np.resize tiles —
        # the old single concatenate under-filled whenever n < k/2 and
        # the update loop then indexed past the array)
        cent = np.resize(cent, (k, x.shape[1]))
    for _ in range(iters):
        # (n, k) squared distances via ||x||^2 - 2xC^T + ||C||^2
        d2 = (
            (x * x).sum(1, keepdims=True)
            - 2.0 * (x @ cent.T)
            + (cent * cent).sum(1)
        )
        assign = d2.argmin(1)
        # empty-cluster repair: DISTINCT farthest points, one per empty
        # cluster (a single shared reseed left duplicate centroids whose
        # argmin ties make all but the first code permanently dead)
        far = np.argsort(-d2[np.arange(n), assign])
        t = 0
        for j in range(k):
            mask = assign == j
            if mask.any():
                cent[j] = x[mask].mean(0)
            else:
                cent[j] = x[far[t % n]]
                t += 1
    return cent


def fit_pq(
    emb: DataFrame,
    array_col: str = "embedding",
    *,
    id_col: str | None = None,
    m: int = 8,
    ksub: int = 256,
    seed: int = SEED,
    iters: int = 10,
    max_fit_rows: int = 100_000,
    sample_fraction: float | None = None,
) -> PQModel:
    """Train the m per-subspace codebooks on a bounded corpus sample.

    Sampling mirrors fit_ivf_centroids: an optional deterministic hash-mod
    slice (``pmod(xxhash64(key), 2^20) < 2^20 * fraction`` — rerun-stable,
    no count prepass) plus a hard ``limit(max_fit_rows)`` cap, so the
    fit's input pass is bounded by the cap however large the corpus is.
    The k-means itself runs driver-side in numpy (see module docstring for
    why that beats m MLlib fits here). ``ksub`` must fit the smallint code
    column (<= 32767; the practical ceiling is 256 — one byte per code
    after parquet dictionary encoding).
    """
    if ksub > 32767:
        raise ValueError(f"ksub={ksub} exceeds the smallint code range")
    if sample_fraction is not None:
        key = F.col(id_col) if id_col else F.col(array_col).cast("string")
        emb = emb.filter(
            F.pmod(F.xxhash64(key), F.lit(_SAMPLE_MOD))
            < int(_SAMPLE_MOD * sample_fraction)
        )
    rows = emb.select(array_col).limit(max_fit_rows).collect()
    if not rows:
        raise ValueError(
            "PQ fit sample is empty — check sample_fraction / the input "
            "table"
        )
    x = np.asarray([r[0] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.stack(
        [
            _lloyd(
                np.ascontiguousarray(x[:, j * dsub : (j + 1) * dsub]),
                ksub,
                iters=iters,
                rng=rng,
            )
            for j in range(m)
        ]
    )
    return PQModel(dim=dim, m=m, ksub=ksub, codebooks=books)


def encode_pq(
    model: PQModel,
    df: DataFrame,
    array_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Attach the m-code column (``array<smallint>``, values 0..ksub-1).

    Arrow-batched pandas_udf: each batch becomes one (batch, d) float64
    matrix; per subspace the argmin against the (ksub, dsub) codebook is a
    single matrix product. Index-BUILD-time cost only — the serving scan
    reads the codes, it never re-encodes.
    """
    books = model.codebooks  # captured; broadcast with the serialized udf
    m, dsub = model.m, model.dsub

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.ShortType()))
    def _encode(batch):
        import pandas as pd

        if batch.isna().any():
            raise ValueError(
                "encode_pq: NULL embedding in index-build input — filter "
                f"null {array_col!r} rows before building the PQ tier"
            )
        # length check BEFORE np.asarray: on numpy >= 1.24 a ragged list
        # of arrays raises an opaque "inhomogeneous shape" ValueError at
        # construction, so the actionable message must come first
        dims = {len(v) for v in batch}
        if dims and dims != {m * dsub}:
            raise ValueError(
                f"encode_pq: embedding dim(s) {sorted(dims)} != "
                f"model dim {m * dsub}"
            )
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in batch]
        )
        if x.size == 0:
            return pd.Series([], dtype=object)
        codes = np.empty((x.shape[0], m), dtype=np.int16)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            cent = books[j]
            d2 = (
                (sub * sub).sum(1, keepdims=True)
                - 2.0 * (sub @ cent.T)
                + (cent * cent).sum(1)
            )
            codes[:, j] = d2.argmin(1).astype(np.int16)
        return pd.Series(list(codes))

    return df.withColumn(code_col, _encode(F.col(array_col)))


def decode_pq(model: PQModel, codes: np.ndarray) -> np.ndarray:
    """Driver-side reconstruction (tests / diagnostics): (n, m) int codes
    -> (n, dim) float64 approximations."""
    return np.concatenate(
        [model.codebooks[j][codes[:, j]] for j in range(model.m)], axis=1
    )


def adc_lut(model: PQModel, query_emb: list[float]) -> list[list[float]]:
    """The per-query ADC table: lut[j][c] = dot(query_sub_j, codebook[j][c]).
    m x ksub doubles — bounded, computed driver-side per query, embedded as
    a plan literal by adc_dot."""
    q = np.asarray(query_emb, dtype=np.float64)
    if q.shape[0] != model.dim:
        raise ValueError(
            f"query dim {q.shape[0]} != model dim {model.dim}"
        )
    dsub = model.dsub
    return [
        (model.codebooks[j] @ q[j * dsub : (j + 1) * dsub]).tolist()
        for j in range(model.m)
    ]


def adc_dot(
    code_col: Column | str, lut: "list[list[float]] | Column"
) -> Column:
    """Approximate dot(query, vector) from the code column: m element_at
    lookups into the LUT, folded in double. ``lut`` is either the m x ksub
    Python lists of a single driver-side query (embedded as a plan
    literal) or a Column of ``array<array<double>>`` (the batch path's
    per-row LUT, adc_lut_col). Pure Catalyst either way — this is the
    serving path's hot expression and it carries no Python."""
    c = F.col(code_col) if isinstance(code_col, str) else code_col
    lut_col = (
        lut
        if isinstance(lut, Column)
        else F.array(
            *[
                F.array(*[F.lit(float(v)) for v in row])
                for row in lut
            ]
        )
    )
    return F.aggregate(
        F.zip_with(
            c,
            lut_col,
            lambda code, row: F.element_at(row, code.cast("int") + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def adc_lut_col(model: PQModel, q: Column | str) -> Column:
    """Per-ROW ADC lookup table for the batch path: lut[j][c] =
    dot(q_sub_j, codebook[j][c]) computed entirely in Catalyst against the
    codebook LITERAL (m x ksub x dsub doubles — a constant-folded plan
    node; 16k literals at the m=8/ksub=256 default, analyzed once per
    plan, ~m*ksub*dsub multiplies per query row at runtime). Keeps the
    many-query path Python-free end to end; the single-query path uses
    the cheaper driver-side adc_lut instead."""
    qc = F.col(q) if isinstance(q, str) else q
    dsub = model.dsub
    cb = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(v)) for v in cent])
                    for cent in model.codebooks[j]
                ]
            )
            for j in range(model.m)
        ]
    )
    return F.transform(
        cb,
        lambda row, j: F.transform(
            row,
            lambda cent: F.aggregate(
                F.zip_with(
                    F.slice(qc, j * F.lit(dsub) + 1, dsub),
                    cent,
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ),
    )


def pq_knn_from_index(
    centroids_df,
    cells: DataFrame,
    queries: DataFrame,
    pq_model: PQModel,
    *,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    array_col: str = "embedding",
    top_k: int = 5,
    n_probe: int = 4,
    rerank_factor: int = 4,
) -> DataFrame:
    """Many-query IVF-PQ search over a persisted index (the batch twin of
    ivf_recommend's PQ path, shaped like ml/ivf.py:ivf_knn_from_index).

    1. Each query picks its n_probe cells against the broadcast centroid
       table and computes its ADC LUT in the same projection (adc_lut_col
       — Catalyst, no Python).
    2. The cell equi-join enumerates candidates reading ONLY
       (id, pq_code, vnorm) from the corpus side; the ADC fold scores
       each pair from m table lookups. A per-query window keeps the top
       ``top_k * rerank_factor``.
    3. Survivors re-rank exactly: the bounded candidate set BROADCASTS
       back onto the corpus, so the big side never shuffles — and the
       join carries the candidate's CELL alongside its id, so on a
       cell-partitioned persisted index dynamic partition pruning
       confines the float-column scan to the probed directories
       (plan-asserted in tests/test_pq.py).

    Returns (query_id, neighbor_id, cosine_sim, rnk) with rnk <= top_k,
    self-matches excluded — directly comparable to ivf_knn_from_index.
    """
    from pyspark.sql import Window as W

    from movie_recommendation_etl_spark.functions.vectors import (
        cosine,
        norm2,
    )

    centroids = F.broadcast(centroids_df)
    q_cells = (
        queries.crossJoin(centroids)
        .withColumn("__cdist", cosine(F.col(array_col), F.col("centroid")))
        .withColumn(
            "__crank",
            F.row_number().over(
                W.partitionBy(query_id_col).orderBy(
                    F.col("__cdist").desc(), F.col("cell")
                )
            ),
        )
        .filter(F.col("__crank") <= n_probe)
        # The LUT is projected on the n_probe surviving rows, so the fold
        # evaluates n_probe times per query — deliberate: hoisting it to a
        # once-per-query projection would either carry the ~m*ksub-double
        # payload through the crossJoin x n_centroids window shuffle, or
        # cost an extra query_id exchange to join it back; n_probe-1
        # redundant scan-stage folds are cheaper than either.
        .select(
            query_id_col,
            F.col(array_col).alias("__q_emb"),
            adc_lut_col(pq_model, array_col).alias("__lut"),
            norm2(array_col).alias("__q_norm"),
            "cell",
        )
    )
    adc = adc_dot("pq_code", F.col("__lut"))
    qsim = F.when(
        F.col("vnorm") * F.col("__q_norm") == 0.0,
        F.lit(None).cast("double"),
    ).otherwise(adc / (F.col("vnorm") * F.col("__q_norm")))
    # per-QUERY window — high-cardinality partitions, the single-window
    # form's correct case (see operators/topk.py and ml/ivf.py's note)
    cand_w = W.partitionBy(query_id_col).orderBy(
        F.col("__qsim").desc_nulls_last(), F.col("neighbor_id")
    )
    candidates = (
        q_cells.join(
            cells.select("cell", id_col, "pq_code", "vnorm"), "cell"
        )
        .select(
            query_id_col,
            "__q_emb",
            "cell",
            F.col(id_col).alias("neighbor_id"),
            qsim.alias("__qsim"),
        )
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("__crnk", F.row_number().over(cand_w))
        .filter(F.col("__crnk") <= top_k * rerank_factor)
        .select(query_id_col, "__q_emb", "cell", "neighbor_id")
    )
    rerank = F.broadcast(candidates).join(
        cells.select(
            "cell", F.col(id_col).alias("neighbor_id"), array_col
        ),
        ["cell", "neighbor_id"],
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        rerank.select(
            query_id_col,
            "neighbor_id",
            cosine(F.col("__q_emb"), F.col(array_col)).alias("cosine_sim"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
    )


def save_pq_model(spark, model: PQModel, path: str) -> None:
    """Persist codebooks as one small parquet table (m x ksub rows of
    (sub, code, centroid)) — readable by any engine, no pickle."""
    from movie_recommendation_etl_spark.sources.writers import (
        write_local_rows_parquet,
    )

    rows = [
        (j, c, model.codebooks[j][c].tolist())
        for j in range(model.m)
        for c in range(model.ksub)
    ]
    # single-slice local write, not coalesce(1) — see write_local_rows_parquet
    write_local_rows_parquet(
        spark,
        rows,
        "sub: int, code: int, centroid: array<double>",
        path,
        mode="overwrite",
    )


def load_pq_model(spark, path: str) -> PQModel:
    rows = spark.read.parquet(path).collect()
    m = max(r["sub"] for r in rows) + 1
    ksub = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["centroid"])
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in rows:
        books[r["sub"], r["code"]] = r["centroid"]
    return PQModel(dim=m * dsub, m=m, ksub=ksub, codebooks=books)
