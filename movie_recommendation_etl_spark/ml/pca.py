"""PCA dimensionality reduction for embedding columns: the standard
pre-processing step before large-scale similarity search (reduce 768-dim
model embeddings to 64-128 principal dims, then index — the public
FAISS/ScaNN recipe: shuffle bytes and distance FLOPs drop by the ratio,
recall barely moves when the spectrum decays).

Spark-first shape:
- FIT: MLlib ``PCA`` over an assembled vector column. The covariance
  summary is computed in one distributed pass; only the d x k projection
  matrix lands on the driver (d = input dim, k = output dim — KBs, not
  data-sized).
- TRANSFORM: the projection is a JVM matrix multiply per row, scan-stage,
  no shuffle, no Python.
- The reduced column converts back to ``array<double>`` so every existing
  engine primitive (functions/vectors.py cosine/dot, ml/ivf.py, the
  brute-force top-k) composes unchanged.

The reference has no embedding ops at all (its vectors are TF-IDF sparse,
consumed only by LSH — transform/execute.py:250-258); this extends the
north-star embedding pipeline (q60-q63) with the scale path for
high-dimensional inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_pca(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 16,
):
    """Fit a k-component PCA on an ``array<numeric>`` column. Returns the
    fitted MLlib PCAModel (``model.explainedVariance`` gives the spectrum —
    pick k where it flattens)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    prepared = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "__pca_in"
        )
    )
    pca = PCA(k=k, inputCol="__pca_in", outputCol="__pca_out")
    return pca.fit(prepared)


def reduce_embeddings(
    model,
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    output_col: str = "reduced",
) -> DataFrame:
    """Append the PCA-projected embedding as ``array<double>``. Scan-stage
    JVM matrix multiply — composes with cosine/top-k/IVF unchanged."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    with_vec = df.withColumn(
        "__pca_in", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    # copy() so the caller's model instance keeps ITS column params — a
    # shared model used concurrently (or later with other column names)
    # must not silently inherit this call's internal __pca_* names
    projected = (
        model.copy()
        .setInputCol("__pca_in")
        .setOutputCol("__pca_out")
        .transform(with_vec)
    )
    return projected.withColumn(
        output_col, vector_to_array(F.col("__pca_out"))
    ).drop("__pca_in", "__pca_out")
