"""Extensibility surface (SURVEY.md §2.11 X2): Arrow-batched pandas_udf and
applyInPandas grouped operators for logic the built-in expressions can't
express.

Policy (mirrors the reference's accidental virtue — zero Python in its hot
path): built-in Catalyst expressions FIRST; vectorized Arrow-batched pandas
second; row-at-a-time Python UDFs never. The two operators here are the
blessed templates: a scalar pandas_udf (columnar in, columnar out) and an
applyInPandas grouped transform (shuffle on the group key, then whole-group
pandas logic per partition-local group).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def burstiness(values: pd.Series) -> pd.Series:
    """Vectorized scalar example: token-repetition 'burstiness' of a text —
    1 - unique_tokens/total_tokens. Whole Arrow batches cross the Python
    boundary once (~10-100x over row-at-a-time UDFs)."""
    toks = values.str.split(" ")
    total = toks.str.len().astype("float64")
    uniq = toks.map(lambda t: len(set(t))).astype("float64")
    return 1.0 - (uniq / total)


def grouped_zscore(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    output_col: str = "zscore",
) -> DataFrame:
    """applyInPandas grouped transform: per-group standardization. One
    shuffle on the group key; each group materializes as a single pandas
    frame, so keys must be well-sized (salt or pre-aggregate a skewed key
    before using this — a 10^9-row group will not fit an executor)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(output_col, T.DoubleType())]
    )

    def _standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        std = v.std(ddof=0)
        pdf[output_col] = (v - v.mean()) / std if std > 0 else 0.0
        return pdf

    return df.groupBy(*group_cols).applyInPandas(_standardize, out_schema)


def text_burstiness(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("burstiness", burstiness(F.col(text_col)))


@pandas_udf(T.DoubleType())
def geometric_mean(values: pd.Series) -> float:  # GROUPED_AGG shape
    """Custom pandas UDAF (grouped-aggregate pandas_udf): geometric mean —
    an aggregate Catalyst has no built-in for. Partial batches stream
    through Arrow; usable in groupBy().agg() and over windows."""
    import numpy as np

    v = values.dropna()
    if v.empty or (v <= 0).any():
        return float("nan")
    return float(np.exp(np.log(v.astype("float64")).mean()))


def grouped_geometric_mean(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        geometric_mean(F.col(value_col)).alias("geo_mean")
    )


# --- Python UDTF (Spark 4): table-VALUED extension point ---------------------
#
# The third extension shape after scalar pandas_udf and grouped
# applyInPandas: one input row fans out to N output rows with their own
# schema. Arrow-optimized (useArrow=True) so batches cross the Python
# boundary columnar, like the pandas UDFs above. Same policy applies — this
# is the expressiveness escape hatch; when posexplode(split(...)) can state
# the same thing, Catalyst's JVM path wins (the test pins equivalence
# against exactly that formulation).


def _make_sentence_udtf():
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="sentence_idx int, sentence string, n_tokens int",
        useArrow=True,
    )
    class SplitSentences:
        def eval(self, text: str):
            import re

            if text is None:
                return
            parts = [
                s.strip() for s in re.split(r"[.!?]+", text) if s.strip()
            ]
            for i, s in enumerate(parts):
                yield i, s, len(s.split())

    return SplitSentences


def sentence_table(
    df: DataFrame, text_col: str = "text", id_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """Explode each document into its sentences via a LATERAL join against
    the UDTF — one (id, sentence_idx, sentence, n_tokens) row per sentence.
    The lateral correlation keeps this a per-row fan-out (no shuffle added
    beyond the scan).

    The input view name is unique per call and dropped immediately after
    analysis (spark.sql resolves the plan eagerly, so the returned frame
    does not need the view): concurrent/interleaved calls — threaded Spark
    driving is in-repo reality via warm_catalog's pool — never clobber each
    other's input, and nothing leaks into the session catalog."""
    import uuid

    spark = df.sparkSession
    spark.udtf.register("split_sentences", _make_sentence_udtf())
    view = f"__udtf_in_{uuid.uuid4().hex}"
    df.select(*id_cols, text_col).createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"SELECT {', '.join(id_cols)}, s.* "
            f"FROM {view}, LATERAL split_sentences({text_col}) s"
        )
    finally:
        spark.catalog.dropTempView(view)
