"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched feature extraction via mapInPandas.

North-star requirement: a 100 TB training-data pipeline carries image/audio/
video as ``binary`` columns next to a metadata struct, and runs decode /
feature-extract / resize / frame-sample as Pandas-batched UDFs. The Spark
plumbing here — schema, partition sizing, batch shape, deterministic
fingerprinting — is real and tested; the codec step itself is stubbed
(``decode=True`` raises NotImplementedError: no image/audio libs in this
container) behind a deterministic byte-level feature fake, so swapping in
PIL/ffmpeg later changes ONE function, not the pipeline.

Scale notes: binary payloads make rows big — size
``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits executor
memory, and keep ``spark.sql.execution.arrow.maxRecordsPerBatch`` small
enough that an Arrow batch of blobs does too. Feature extraction is
embarrassingly parallel (mapInPandas, no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("byte_histogram_head", T.ArrayType(T.IntegerType())),
    ]
)


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary payload per row (the UTF-8 of the text, doubled)
    plus a typed metadata struct — a stand-in for real image/audio bytes
    that keeps every downstream batch shape honest."""
    data = F.encode(F.concat(F.col(text_col), F.col(text_col)), "UTF-8")
    meta = F.struct(
        F.lit("fake/blob").alias("media_type"),
        F.length(data).cast("int").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    return docs.withColumn("media_data", data).withColumn("media_meta", meta)


def decode_media(blob: bytes, media_type: str):
    """The codec boundary. Real decoders (PIL / torchaudio / pyav) plug in
    here; this container has none, so calling it is an explicit error
    rather than a silent fake."""
    raise NotImplementedError(
        f"no codec available for {media_type!r}: install an image/audio "
        "library and replace decode_media"
    )


def extract_media_features(
    media: DataFrame,
    *,
    id_col: str = "doc_id",
    data_col: str = "media_data",
    meta_col: str = "media_meta",
    decode: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    With ``decode=False`` (default) computes byte-level features only
    (md5 fingerprint + a 8-bucket byte histogram) — deterministic, testable,
    and exactly the I/O shape a real decoder would see.
    """

    def _batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            out = {
                "doc_id": [],
                "media_type": [],
                "n_bytes": [],
                "content_md5": [],
                "byte_histogram_head": [],
            }
            for doc_id, blob, meta in zip(
                pdf[id_col], pdf[data_col], pdf[meta_col]
            ):
                media_type = meta["media_type"]
                if decode:
                    decode_media(bytes(blob), media_type)
                b = bytes(blob)
                hist = [0] * 8
                for byte in b[:4096]:
                    hist[byte >> 5] += 1
                out["doc_id"].append(doc_id)
                out["media_type"].append(media_type)
                out["n_bytes"].append(len(b))
                out["content_md5"].append(hashlib.md5(b).hexdigest())
                out["byte_histogram_head"].append(hist)
            yield pd.DataFrame(out)

    cols = media.select(id_col, data_col, meta_col)
    return cols.mapInPandas(_batches, schema=MEDIA_FEATURES_SCHEMA)
