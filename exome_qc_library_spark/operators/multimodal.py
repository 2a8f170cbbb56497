"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct,
processed through Arrow-batched ``mapInPandas`` — the same plumbing the
ingest stage uses for HTML bytes. The image/audio codec libraries are
not in this container, so the decode kernels are STUBS behind
``allow_stub`` (deterministic fake features) or ``NotImplementedError``;
the Spark-side contract — schema, batch iteration, partition behavior —
is real and tested.

Reference analog: the VEP external annotator pattern — an opaque
per-record enrichment kernel invoked over every row with its own config
(``/root/reference/vcf_import/import_vcf_vep_annotate.py:186``, K2).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)


def with_media_metadata(df: DataFrame, bin_col: str = "html") -> DataFrame:
    """Typed metadata over an opaque binary column — pure expressions."""
    b = F.col(bin_col)
    return df.withColumn(
        "media_meta",
        F.when(
            b.isNotNull(),
            F.struct(
                F.lit("text/html").alias("media_type"),
                F.length(b).cast("long").alias("n_bytes"),
                F.sha2(b, 256).alias("sha256"),
            ),
        ),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector: bytes of
    iterated sha256, scaled to [0,1). Stable across platforms."""
    out: list[float] = []
    h = payload
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(x / 256.0 for x in h)
    return out[:dim]


def decode_media_features(
    df: DataFrame,
    bin_col: str = "html",
    dim: int = 16,
    allow_stub: bool = True,
) -> DataFrame:
    """'Decode' binary payloads to feature vectors via mapInPandas.

    Real deployments replace ``_fake_features`` with an actual decoder
    (PIL/librosa/ffmpeg); the container lacks those libs, so without
    ``allow_stub`` this raises ``NotImplementedError`` (clearly-marked
    stub per task brief). Batch shape, Arrow transport, and schema are
    the production code path either way.
    """
    if not allow_stub:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this container"
        )
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("media_features", T.ArrayType(T.DoubleType()), True)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["media_features"] = pdf[bin_col].map(
                lambda b: None if b is None else _fake_features(bytes(b), dim)
            )
            yield pdf

    return df.mapInPandas(batches, schema=schema)


def frame_sample_plan(df: DataFrame, bin_col: str, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing stub: emits (frame_index) rows per media
    payload via posexplode of a planned index array; the decode itself is
    the stubbed kernel above. Demonstrates the explode-shaped schema a
    video pipeline needs without the codec."""
    n_frames = (F.length(F.col(bin_col)) / F.lit(1000)).cast("int")  # fake duration proxy
    idx = F.sequence(F.lit(0), F.greatest(n_frames, F.lit(0)), F.lit(every_n))
    return df.withColumn("frame_index", F.explode(idx))
