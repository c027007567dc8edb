"""Multimodal span processing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched pandas
UDFs over ``mapInPandas``. The decode step itself is STUBBED in this
environment (no image/audio libraries in the container): ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic md5-derived feature vector stands in for the real decoder.
The Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def media_table(spans: DataFrame) -> DataFrame:
    """Media spans → (doc_id, media_ref, kind, payload, n_bytes).

    In production ``payload`` is fetched from object storage by ref; here the
    deterministic stand-in payload is the UTF-8 ref itself (the fetch is I/O
    plumbing, not algorithmic content).
    """
    media = spans.where(F.col("media_ref") != "")
    payload = F.encode(F.col("media_ref"), "UTF-8")
    return media.select(
        "doc_id",
        "media_ref",
        "kind",
        payload.alias("payload"),
        F.length(F.col("media_ref")).cast("int").alias("n_bytes"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic md5-derived pseudo-embedding (decoder stand-in).

    Block ``i`` is md5(payload ‖ ":" ‖ str(i)) — a string-safe seed so the
    DuckDB oracle can recompute features from the media_ref alone
    (contract.py ``multimodal_features``); each digest yields four
    big-endian-uint32 floats in [-0.5, 0.5).
    """
    out: list[float] = []
    i = 0
    while len(out) < FEATURE_DIM:
        h = hashlib.md5(payload + b":" + str(i).encode()).digest()
        for k in range(0, 16, 4):
            if len(out) >= FEATURE_DIM:
                break
            out.append(int.from_bytes(h[k : k + 4], "big") / 2**32 - 0.5)
        i += 1
    return out


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Real decode is unavailable in this container; ``fake=True`` substitutes
    the deterministic md5 feature extractor (same batch shape, schema, and
    partitioning as a real decoder would use).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present in "
                    "this container; run with fake=True for the deterministic "
                    "stand-in extractor"
                )
            feats = [ _fake_features(bytes(p)) for p in pdf["payload"] ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
