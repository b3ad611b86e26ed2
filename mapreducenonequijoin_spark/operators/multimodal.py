"""Multimodal (binary) column plumbing (SURVEY.md §2.9, north-star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schema, Arrow batch transfer,
``mapInPandas`` signature, partition shape — is real and tested; the
actual media DECODING is stubbed behind ``NotImplementedError``
because the container ships no image/audio libraries (the fixture
"payload" is utf-8 text bytes, and the deterministic feature extractor
below computes byte-level features any decoder would also expose).

At 100 TB: binary payloads stay columnar in Parquet; feature
extraction is an Arrow-batched narrow map (no shuffle); downstream
analytics join on the extracted metadata, never on payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_binary_payload", "binary_features", "decode_image_stub"]


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of the text;
    in production: the image/audio blob read from storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_image_stub(payload: bytes) -> dict:
    """STUB — media decode. The container has no PIL/ffmpeg; a real
    deployment would decode here and emit width/height/duration etc.
    Deliberately loud so nobody mistakes the stub for a decoder."""
    raise NotImplementedError(
        "media decoding requires imaging libraries not present in this "
        "environment; byte-level features are provided by binary_features"
    )


def binary_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload:
    (id, byte_len, content_md5, head_byte). Runs as mapInPandas — the
    exact plumbing a real decoder UDF uses (iterator of pandas
    batches in, batches out; one Python worker per partition)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_byte": payloads.map(lambda b: int(bytes(b)[0])).astype(
                        "int64"
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract, schema=f"{id_col} long, byte_len long, content_md5 string, head_byte long"
    )
