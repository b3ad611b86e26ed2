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


FRAME_STRIDE = 64   # bytes between sampled frame starts
FRAME_SIZE = 16     # bytes per sampled frame
THUMB_STEP = 4      # byte stride inside the frame -> "thumbnail"


def frame_sample(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling over a binary payload (round 5): emit every
    FRAME_STRIDE-th FRAME_SIZE-byte window as its own row, plus a
    byte-strided THUMB_STEP "thumbnail" of the frame — the resize
    analogue. This is the exact plumbing a video frame-sampler UDF
    uses: ``mapInPandas`` with MORE rows out than in (one row per
    sampled frame), Arrow-batched, zero shuffle; a real deployment
    replaces the byte slicing with ffmpeg frame extraction + an image
    resize at the marked line. Only FULL frames are emitted, so the
    row count is a pure function of byte length.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, thumbs = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                # Byte-offset windows only equal the char-based substr
                # oracle for ASCII payloads, and a FRAME_SIZE window can
                # split a multi-byte codepoint. Fail loudly if a fixture
                # regeneration ever introduces non-ASCII text (ADVICE r5).
                if not data.isascii():
                    raise ValueError(
                        f"frame_sample: non-ASCII payload for {id_col}="
                        f"{rid}; byte windows would split codepoints and "
                        "diverge from the char-based oracle"
                    )
                n = ((len(data) - FRAME_SIZE) // FRAME_STRIDE + 1
                     if len(data) >= FRAME_SIZE else 0)
                for i in range(n):
                    frame = data[i * FRAME_STRIDE: i * FRAME_STRIDE + FRAME_SIZE]
                    # REAL DECODE/RESIZE GOES HERE (ffmpeg/PIL absent:
                    # byte slicing stands in, same batch shape)
                    thumb = frame[::THUMB_STEP]
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(frame.decode("utf-8"))
                    thumbs.append(thumb.decode("utf-8"))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_text": pd.Series(frames, dtype="object"),
                    "thumb_text": pd.Series(thumbs, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        sample,
        schema=(
            f"{id_col} long, frame_idx long, frame_text string, "
            "thumb_text string"
        ),
    )
