"""Multimodal (binary) column plumbing (SURVEY.md §2.9, north-star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schema, Arrow batch transfer,
``mapInPandas`` signature, partition shape — is real and tested, and
so is the image DECODE: the container ships no PIL/ffmpeg, so instead
of stubbing the codec this module implements a binary **PPM (P6)**
encoder/decoder in pure numpy — a real raster format (netpbm) with a
real header parse, raw-pixel-buffer decode, and per-image statistics.
A production deployment swaps ``decode_ppm`` for a PIL/ffmpeg call
with the SAME mapInPandas shape; everything else is unchanged.

At 100 TB: binary payloads stay columnar in Parquet; decode/feature
extraction is an Arrow-batched narrow map (no shuffle); downstream
analytics join on the extracted metadata, never on payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_binary_payload",
    "binary_features",
    "with_ppm_payload",
    "encode_ppm",
    "decode_ppm",
    "decode_ppm_features",
]


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of the text;
    in production: the image/audio blob read from storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


# --- PPM (P6) image codec — dependency-free, real raster format ------------
#
# Fixture images are synthesized deterministically from the row id so a
# closed-form SQL oracle can verify the DECODED statistics end-to-end:
#   width  = 8 + id % 9            (8..16)
#   height = 8 + (id * 7) % 5      (8..12)
#   pixel byte i (of 3*w*h) = (id * 31 + 7 * i) % 256
# The payload on the wire is a spec-conformant binary PPM: b"P6\n{w}
# {h}\n255\n" + raw RGB bytes — any external netpbm tool can open it.

PPM_MAXVAL = 255


def _ppm_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 9, 8 + (doc_id * 7) % 5


def encode_ppm(doc_id: int) -> bytes:
    """Serialize the deterministic fixture image for ``doc_id`` as a
    binary PPM (P6). numpy does the pixel-buffer work, exactly as a
    real encoder would hand off a decoded RGB array."""
    w, h = _ppm_dims(doc_id)
    n = 3 * w * h
    pixels = (doc_id * 31 + 7 * np.arange(n, dtype=np.int64)) % 256
    header = f"P6\n{w} {h}\n{PPM_MAXVAL}\n".encode("ascii")
    return header + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode: parse the P6 header (magic, dimensions, maxval),
    then view the raw pixel buffer as a (h, w, 3) uint8 array. Loud on
    malformed input — a decoder that guesses is worse than none."""
    if payload[:2] != b"P6":
        raise ValueError(f"not a binary PPM (magic {payload[:2]!r})")
    # header = 3 whitespace-separated tokens after the magic
    parts = payload.split(b"\n", 3)
    if len(parts) < 4:
        raise ValueError("truncated PPM header")
    dims = parts[1].split()
    if len(dims) != 2:
        raise ValueError(f"bad PPM dimension line {parts[1]!r}")
    w, h = int(dims[0]), int(dims[1])
    maxval = int(parts[2])
    if maxval != PPM_MAXVAL:
        raise ValueError(f"unsupported maxval {maxval}")
    raw = parts[3]
    if len(raw) != 3 * w * h:
        raise ValueError(f"pixel buffer {len(raw)}B != 3*{w}*{h}")
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def with_ppm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the synthesized PPM image as a binary column (stands in
    for reading the blob from object storage). Arrow-batched."""

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [encode_ppm(int(i)) for i in pdf[id_col]]
            yield out

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(attach, schema=f"{fields}, payload binary")


def decode_ppm_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched image decode + per-image statistics: header dims,
    byte length, and pixel sum/mean over the DECODED buffer. The exact
    plumbing a PIL/ffmpeg UDF uses (iterator of pandas batches in,
    batches out, narrow map, zero shuffle); pixel math in int64 so the
    mean is bit-identical across engines: the sum is exact, both
    operands are exactly representable doubles, and a single IEEE
    division is correctly rounded everywhere — no round() needed (a
    round() would ADD risk: Python rounds half-even, SQL half-away)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widths, heights, blens, psums, pmeans = [], [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                w, h, arr = decode_ppm(data)
                s = int(arr.astype(np.int64).sum())
                ids.append(rid)
                widths.append(w)
                heights.append(h)
                blens.append(len(data))
                psums.append(s)
                pmeans.append(s / (3 * w * h))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(widths, dtype="int64"),
                    "height": pd.Series(heights, dtype="int64"),
                    "byte_len": pd.Series(blens, dtype="int64"),
                    "pixel_sum": pd.Series(psums, dtype="int64"),
                    "pixel_mean": pd.Series(pmeans, dtype="float64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract,
        schema=(
            f"{id_col} long, width long, height long, byte_len long, "
            "pixel_sum long, pixel_mean double"
        ),
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
