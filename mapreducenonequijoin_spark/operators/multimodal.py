"""Multimodal (binary) column plumbing (SURVEY.md §2.9, north-star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schema, Arrow batch transfer,
``mapInPandas`` signature, partition shape — is real and tested, and
so are the DECODES: the container ships no PIL/ffmpeg, so instead of
stubbing the codecs this module implements a binary **PPM (P6)** image
decoder and a **RIFF/WAV PCM** audio decoder in pure numpy — real
formats with real header/chunk parsing, raw-buffer decode, and
per-asset statistics. A production deployment swaps ``decode_ppm`` /
``decode_wav`` for PIL/ffmpeg calls with the SAME mapInPandas shape;
everything else is unchanged.

At 100 TB: binary payloads stay columnar in Parquet; decode/feature
extraction is an Arrow-batched narrow map (no shuffle); downstream
analytics join on the extracted metadata, never on payload bytes.
"""

from __future__ import annotations

import hashlib
import math
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
    "with_wav_payload",
    "encode_wav",
    "decode_wav",
    "decode_wav_features",
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


# --- WAV (RIFF PCM) audio codec — dependency-free, real container ----------
#
# Same closed-form-fixture pattern as the PPM codec: audio for row id
# is mono 16-bit PCM at 8 kHz with
#   n_samples = 400 + (id % 23) * 40
#   sample i  = (id * 131 + 17 * i) % 4096 - 2048
# serialized as a spec-conformant RIFF/WAVE file (44-byte canonical
# header + little-endian PCM), so any audio tool can open it and a SQL
# oracle can recompute every decoded statistic.

WAV_SAMPLE_RATE = 8000


def _wav_n_samples(doc_id: int) -> int:
    return 400 + (doc_id % 23) * 40


def encode_wav(doc_id: int) -> bytes:
    """Serialize the deterministic fixture audio for ``doc_id`` as a
    canonical 44-byte-header RIFF/WAVE file (PCM, mono, 16-bit)."""
    import struct

    n = _wav_n_samples(doc_id)
    pcm = (
        (doc_id * 131 + 17 * np.arange(n, dtype=np.int64)) % 4096 - 2048
    ).astype("<i2")
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, WAV_SAMPLE_RATE, WAV_SAMPLE_RATE * 2, 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL decode: walk the RIFF chunk structure (fmt then data —
    tolerating extra chunks in between, as the spec allows), validate
    PCM/mono/16-bit, and view the sample buffer as int16. Loud on
    malformed input."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file (magic {payload[:4]!r})")
    pos, sr, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"fmt chunk too short ({len(body)}B)")
            fmt, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError(f"unsupported WAV format {(fmt, ch, bits)}")
        elif cid == b"data":
            if len(body) != size:
                raise ValueError(f"truncated data chunk {len(body)}B != {size}")
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return sr, samples


def with_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the synthesized WAV as a binary column (the blob read
    stand-in). Arrow-batched."""

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [encode_wav(int(i)) for i in pdf[id_col]]
            yield out

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(attach, schema=f"{fields}, payload binary")


def decode_wav_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched audio decode + per-clip statistics: sample rate,
    sample count, byte length, exact integer PCM sum and peak |amp|,
    and duration in exact integer milliseconds — all int64 (or one
    exact IEEE division), hence bit-identical across engines."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    (id_col, "sample_rate", "n_samples", "byte_len",
                     "duration_ms", "pcm_sum", "peak")}
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                sr, samples = decode_wav(data)
                s64 = samples.astype(np.int64)
                rows[id_col].append(rid)
                rows["sample_rate"].append(sr)
                rows["n_samples"].append(len(samples))
                rows["byte_len"].append(len(data))
                rows["duration_ms"].append(len(samples) * 1000 // sr)
                rows["pcm_sum"].append(int(s64.sum()))
                rows["peak"].append(int(np.abs(s64).max()) if len(s64) else 0)
            yield pd.DataFrame({k: pd.Series(v, dtype="int64")
                                for k, v in rows.items()})

    return df.select(id_col, "payload").mapInPandas(
        extract,
        schema=(
            f"{id_col} long, sample_rate long, n_samples long, byte_len long, "
            "duration_ms long, pcm_sum long, peak long"
        ),
    )


def resize_ppm_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Nearest-neighbor 2× downsample through the REAL codec path:
    decode the P6 payload, stride-slice the pixel array
    (``arr[0::2, 0::2, :]`` — exactly what a thumbnailing stage does,
    minus the antialias filter), re-encode the result as a fresh PPM,
    then decode THAT for the emitted stats — so the numbers certify
    the whole decode → transform → encode → decode roundtrip, not
    just the arithmetic. Narrow mapInPandas, zero shuffle; the mean
    stays bit-identical across engines for the multimodal_decode
    reason (exact int sum, one correctly-rounded IEEE division)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, blens, psums, pmeans = [], [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                w, h, arr = decode_ppm(bytes(payload))
                small = np.ascontiguousarray(arr[0::2, 0::2, :])
                h2, w2 = small.shape[0], small.shape[1]
                header = f"P6\n{w2} {h2}\n{PPM_MAXVAL}\n".encode("ascii")
                reencoded = header + small.tobytes()
                rw, rh, rarr = decode_ppm(reencoded)
                s = int(rarr.astype(np.int64).sum())
                ids.append(rid)
                ws.append(rw)
                hs.append(rh)
                blens.append(len(reencoded))
                psums.append(s)
                pmeans.append(s / (3 * rw * rh))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width2": pd.Series(ws, dtype="int64"),
                    "height2": pd.Series(hs, dtype="int64"),
                    "byte_len2": pd.Series(blens, dtype="int64"),
                    "pixel_sum2": pd.Series(psums, dtype="int64"),
                    "pixel_mean2": pd.Series(pmeans, dtype="float64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract,
        schema=(
            f"{id_col} long, width2 long, height2 long, byte_len2 long, "
            "pixel_sum2 long, pixel_mean2 double"
        ),
    )


def encode_ppm_variant(seed: int, brightness: int) -> bytes:
    """Fixture image for perceptual-dedup tests: same deterministic
    raster as ``encode_ppm(seed)`` but with a constant brightness
    offset added and CLIPPED at maxval (a real luminance edit — mod
    wrap-around would be structured noise instead). Average-hash is
    designed to be invariant to exactly this class of edit."""
    w, h = _ppm_dims(seed)
    n = 3 * w * h
    pixels = (seed * 31 + 7 * np.arange(n, dtype=np.int64)) % 256
    pixels = np.minimum(pixels + brightness, PPM_MAXVAL)
    header = f"P6\n{w} {h}\n{PPM_MAXVAL}\n".encode("ascii")
    return header + pixels.astype(np.uint8).tobytes()


def with_ppm_variant_payload(
    df: DataFrame, seed_col: str, bright_col: str
) -> DataFrame:
    """Attach brightness-variant PPM payloads (Arrow-batched)."""

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                encode_ppm_variant(int(s), int(b))
                for s, b in zip(pdf[seed_col], pdf[bright_col])
            ]
            yield out

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(attach, schema=f"{fields}, payload binary")


def ahash_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual AVERAGE-HASH over the real decode path: parse each
    P6 payload, partition the raster into an 8×8 cell grid
    (boundaries ⌊k·dim/8⌋ — every cell non-empty for dims ≥ 8), and
    set cell bit k iff its mean exceeds the global mean. The
    comparison runs on cross-multiplied INT64 sums
    (cell_sum·total_n > total_sum·cell_n), never on float means, so
    the 64 bits are bit-identical to any engine recomputing the same
    integers (SURVEY §5.4). The hash is returned as two BIGINT
    halves (lo = bits 0–31, hi = 32–63): bit 63 of a single BIGINT
    would rely on two's-complement wrap semantics agreeing across
    engines. Narrow Arrow map, zero shuffle; dedup then groups on
    the 16-byte key — the image analogue of dedup_exact."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, los, his = [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                w, h, arr = decode_ppm(bytes(payload))
                a = arr.astype(np.int64)  # (h, w, 3)
                ts = int(a.sum())
                tn = 3 * w * h
                lo = hi = 0
                for k in range(64):
                    r, c = k // 8, k % 8
                    y0, y1 = r * h // 8, (r + 1) * h // 8
                    x0, x1 = c * w // 8, (c + 1) * w // 8
                    cs = int(a[y0:y1, x0:x1, :].sum())
                    cn = (y1 - y0) * (x1 - x0) * 3
                    if cs * tn > ts * cn:
                        if k < 32:
                            lo |= 1 << k
                        else:
                            hi |= 1 << (k - 32)
                ids.append(rid)
                los.append(lo)
                his.append(hi)
            yield pd.DataFrame({id_col: ids, "phash_lo": los, "phash_hi": his})

    return df.mapInPandas(
        extract, schema=f"{id_col} long, phash_lo long, phash_hi long"
    )


def decode_wav_frame_energies(
    df: DataFrame, id_col: str = "doc_id", frame: int = 80
) -> DataFrame:
    """Arrow-batched frame-energy extraction over decoded WAV payloads
    — the voice-activity-detection / silence-trimming primitive: the
    int16 stream splits into fixed ``frame``-sample windows (10 ms at
    8 kHz with the default) and each frame emits Σ s² as an EXACT
    int64 (|s| ≤ 2¹⁵ ⇒ a frame sum caps at frame·2³⁰ ≪ 2⁶³). The
    incomplete tail frame is dropped (n // frame full frames), the
    standard frame-analysis convention. Same narrow mapInPandas
    plumbing as decode_wav_features: payloads never shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, energies = [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                _sr, samples = decode_wav(bytes(payload))
                nf = len(samples) // frame
                s = samples[: nf * frame].astype(np.int64).reshape(nf, frame)
                e = (s * s).sum(axis=1)
                ids.extend([rid] * nf)
                fnos.extend(range(nf))
                energies.extend(int(x) for x in e)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(fnos, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract, schema=f"{id_col} long, frame_no long, energy long"
    )


def frame_energy_scan(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-frame energy over the binary payload: the same
    FRAME_STRIDE/FRAME_SIZE windows as :func:`frame_sample`, each
    reduced to Σ byte-values inside the Arrow batch — the
    feature-extract half of a video scene-cut pipeline (a real
    deployment computes per-frame luma histograms after an ffmpeg
    decode at the marked line; the fixture's ASCII payload makes the
    byte sum a closed-form the SQL oracle can recompute). mapInPandas,
    rows-out = Σ frames, zero shuffle."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies = [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                if not data.isascii():
                    raise ValueError(
                        f"frame_energy_scan: non-ASCII payload for "
                        f"{id_col}={rid}; byte windows would diverge "
                        "from the char-based oracle"
                    )
                n = ((len(data) - FRAME_SIZE) // FRAME_STRIDE + 1
                     if len(data) >= FRAME_SIZE else 0)
                for i in range(n):
                    # >>> real codec slots in HERE: ffmpeg frame decode
                    # + luma histogram instead of the raw byte sum
                    frame = data[i * FRAME_STRIDE: i * FRAME_STRIDE + FRAME_SIZE]
                    ids.append(rid)
                    idxs.append(i)
                    energies.append(int(np.frombuffer(frame, np.uint8).sum()))
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int64"),
                 "energy": pd.Series(energies, dtype="int64")}
            )

    return df.select(id_col, "payload").mapInPandas(
        scan, schema=f"{id_col} long, frame_idx long, energy long"
    )


def histogram_ppm_features(
    df: DataFrame, id_col: str = "doc_id", bins: int = 8
) -> DataFrame:
    """Arrow-batched luminance-byte histogram over the DECODED pixel
    buffer: per image, counts of pixel bytes per equal-width bin
    (bins must divide 256). The per-channel/luma histogram is the
    workhorse feature of image dedup, exposure QA, and thumbnail
    similarity; a PIL/ffmpeg deployment swaps only the decode call.
    Emits only NON-EMPTY bins — (id, bin, n_px) long rows, all
    integer, zero shuffle."""
    width = 256 // bins

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bs, ns = [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                _, _, arr = decode_ppm(bytes(payload))
                counts = np.bincount(arr.ravel() // width, minlength=bins)
                for b, n in enumerate(counts):
                    if n > 0:
                        ids.append(rid)
                        bs.append(b)
                        ns.append(int(n))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "bin": pd.Series(bs, dtype="int64"),
                    "n_px": pd.Series(ns, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract, schema=f"{id_col} long, bin long, n_px long"
    )


def tile_ppm_features(
    df: DataFrame, id_col: str = "doc_id", tile: int = 4
) -> DataFrame:
    """ViT-style patchify: decode the PPM payload and emit one row per
    ``tile×tile`` patch of the pixel grid (partial edge tiles kept,
    their true dims reported) with the exact int64 pixel sum — the
    patch-embedding precursor every vision-transformer ingest runs.
    Same Arrow plumbing as decode_ppm_features (iterator of pandas
    batches, narrow map, ZERO shuffle: payload bytes never leave the
    partition; only skinny (id, tile, sums) rows do). A real
    deployment swaps decode_ppm for the production codec and the
    per-tile sum for the projection matmul."""

    def tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, trs, tcs, ths, tws, sums = [], [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                w, h, arr = decode_ppm(bytes(payload))
                a = arr.astype(np.int64)
                for tr in range((h + tile - 1) // tile):
                    for tc in range((w + tile - 1) // tile):
                        patch = a[
                            tr * tile : (tr + 1) * tile,
                            tc * tile : (tc + 1) * tile,
                            :,
                        ]
                        ids.append(rid)
                        trs.append(tr)
                        tcs.append(tc)
                        ths.append(patch.shape[0])
                        tws.append(patch.shape[1])
                        sums.append(int(patch.sum()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "tile_row": pd.Series(trs, dtype="int64"),
                    "tile_col": pd.Series(tcs, dtype="int64"),
                    "tile_h": pd.Series(ths, dtype="int64"),
                    "tile_w": pd.Series(tws, dtype="int64"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        tiles,
        schema=(
            f"{id_col} long, tile_row long, tile_col long, tile_h long, "
            "tile_w long, pixel_sum long"
        ),
    )


def normalize_ppm_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-image per-CHANNEL normalization statistics over the DECODED
    RGB buffer — the mean/std pass every vision-model ingest runs
    before patchify (channel-normalize, then tile): for each of the 3
    interleaved PPM channels, the exact int64 pixel count / sum / sum
    of squares, plus the z-score of the channel's FIRST pixel as the
    normalized-output witness. All heavy math is integer; the z-score
    is ONE division of exact-integer doubles by a correctly-rounded
    IEEE sqrt — (p0·n − sum) / sqrt(n·sumsq − sum²) — so it hashes
    bit-identically cross-engine (the MCC discipline). Arrow-batched
    narrow map, ZERO shuffle: payloads never leave their partition;
    only (id, channel, 5 numbers) rows do."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                _, _, arr = decode_ppm(bytes(payload))
                flat = arr.ravel().astype(np.int64)
                for c in range(3):
                    ch = flat[c::3]
                    n = int(ch.size)
                    s = int(ch.sum())
                    sq = int((ch * ch).sum())
                    p0 = int(ch[0])
                    var_n2 = n * sq - s * s  # n²·variance, exact int64
                    # emitted UNROUNDED: Python round() is half-even
                    # while DuckDB round() is half-away — callers that
                    # need decimal rounding apply F.round() in the plan
                    # (Spark HALF_UP matches DuckDB; ADVICE r12 item 2)
                    z = (
                        float(p0 * n - s) / math.sqrt(float(var_n2))
                        if var_n2 > 0
                        else 0.0
                    )
                    rows.append((int(rid), c, n, s, sq, z))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "channel", "n_px", "ch_sum", "ch_sumsq",
                         "znorm_p0"],
            ).astype(
                {
                    id_col: "int64",
                    "channel": "int64",
                    "n_px": "int64",
                    "ch_sum": "int64",
                    "ch_sumsq": "int64",
                    "znorm_p0": "float64",
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        extract,
        schema=f"{id_col} long, channel long, n_px long, ch_sum long, "
        "ch_sumsq long, znorm_p0 double",
    )
