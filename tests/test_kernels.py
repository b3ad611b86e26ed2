"""Hypothesis property tests for the pure-Python/numpy kernels
(SURVEY.md §5 test strategy: the custom kernels must hold their
guarantees on ADVERSARIAL inputs, not just the fixtures). These run
JVM-free, so hypothesis can afford hundreds of examples."""

from __future__ import annotations

from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# --- Misra-Gries completeness ------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), max_size=500),
    st.integers(min_value=1, max_value=10),
)
def test_misra_gries_never_misses_a_heavy_hitter(stream, k):
    """The pass-1 guarantee agg_heavy_hitters rests on: every item
    with frequency > n/(k+1) survives in a k-counter summary."""
    from mapreducenonequijoin_spark.plans.datapipe import misra_gries_update

    counters: dict = {}
    misra_gries_update(counters, stream, k)
    assert len(counters) <= k
    n = len(stream)
    for item, freq in Counter(stream).items():
        if freq > n / (k + 1):
            assert item in counters, (item, freq, n, k)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), max_size=300),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=5),
)
def test_misra_gries_partition_union_complete(stream, k, n_parts):
    """The distributed form: split the stream into arbitrary contiguous
    partitions, run MG per partition, union the candidates — any
    globally heavy item must appear in SOME partition's summary
    (the pigeonhole argument in agg_heavy_hitters' docstring)."""
    from mapreducenonequijoin_spark.plans.datapipe import misra_gries_update

    bounds = sorted(
        (abs(hash(("b", i, len(stream)))) % (len(stream) + 1) for i in range(n_parts - 1))
    )
    parts, prev = [], 0
    for b in bounds + [len(stream)]:
        parts.append(stream[prev:b])
        prev = b
    union: set = set()
    for p in parts:
        c: dict = {}
        misra_gries_update(c, p, k)
        union |= set(c)
    n = len(stream)
    for item, freq in Counter(stream).items():
        if freq > n / (k + 1):
            assert item in union, (item, freq, n, k, parts)


# --- IEJoin sort/sweep kernel ------------------------------------------------

_OPS = ["<", "<=", ">", ">="]


def _brute(lx, ly, rx, ry, xop, yop):
    import operator

    f = {"<": operator.lt, "<=": operator.le, ">": operator.gt, ">=": operator.ge}
    out = set()
    for i in range(len(lx)):
        for j in range(len(rx)):
            if f[xop](lx[i], rx[j]) and f[yop](ly[i], ry[j]):
                out.add((i, j))
    return out


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(st.integers(-50, 50), st.integers(-50, 50)), max_size=40),
    st.lists(st.tuples(st.integers(-50, 50), st.integers(-50, 50)), max_size=40),
    st.sampled_from(_OPS),
    st.sampled_from(_OPS),
)
def test_iejoin_kernel_matches_bruteforce(lpairs, rpairs, xop, yop):
    """The per-region IEJoin kernel must emit exactly the brute-force
    pair set for every op combination, including duplicates and
    boundary-equal values (the strict/non-strict searchsorted sides)."""
    from mapreducenonequijoin_spark.operators.joins import _iejoin_indices

    lx = np.array([p[0] for p in lpairs], dtype=np.int64)
    ly = np.array([p[1] for p in lpairs], dtype=np.int64)
    rx = np.array([p[0] for p in rpairs], dtype=np.int64)
    ry = np.array([p[1] for p in rpairs], dtype=np.int64)
    li, ri = _iejoin_indices(lx, ly, rx, ry, xop, yop)
    got = set(zip(map(int, li), map(int, ri)))
    assert got == _brute(lx, ly, rx, ry, xop, yop)


# --- binary codecs -----------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000))
def test_ppm_roundtrip_any_id(doc_id):
    from mapreducenonequijoin_spark.operators.multimodal import (
        _ppm_dims,
        decode_ppm,
        encode_ppm,
    )

    w, h, arr = decode_ppm(encode_ppm(doc_id))
    assert (w, h) == _ppm_dims(doc_id)
    assert arr.shape == (h, w, 3)


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=10_000_000))
def test_wav_roundtrip_any_id(doc_id):
    from mapreducenonequijoin_spark.operators.multimodal import (
        _wav_n_samples,
        decode_wav,
        encode_wav,
    )

    sr, s = decode_wav(encode_wav(doc_id))
    assert sr == 8000 and len(s) == _wav_n_samples(doc_id)
    assert int(np.abs(s.astype(np.int64)).max()) <= 2048


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=60))
def test_decoders_never_misparse_garbage(blob):
    """Arbitrary bytes must either raise ValueError or (for inputs
    that happen to be valid) decode; no other exception class, no
    silent wrong-shape success."""
    import pytest  # noqa: F401

    from mapreducenonequijoin_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
    )

    for dec in (decode_ppm, decode_wav):
        try:
            dec(blob)
        except ValueError:
            pass
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{dec.__name__} raised {type(e).__name__}") from e


def test_resize_ppm_roundtrip_odd_dims():
    """Stride slicing keeps ceil(d/2) pixels per axis; re-encoded PPM
    must decode to exactly the strided array for odd and even dims."""
    import numpy as np

    from mapreducenonequijoin_spark.operators.multimodal import (
        PPM_MAXVAL,
        decode_ppm,
        encode_ppm,
    )

    for doc_id in range(20):
        w, h, arr = decode_ppm(encode_ppm(doc_id))
        small = np.ascontiguousarray(arr[0::2, 0::2, :])
        h2, w2 = small.shape[:2]
        assert w2 == (w + 1) // 2 and h2 == (h + 1) // 2
        payload = f"P6\n{w2} {h2}\n{PPM_MAXVAL}\n".encode() + small.tobytes()
        rw, rh, rarr = decode_ppm(payload)
        assert (rw, rh) == (w2, h2)
        assert np.array_equal(rarr, small)
