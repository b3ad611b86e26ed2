"""Property tests for the band-join rewrite (SURVEY.md §5.3): the
bucketed plan must return EXACTLY the pairs the naive crossJoin+filter
returns — the [OR11 §4] exactly-once property, checked independently of
the DuckDB oracle dialect."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mapreducenonequijoin_spark.operators.joins import band_join, naive_theta_join
import pytest


def _frames(spark, seed, n_left=300, n_right=300, lo=-1000, hi=1000):
    rng = random.Random(seed)
    left = spark.createDataFrame(
        [(i, float(rng.randint(lo, hi)), rng.randint(0, 5)) for i in range(n_left)],
        "l_id long, l_x double, l_k int",
    )
    right = spark.createDataFrame(
        [(i, float(rng.randint(lo, hi)), rng.randint(0, 5)) for i in range(n_right)],
        "r_id long, r_x double, r_k int",
    )
    return left, right


def _pairs(df):
    return sorted((r.l_id, r.r_id) for r in df.select("l_id", "r_id").collect())


@pytest.mark.slow
def test_band_symmetric_matches_naive(spark):
    left, right = _frames(spark, seed=1)
    eps = 37.0
    got = band_join(left, right, "l_x", "r_x", lower=-eps, upper=eps)
    want = naive_theta_join(left, right, F.abs(F.col("l_x") - F.col("r_x")) <= eps)
    assert _pairs(got) == _pairs(want)


@pytest.mark.slow
def test_band_asymmetric_halfopen(spark):
    left, right = _frames(spark, seed=2)
    got = band_join(
        left, right, "l_x", "r_x", lower=-100, upper=0,
        include_lower=True, include_upper=False,
    )
    want = naive_theta_join(
        left,
        right,
        (F.col("r_x") - F.col("l_x") >= -100) & (F.col("r_x") - F.col("l_x") < 0),
    )
    assert _pairs(got) == _pairs(want)


def test_band_with_equi_key(spark):
    left, right = _frames(spark, seed=3)
    got = band_join(
        left, right, "l_x", "r_x", lower=-50, upper=50,
        extra_equi=[("l_k", "r_k")],
    )
    want = naive_theta_join(
        left,
        right,
        (F.abs(F.col("l_x") - F.col("r_x")) <= 50) & (F.col("l_k") == F.col("r_k")),
    )
    assert _pairs(got) == _pairs(want)


@pytest.mark.slow
def test_band_integer_exact_boundaries(spark):
    # Integer domain: values landing exactly on bucket boundaries.
    left = spark.createDataFrame(
        [(i, i * 10) for i in range(-20, 20)], "l_id long, l_x long"
    )
    right = spark.createDataFrame(
        [(i, i * 10 + 5) for i in range(-20, 20)], "r_id long, r_x long"
    )
    got = band_join(left, right, "l_x", "r_x", lower=-10, upper=10)
    want = naive_theta_join(
        left, right, F.abs(F.col("l_x") - F.col("r_x")) <= 10
    )
    assert _pairs(got) == _pairs(want)


def test_band_timestamps(spark, sf_dir):
    from mapreducenonequijoin_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events").limit(400)
    left = ev.select(
        F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"),
        F.col("user_id").alias("l_u"),
    )
    right = ev.select(
        F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts"),
        F.col("user_id").alias("r_u"),
    )
    got = band_join(
        left, right, "l_ts", "r_ts", lower=-3600, upper=3600,
        extra_equi=[("l_u", "r_u")],
    )
    want = naive_theta_join(
        left,
        right,
        (F.col("l_u") == F.col("r_u"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    assert _pairs(got) == _pairs(want)


def test_flagship_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"event_id", "user_id", "n_errors"} == set(df.columns)


@pytest.mark.slow
def test_band_fractional_bounds_on_integers(spark):
    # Regression (ADVICE r1): fractional bounds on an integer domain.
    # upper=0.5 must admit only diff=0 (and the widened bucket-cover
    # bounds must not leak into the residual filter, which would wrongly
    # admit diff=1).
    left = spark.createDataFrame([(i, i) for i in range(60)], "l_id long, l_x long")
    right = spark.createDataFrame([(i, i) for i in range(60)], "r_id long, r_x long")
    got = band_join(left, right, "l_x", "r_x", lower=-0.5, upper=0.5)
    want = naive_theta_join(
        left, right,
        ((F.col("r_x") - F.col("l_x")) >= -0.5) & ((F.col("r_x") - F.col("l_x")) <= 0.5),
    )
    assert _pairs(got) == _pairs(want)
    assert len(_pairs(got)) == 60  # only the diagonal


@pytest.mark.slow
def test_band_strict_fractional_bounds(spark):
    left = spark.createDataFrame([(i, i) for i in range(40)], "l_id long, l_x long")
    right = spark.createDataFrame([(i, i + 1) for i in range(40)], "r_id long, r_x long")
    # (0.5, 1.5) strict: diff=1 qualifies, diff=0 and diff=2 do not
    got = band_join(
        left, right, "l_x", "r_x", lower=0.5, upper=1.5,
        include_lower=False, include_upper=False,
    )
    want = naive_theta_join(
        left, right,
        ((F.col("r_x") - F.col("l_x")) > 0.5) & ((F.col("r_x") - F.col("l_x")) < 1.5),
    )
    assert _pairs(got) == _pairs(want)


@pytest.mark.slow
def test_band_hypothesis_random_bounds(spark):
    """Property sweep (hypothesis): random integer domains, random
    (lower, upper) bounds — integral, fractional, negative, degenerate
    (lower == upper) — and random inclusivity; the bucketed rewrite
    must equal naive crossJoin+filter on every draw. One Spark job per
    example, so examples are capped and the deadline disabled."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        seed=st.integers(0, 2**20),
        lower=st.one_of(
            st.integers(-50, 50).map(float),
            st.floats(-50, 50, allow_nan=False).map(lambda x: round(x, 2)),
        ),
        width=st.one_of(
            st.just(0.0),
            st.integers(0, 40).map(float),
            st.floats(0, 40, allow_nan=False).map(lambda x: round(x, 2)),
        ),
        inc_lo=st.booleans(),
        inc_hi=st.booleans(),
    )
    def check(seed, lower, width, inc_lo, inc_hi):
        upper = lower + width
        left, right = _frames(spark, seed=seed, n_left=60, n_right=60,
                              lo=-80, hi=80)
        got = band_join(
            left, right, "l_x", "r_x", lower=lower, upper=upper,
            include_lower=inc_lo, include_upper=inc_hi,
        )
        diff = F.col("r_x") - F.col("l_x")
        pred = (diff >= lower) if inc_lo else (diff > lower)
        pred &= (diff <= upper) if inc_hi else (diff < upper)
        want = naive_theta_join(left, right, pred)
        assert _pairs(got) == _pairs(want)

    check()


@pytest.mark.slow
def test_band_salt_hot_hypothesis_random_skew(spark):
    """Property sweep (hypothesis): random domains with a planted hot
    TIE (m copies of one value) and random salt/threshold settings —
    the salted plan must emit exactly the unsalted pair set, each pair
    exactly once, on every draw."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        seed=st.integers(0, 2**20),
        hot=st.integers(5, 40),
        salt=st.integers(2, 9),
        hot_min=st.integers(1, 16),
    )
    def check(seed, hot, salt, hot_min):
        rng = random.Random(seed)
        tie = float(rng.randint(-20, 20))
        rows = [(i, float(rng.randint(-30, 30))) for i in range(50)]
        rows += [(100 + i, tie) for i in range(hot)]
        df = spark.createDataFrame(rows, "l_id long, l_x double")
        left = df
        right = df.select(
            F.col("l_id").alias("r_id"), F.col("l_x").alias("r_x")
        )
        plain = band_join(left, right, "l_x", "r_x", lower=-1.0, upper=1.0)
        salted = band_join(
            left, right, "l_x", "r_x", lower=-1.0, upper=1.0,
            salt_hot=salt, hot_bucket_min=hot_min,
        )
        got = [(r.l_id, r.r_id) for r in salted.select("l_id", "r_id").collect()]
        assert len(got) == len(set(got))  # exactly-once under salting
        assert sorted(got) == _pairs(plain)

    check()
