import pytest

def test_bollinger_matches_python_recompute(spark, sf_dir):
    """Breakout booleans must match a Python rolling-window recompute
    ((n·m − s)² > k²(n·ssq − s²)) per event_type series."""
    from mapreducenonequijoin_spark.plans.analytics import (
        _BOLL_K,
        _BOLL_W,
        timeseries_bollinger_breakout,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    ev = sorted(
        (
            (r.event_type, r.ts, r.event_id, round(r.value * 1000))
            for r in load_table(spark, sf_dir, "events").collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    want = {}
    series: dict[str, list[tuple[int, int]]] = {}
    for et, _, eid, m in ev:
        series.setdefault(et, []).append((eid, m))
    for et, rows in series.items():
        for i in range(_BOLL_W - 1, len(rows)):
            window = [m for _, m in rows[i - _BOLL_W + 1 : i + 1]]
            n, s, ssq = len(window), sum(window), sum(v * v for v in window)
            m = rows[i][1]
            want[rows[i][0]] = (n * m - s) ** 2 > _BOLL_K**2 * (n * ssq - s * s)
    got = {
        r.event_id: r.breakout
        for r in timeseries_bollinger_breakout(spark, sf_dir).collect()
    }
    assert got == want
    assert any(got.values()) and not all(got.values())


def test_stl_strength_matches_python_anova(spark, sf_dir):
    """The ANOVA identity must hold against a Python recompute of the
    integer detrended series, and strength must sit in [0, 1e6]."""
    from mapreducenonequijoin_spark.plans.analytics import timeseries_stl_strength
    from mapreducenonequijoin_spark.sources.io import load_table

    from collections import defaultdict

    import math

    deci = defaultdict(int)
    for r in load_table(spark, sf_dir, "events").collect():
        b = r.ts.replace(minute=0, second=0, microsecond=0)
        # HALF_UP like both engines (Python round() is half-even, and
        # value*10 lands on exact .5 for odd hundredths)
        deci[b] += math.floor(r.value * 10 + 0.5)
    buckets = sorted(deci)
    r0 = {}
    for i, b in enumerate(buckets):
        win = buckets[max(0, i - 12) : i + 13]
        s, n = sum(deci[x] for x in win), len(win)
        r0[b] = deci[b] - s // n
    per = defaultdict(lambda: [0, 0, 0])
    for b, v in r0.items():
        e = per[b.hour]
        e[0] += 1
        e[1] += v
        e[2] += v * v
    n = sum(e[0] for e in per.values())
    s = sum(e[1] for e in per.values())
    ssq_t = sum(e[2] for e in per.values())
    ssr = sum((e[0] * e[2] - e[1] * e[1]) // e[0] for e in per.values())
    ssd = (n * ssq_t - s * s) // n
    got = timeseries_stl_strength(spark, sf_dir).collect()[0]
    assert (got.n, got.ssd, got.ssr) == (n, ssd, ssr)
    assert got.strength_micro == int(max(0, ssd - ssr) * 1_000_000 / ssd)
    assert 0 <= got.strength_micro <= 1_000_000
    assert ssr <= ssd  # ANOVA: within-group SS never exceeds total SS


def test_theil_sen_matches_python_recompute(spark, sf_dir):
    """The pairwise-slope median must match a Python recompute over
    the last-K hourly frame (R-7 median, half-up quantized input)."""
    import math
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans.analytics import (
        _TSEN_K,
        timeseries_theil_sen,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    hourly = defaultdict(int)
    for r in load_table(spark, sf_dir, "events").collect():
        b = r.ts.replace(minute=0, second=0, microsecond=0)
        hourly[b] += math.floor(r.value * 10 + 0.5)
    lastk = sorted(hourly)[-_TSEN_K:]
    pts = [(int(b.timestamp() // 3600), hourly[b]) for b in lastk]
    slopes = sorted(
        (y2 - y1) / (t2 - t1)
        for i, (t1, y1) in enumerate(pts)
        for (t2, y2) in pts[i + 1 :]
    )
    n = len(slopes)
    pos = (n - 1) * 0.5
    lo = math.floor(pos)
    med = slopes[lo] + (pos - lo) * (slopes[min(lo + 1, n - 1)] - slopes[lo])
    got = timeseries_theil_sen(spark, sf_dir).collect()[0]
    assert got.n_points == len(pts)
    assert got.n_pairs == n
    assert got.slope_p50_micro == math.trunc(med * 1_000_000)


def test_mann_kendall_matches_python_recompute(spark, sf_dir):
    """S, the tie-corrected variance, and z must match a Python
    recompute over the same last-K frame as theil_sen."""
    import math
    from collections import Counter, defaultdict

    from mapreducenonequijoin_spark.plans.analytics import (
        _TSEN_K,
        timeseries_mann_kendall,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    hourly = defaultdict(int)
    for r in load_table(spark, sf_dir, "events").collect():
        b = r.ts.replace(minute=0, second=0, microsecond=0)
        hourly[b] += math.floor(r.value * 10 + 0.5)
    lastk = sorted(hourly)[-_TSEN_K:]
    ys = [hourly[b] for b in lastk]
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(ys)
    tie_mass = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie_mass
    corrected = s - 1 if s > 0 else s + 1 if s < 0 else 0
    z = corrected / math.sqrt(var18 / 18)
    got = timeseries_mann_kendall(spark, sf_dir).collect()[0]
    assert (got.n, got.s_stat, got.var18) == (n, s, var18)
    assert got.z_micro == int(z * 1_000_000)


def test_smape_naive_matches_python_recompute(spark, sf_dir):
    """Per-series naive sMAPE must match a Python recompute and sit
    in [0, 2e6] (sMAPE is bounded by 2)."""
    import math
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans.analytics import eval_forecast_smape_naive
    from mapreducenonequijoin_spark.sources.io import load_table

    hourly = defaultdict(lambda: defaultdict(int))
    for r in load_table(spark, sf_dir, "events").collect():
        b = r.ts.replace(minute=0, second=0, microsecond=0)
        hourly[r.event_type][b] += math.floor(r.value * 10 + 0.5)
    got = {
        r.event_type: (r.n, r.smape_micro)
        for r in eval_forecast_smape_naive(spark, sf_dir).collect()
    }
    assert set(got) == set(hourly)
    for et, series in hourly.items():
        ys = [series[b] for b in sorted(series)]
        terms = [
            2 * abs(y - f) * 1_000_000 // (abs(y) + abs(f))
            for f, y in zip(ys, ys[1:])
            if abs(y) + abs(f) > 0
        ]
        assert got[et] == (len(terms), sum(terms) // len(terms))
        assert 0 <= got[et][1] <= 2_000_000


def test_mase_seasonal_matches_python_recompute(spark, sf_dir):
    """Per-series MASE must match a Python recompute over the same
    f24-aligned suffix."""
    import math
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans.analytics import (
        eval_forecast_mase_seasonal,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    hourly = defaultdict(lambda: defaultdict(int))
    for r in load_table(spark, sf_dir, "events").collect():
        b = r.ts.replace(minute=0, second=0, microsecond=0)
        hourly[r.event_type][b] += math.floor(r.value * 10 + 0.5)
    got = {
        r.event_type: (r.n, r.mase_micro)
        for r in eval_forecast_mase_seasonal(spark, sf_dir).collect()
    }
    for et, series in hourly.items():
        ys = [series[b] for b in sorted(series)]
        rows = [(ys[i], ys[i - 1], ys[i - 24]) for i in range(24, len(ys))]
        mae24 = sum(abs(y - f) for y, _, f in rows)
        mae1 = sum(abs(y - f) for y, f, _ in rows)
        assert got[et] == (len(rows), mae24 * 1_000_000 // mae1)


def test_locf_fill_matches_python_recompute(spark, sf_dir):
    """Filled series must carry the last observation forward exactly,
    cover the full spine, and never be null."""
    import math
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans.analytics import timeseries_locf_fill
    from mapreducenonequijoin_spark.sources.io import load_table

    obs = defaultdict(dict)
    for r in load_table(spark, sf_dir, "events").collect():
        if r.event_id % 11 == 0:
            eh = int(r.ts.timestamp() // 3600)
            obs[r.event_type][eh] = obs[r.event_type].get(eh, 0) + math.floor(
                r.value * 10 + 0.5
            )
    want = {}
    for et, series in obs.items():
        lo, hi = min(series), max(series)
        last = None
        for eh in range(lo, hi + 1):
            if eh in series:
                last = series[eh]
            want[(et, eh)] = (last, eh in series)
    got = {
        (r.event_type, r.eh): (r.y_filled, r.observed)
        for r in timeseries_locf_fill(spark, sf_dir).collect()
    }
    assert got == want
    assert all(v[0] is not None for v in got.values())


def test_counter_rate_matches_python_recompute(spark, sf_dir):
    """Per-bucket reset count and total increase must match a plain
    Python replay of the rollover counter."""
    import math
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.analytics import _COUNTER_MOD
    from mapreducenonequijoin_spark.sources.io import load_table

    ev = sorted(
        load_table(spark, sf_dir, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    cum: dict = defaultdict(int)
    prev: dict = {}
    stats = defaultdict(lambda: [0, 0, 0])  # n, resets, increase
    for r in ev:
        cents = math.floor(r.value * 100 + 0.5)
        cum[r.user_id] += cents
        gauge = cum[r.user_id] % _COUNTER_MOD
        b = stats[r.user_id % 8]
        b[0] += 1
        if r.user_id in prev:
            delta = gauge - prev[r.user_id]
            if delta < 0:
                b[1] += 1
                b[2] += gauge
            else:
                b[2] += delta
        prev[r.user_id] = gauge
    got = {
        r.bucket: (r.n_samples, r.n_resets, r.total_increase)
        for r in QUERIES["timeseries_counter_rate"].fn(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in stats.items()}
    assert sum(v[1] for v in stats.values()) > 0  # resets actually occur


def test_hampel_filter_matches_python_replay(spark, sf_dir):
    """Flagged set must equal a sequential replay of the centered
    7-row median/MAD windows with the lower-median convention."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts", "value"
    ).collect()
    series: dict = {}
    for r in rows:
        m = int(r.value * 100 + 0.5)
        series.setdefault(r.event_type, []).append((r.ts, r.event_id, m))
    exp = set()
    for et, pts in series.items():
        pts.sort()
        ms = [m for _, _, m in pts]
        for i in range(3, len(ms) - 3):
            win = sorted(ms[i - 3 : i + 4])
            med = win[3]
            mad = sorted(abs(v - med) for v in win)[3]
            if abs(ms[i] - med) * 10_000 > 3 * 14_826 * mad:
                exp.add((et, pts[i][1], ms[i], med, mad))
    got = {
        (r.event_type, r.event_id, r.value_cents, r.med_cents, r.mad_cents)
        for r in QUERIES["timeseries_hampel_filter"].fn(spark, sf_dir).collect()
    }
    assert got == exp
    assert exp, "fixture should contain at least one Hampel outlier"


def test_basket_lift_matches_python_replay(spark, sf_dir):
    """Top-50 association pairs replayed from the basket sets."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    baskets: dict = {}
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n = len(baskets)
    item: dict = {}
    pair: dict = {}
    for parts in baskets.values():
        ps = sorted(parts)
        for p in ps:
            item[p] = item.get(p, 0) + 1
        for i, p1 in enumerate(ps):
            for p2 in ps[i + 1 :]:
                pair[(p1, p2)] = pair.get((p1, p2), 0) + 1
    scored = [
        (
            p1,
            p2,
            c,
            c * 1_000_000 // n,
            c * n * 1_000_000 // (item[p1] * item[p2]),
        )
        for (p1, p2), c in pair.items()
    ]
    exp = sorted(scored, key=lambda t: (-t[2], t[0], t[1]))[:50]
    got = [
        (r.p1, r.p2, r.n_pair, r.support_micro, r.lift_micro)
        for r in QUERIES["agg_basket_lift"].fn(spark, sf_dir).collect()
    ]
    assert got == exp


def test_basket_lift_cap_is_monotone_pruning(spark, sf_dir):
    """The basket_cap guard only PRUNES: every capped pair key exists
    uncapped, and its n_pair / support / lift are each <= the
    uncapped value (marginals stay uncapped, so the statistics are
    monotone in n_pair). Also checks the cap actually binds on this
    fixture and that per-order contribution respects the cap."""
    from mapreducenonequijoin_spark.plans.analytics import agg_basket_lift

    # The plan LIMITs to 50, so monotonicity is checked two ways: on a
    # full Python replay of both pair streams, and on the plan outputs
    # wherever the two top-50 windows overlap.
    uncapped = {
        (r.p1, r.p2): (r.n_pair, r.support_micro, r.lift_micro)
        for r in agg_basket_lift(spark, sf_dir).collect()
    }
    capped_rows = agg_basket_lift(spark, sf_dir, basket_cap=3).collect()
    capped = {
        (r.p1, r.p2): (r.n_pair, r.support_micro, r.lift_micro)
        for r in capped_rows
    }

    # Full Python replay of the capped semantics for subset checking
    # (the top-50 windows of capped vs uncapped need not overlap).
    from mapreducenonequijoin_spark.sources.io import load_table

    baskets: dict = {}
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    item: dict = {}
    for parts in baskets.values():
        for p in parts:
            item[p] = item.get(p, 0) + 1
    pair_full: dict = {}
    pair_capped: dict = {}
    for parts in baskets.values():
        ps = sorted(parts)
        for i, p1 in enumerate(ps):
            for p2 in ps[i + 1 :]:
                pair_full[(p1, p2)] = pair_full.get((p1, p2), 0) + 1
        kept = sorted(sorted(parts), key=lambda p: (-item[p], p))[:3]
        ks = sorted(kept)
        for i, p1 in enumerate(ks):
            for p2 in ks[i + 1 :]:
                pair_capped[(p1, p2)] = pair_capped.get((p1, p2), 0) + 1

    # Cap binds on this fixture (some basket exceeds 3 distinct parts).
    assert any(len(parts) > 3 for parts in baskets.values())
    assert sum(pair_capped.values()) < sum(pair_full.values())

    # Subset + monotone on the FULL pair maps.
    for k, c in pair_capped.items():
        assert k in pair_full and c <= pair_full[k]

    # The plan's capped top-50 agrees with the replay and is monotone
    # against the uncapped statistics wherever the windows overlap.
    n = len(baskets)
    for (p1, p2), (c, sup, lift) in capped.items():
        assert pair_capped[(p1, p2)] == c
        assert sup == c * 1_000_000 // n
        assert lift == c * n * 1_000_000 // (item[p1] * item[p2])
        if (p1, p2) in uncapped:
            uc, usup, ulift = uncapped[(p1, p2)]
            assert c <= uc and sup <= usup and lift <= ulift


def test_user_journey_fuses_user_id_exchanges(spark, sf_dir):
    """VERDICT r10 item 8: the composed journey plan must carry exactly
    ONE hashpartitioning(user_id) exchange across its three user-keyed
    stages (window -> session agg -> user rollup), and strictly fewer
    exchanges than the sum of the standalone operators it composes."""
    import re

    from mapreducenonequijoin_spark.plans import QUERIES

    def n_exchanges(name):
        plan = QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"Exchange (?!SinglePartition)", plan))

    plan = (
        QUERIES["pipeline_user_journey"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1, (
        "the user_id partitioning must be established once and reused "
        "by both downstream groupBys"
    )
    fused = len(re.findall(r"Exchange (?!SinglePartition)", plan))
    assert fused == 2  # user_id + the bounded journey-cell agg
    parts = sum(
        n_exchanges(n)
        for n in ("sessionize_events", "retention_cohorts", "funnel_conversion")
    )
    assert fused < parts


def test_user_journey_accounts_for_every_user(spark, sf_dir):
    """Journey cells partition the user base: n_users sums to the
    distinct-user count and sum_events to the event count."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = QUERIES["pipeline_user_journey"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.n_users for r in rows) == ev.select("user_id").distinct().count()
    assert sum(r.sum_events for r in rows) == ev.count()


@pytest.mark.slow
def test_basket_cap_hypothesis_random_baskets(spark, tmp_path):
    """Property sweep (hypothesis): random basket structures — skewed
    part frequencies, giant baskets, singleton orders — basket_cap
    must be monotone pruning with per-order pair fanout <= C(cap,2),
    against a Python replay. One synthetic lineitem parquet + two
    Spark jobs per example."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from mapreducenonequijoin_spark.plans.analytics import agg_basket_lift

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        baskets=st.lists(
            st.lists(
                st.integers(min_value=1, max_value=12),
                min_size=1,
                max_size=15,
            ),
            min_size=1,
            max_size=25,
        ),
        cap=st.integers(min_value=1, max_value=4),
        seed=st.integers(0, 10**6),
    )
    def check(baskets, cap, seed):
        rows = [
            (o + 1, p, 1.0)
            for o, parts in enumerate(baskets)
            for p in parts
        ]
        d = tmp_path / f"bl{seed}_{len(rows)}"
        d.mkdir(exist_ok=True)
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long, l_extendedprice double"
        ).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))

        def pairs_of(df):
            return {(r.p1, r.p2): r.n_pair for r in df.collect()}

        full = pairs_of(agg_basket_lift(spark, str(d)))
        capped = pairs_of(agg_basket_lift(spark, str(d), basket_cap=cap))

        # Python replay of the capped keep rule
        sets = [set(parts) for parts in baskets]
        freq: dict = {}
        for ps in sets:
            for p in ps:
                freq[p] = freq.get(p, 0) + 1
        want: dict = {}
        for ps in sets:
            kept = sorted(sorted(ps), key=lambda p: (-freq[p], p))[:cap]
            ks = sorted(kept)
            for i, p1 in enumerate(ks):
                for p2 in ks[i + 1 :]:
                    want[(p1, p2)] = want.get((p1, p2), 0) + 1
        want_full: dict = {}
        for ps in sets:
            ks = sorted(ps)
            for i, p1 in enumerate(ks):
                for p2 in ks[i + 1 :]:
                    want_full[(p1, p2)] = want_full.get((p1, p2), 0) + 1

        def top50(m):
            return dict(sorted(m.items(), key=lambda kv: (-kv[1], kv[0]))[:50])

        # both plan outputs equal their replay's top-50 (the plan LIMITs)
        assert capped == top50(want)
        assert full == top50(want_full)
        # monotone pruning on the FULL replayed maps (the two top-50
        # windows need not overlap)
        for k, c in want.items():
            assert k in want_full and c <= want_full[k]

    check()
