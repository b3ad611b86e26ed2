

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
