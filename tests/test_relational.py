import pytest

def test_fn_map_matches_python_recompute(spark, sf_dir):
    """Map keys/values/filter/element_at must match a Python recompute
    per language."""
    from collections import Counter

    from mapreducenonequijoin_spark.plans.relational import fn_map
    from mapreducenonequijoin_spark.sources.io import load_table

    per: Counter = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        per[(r.lang, r.source)] += 1
    langs = {lang for lang, _ in per}
    got = {r.lang: r for r in fn_map(spark, sf_dir).collect()}
    assert set(got) == langs
    for lang in langs:
        items = sorted(
            (s, n) for (lg, s), n in per.items() if lg == lang
        )
        row = got[lang]
        assert row.src_keys == ",".join(s for s, _ in items)
        assert row.doc_counts == ",".join(str(n) for _, n in items)
        assert row.n_big == sum(1 for _, n in items if n >= 5)
        assert row.src0_docs == dict(items).get("src0", 0)


def test_intersect_all_multiset_property(spark, sf_dir):
    """|A INTERSECT ALL B| per key = min(multiplicity_A, multiplicity_B)
    — the bag semantics distinct-intersect throws away."""
    from collections import Counter

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    orders = load_table(spark, sf_dir, "orders").collect()
    a = Counter(r.o_custkey for r in orders if r.o_orderstatus == "O")
    b = Counter(r.o_custkey for r in orders if r.o_orderpriority == "1-URGENT")
    want = Counter({k: min(a[k], b[k]) for k in a.keys() & b.keys()})
    got = Counter(
        r.o_custkey
        for r in QUERIES["set_intersect_all"].fn(spark, sf_dir).collect()
    )
    assert got == Counter({k: v for k, v in want.items() if v > 0})


def test_hll_sketch_gate_all_green(spark, sf_dir):
    """Both accuracy gates (direct and merged estimate within 2% of
    exact) must hold on the fixture; exact counts match a recompute."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = QUERIES["agg_hll_sketch_gate"].fn(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").collect()
    exact = {}
    for r in orders:
        exact.setdefault(r.o_orderstatus, set()).add(r.o_custkey)
    assert {r.o_orderstatus for r in rows} == set(exact)
    for r in rows:
        assert r.n_exact == len(exact[r.o_orderstatus])
        assert r.within_2pct == 1
        assert r.merged_within_2pct == 1


def test_sub_any_all_matches_python_replay(spark, sf_dir):
    """ALL/ANY rewrite must reproduce the quantified semantics,
    vacuous-truth empty-group case included."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    sup: dict = {}
    for r in load_table(spark, sf_dir, "supplier").collect():
        sup.setdefault(r.s_nationkey, []).append(
            int(r.s_acctbal * 100 + 0.5)
            if r.s_acctbal >= 0
            else -int(-r.s_acctbal * 100 + 0.5)
        )
    exp = {}
    for r in load_table(spark, sf_dir, "customer").collect():
        bal = (
            int(r.c_acctbal * 100 + 0.5)
            if r.c_acctbal >= 0
            else -int(-r.c_acctbal * 100 + 0.5)
        )
        s = sup.get(r.c_nationkey, [])
        if all(bal > v for v in s):  # > ALL, vacuous True on empty
            exp[r.c_custkey] = (
                r.c_name,
                r.c_nationkey,
                bal,
                any(bal > v for v in s),  # > ANY, False on empty
            )
    got = {
        r.c_custkey: (r.c_name, r.nationkey, r.bal_cents, r.gt_any)
        for r in QUERIES["sub_any_all"].fn(spark, sf_dir).collect()
    }
    assert got == exp
    assert exp, "some customer should beat all same-nation suppliers"


def test_interval_coalesce_matches_python_replay(spark, sf_dir):
    """Maximal merged spans replayed sequentially per user."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    per: dict = {}
    for r in rows:
        s = int(r.ts.timestamp() * 1_000_000)
        cents = int(r.value * 100 + 0.5)
        e = s + (cents % 120 + 1) * 60_000_000
        per.setdefault(r.user_id, []).append((s, r.event_id, e))
    exp = set()
    for uid, iv in per.items():
        iv.sort()
        island = 0
        cur_s, cur_e, n = None, None, 0
        cummax_e = None
        for s, _, e in iv:
            if cummax_e is None or s > cummax_e:
                if cur_s is not None:
                    exp.add((uid, island, cur_s, cur_e, n))
                island += 1
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
            cummax_e = e if cummax_e is None else max(cummax_e, e)
        if cur_s is not None:
            exp.add((uid, island, cur_s, cur_e, n))
    got = {
        (r.user_id, r.island, r.start_us, r.end_us, r.n_intervals)
        for r in QUERIES["win_interval_coalesce"].fn(spark, sf_dir).collect()
    }
    assert got == exp
    # merging happened somewhere: fewer islands than intervals
    assert len(got) < len(rows)


def test_skyline_matches_python_dominance_scan(spark, sf_dir):
    """Skyline must equal the brute-force O(n²) dominance check."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    pts = [
        (r.p_partkey, int(r.p_retailprice * 100 + 0.5), int(r.p_size))
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    exp = set()
    for k, pr, sz in pts:
        dominated = any(
            (qpr <= pr and qsz >= sz and (qpr < pr or qsz > sz))
            for _, qpr, qsz in pts
        )
        if not dominated:
            exp.add((k, pr, sz))
    got = {
        (r.p_partkey, r.price_cents, r.size)
        for r in QUERIES["win_skyline_pareto"].fn(spark, sf_dir).collect()
    }
    assert got == exp
    assert 0 < len(got) < len(pts)


def test_revenue_abc_report_fusion_economics(spark, sf_dir):
    """VERDICT r10 item 8: the composed ABC report enriches at the
    rolled-up grain via BroadcastHashJoin (never a fact-sized join)
    and runs strictly fewer exchanges than the standalone plans it
    fuses; class cents must conserve total fact revenue."""
    import re

    from pyspark.sql import functions as F

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    def plan_of(name):
        return (
            QUERIES[name].fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    def n_exchanges(plan):
        return len(re.findall(r"Exchange (?!SinglePartition)", plan))

    plan = plan_of("pipeline_revenue_abc_report")
    assert "BroadcastHashJoin" in plan
    fused = n_exchanges(plan)
    parts = sum(
        n_exchanges(plan_of(n))
        for n in ("win_cumulative_share", "join_broadcast", "agg_hash")
    )
    assert fused < parts

    rows = QUERIES["pipeline_revenue_abc_report"].fn(spark, sf_dir).collect()
    total = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"))
        .agg(F.sum("pc"))
        .collect()[0][0]
    )
    assert sum(r.cents for r in rows) == total
    assert {r.abc_class for r in rows} == {"A", "B", "C"}


def test_pareto_cum_helper_matches_naive_cumsum(spark):
    """_pareto_cum_cents must equal a naive ordered cumsum on a frame
    engineered to stress the chunking: heavy ties (one cents value
    shared by many keys), extreme outliers (min/max far apart), and a
    value concentration that leaves most chunks empty. cum_cents is
    chunking-invariant by construction — this pins it."""
    import random

    from mapreducenonequijoin_spark.plans.relational import _pareto_cum_cents

    rng = random.Random(7)
    rows = [(k, rng.choice([5, 5, 5, 100, 100, 10_000_000])) for k in range(500)]
    rows += [(500, 0), (501, 10_000_001)]  # exact min/max edges
    df = spark.createDataFrame(rows, "l_partkey long, cents long")
    got = {
        r.l_partkey: (r.cum_cents, r.total)
        for r in _pareto_cum_cents(df, "l_partkey").collect()
    }
    total = sum(c for _, c in rows)
    run = 0
    for k, c in sorted(rows, key=lambda t: (-t[1], t[0])):
        run += c
        assert got[k] == (run, total), k


@pytest.mark.slow
def test_pareto_cum_hypothesis_random_frames(spark):
    """Property sweep (hypothesis): random (key, cents) frames — ties,
    negatives, singletons, and the degenerate ALL-EQUAL case that
    collapses value-range chunking to one chunk — must all equal the
    naive ordered cumsum. One Spark job per example."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from mapreducenonequijoin_spark.plans.relational import _pareto_cum_cents

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        cents=st.one_of(
            st.lists(
                st.integers(min_value=-(10**9), max_value=10**9),
                min_size=1,
                max_size=120,
            ),
            # all-equal degenerate chunking
            st.integers(min_value=-100, max_value=100).flatmap(
                lambda v: st.integers(min_value=1, max_value=60).map(
                    lambda n: [v] * n
                )
            ),
        )
    )
    def check(cents):
        rows = [(k, c) for k, c in enumerate(cents)]
        df = spark.createDataFrame(rows, "l_partkey long, cents long")
        got = {
            r.l_partkey: (r.cum_cents, r.total)
            for r in _pareto_cum_cents(df, "l_partkey").collect()
        }
        total = sum(cents)
        run = 0
        for k, c in sorted(rows, key=lambda t: (-t[1], t[0])):
            run += c
            assert got[k] == (run, total)

    check()
