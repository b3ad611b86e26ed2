"""Round-12 operator tests: Python replays and structural properties
for the r12 additions (RBO, WoE, Bloom prescreen, image normalize,
personalized PageRank, full-outer interval stream)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreducenonequijoin_spark.plans import QUERIES
from mapreducenonequijoin_spark.sources.io import load_table


def test_rbo_python_replay(spark, sf_dir):
    """RBO must equal a full Python replay: fold-order dot / L2
    rankings, truncated-RBO with the integer weight table."""
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _RBO_K,
        _RBO_NQ,
        _RBO_W,
    )

    emb = load_table(spark, sf_dir, "embeddings").collect()
    probes = [(r.vec_id, list(map(float, r.embedding)))
              for r in emb if r.vec_id < _RBO_NQ]
    corpus = [(r.vec_id, list(map(float, r.embedding)))
              for r in emb if r.vec_id >= _RBO_NQ]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    picos = []
    for _, q in sorted(probes):
        scored = []
        for n_id, c in corpus:
            d = fold_dot(q, c)
            nn = fold_dot(c, c)
            scored.append((n_id, d, nn - 2 * d))
        a_list = [n for n, _, _ in sorted(scored, key=lambda t: (-t[1], t[0]))][:_RBO_K]
        b_list = [n for n, _, _ in sorted(scored, key=lambda t: (t[2], t[0]))][:_RBO_K]
        pico = 0
        for d in range(1, _RBO_K + 1):
            x_d = len(set(a_list[:d]) & set(b_list[:d]))
            pico += _RBO_W[d - 1] * x_d // d
        picos.append(pico)
    row = QUERIES["eval_rank_biased_overlap"].fn(spark, sf_dir).collect()[0]
    assert row.n_queries == len(picos)
    assert row.rbo_min_pico == min(picos)
    assert row.rbo_max_pico == max(picos)
    assert row.rbo_mean == round(sum(picos) / len(picos) / 1e12, 6)


def test_woe_python_replay(spark, sf_dir):
    """WoE / IV must match the smoothed-odds recompute, and the IV
    term's sign must equal sign(pos_share - neg_share) x sign(woe)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "lang").collect()
    cells: dict = {}
    for r in docs:
        p, n = cells.get(r.source, (0, 0))
        cells[r.source] = (p + (r.lang == "en"), n + (r.lang != "en"))
    pos_t = sum(p for p, _ in cells.values())
    neg_t = sum(n for _, n in cells.values())
    c = len(cells)
    got = {
        r.source: (r.pos_n, r.neg_n, r.woe_micro, r.iv_term_micro)
        for r in QUERIES["feature_woe_encoding"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for src, (p, n) in cells.items():
        woe = math.floor(
            math.log(((2 * p + 1) * (2 * neg_t + c))
                     / ((2 * n + 1) * (2 * pos_t + c))) * 1_000_000
        )
        share_diff = p * 1_000_000 // pos_t - n * 1_000_000 // neg_t
        prod = share_diff * woe
        iv = prod // 1_000_000 if prod >= 0 else -((-prod) // 1_000_000)
        assert got[src] == (p, n, woe, iv), src


def test_bloom_prescreen_no_false_negatives(spark, sf_dir):
    """Structural Bloom guarantee, recomputed independently: every
    delta doc whose text exists in base must pass the k-position
    semi-join prescreen (and the emitted gate booleans must be True)."""
    row = QUERIES["dedup_bloom_prescreen"].fn(spark, sf_dir).collect()[0]
    assert row.no_false_negatives and row.fp_rate_le_5pct
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    base_texts = {r.text for r in docs if r.doc_id % 10 != 0}
    delta = [(r.doc_id, r.text) for r in docs if r.doc_id % 10 == 0]
    assert row.n_delta == len(delta)
    assert row.n_true_dup == sum(1 for _, t in delta if t in base_texts)


def test_image_normalize_python_replay(spark, sf_dir):
    """Channel stats must equal a recompute from the synthesized PPM
    pixel formula (byte i = (id*31+7i)%256, channel = i%3)."""
    rows = QUERIES["multimodal_image_normalize"].fn(spark, sf_dir).collect()
    got = {
        (r.doc_id, r.channel): (r.n_px, r.ch_sum, r.ch_sumsq, r.znorm_p0)
        for r in rows
    }
    doc_ids = {r.doc_id for r in rows}
    for did in sorted(doc_ids)[:50]:
        w, h = 8 + did % 9, 8 + (did * 7) % 5
        flat = [(did * 31 + 7 * i) % 256 for i in range(3 * w * h)]
        for ch in range(3):
            vals = flat[ch::3]
            n, s, sq = len(vals), sum(vals), sum(v * v for v in vals)
            var_n2 = n * sq - s * s
            z = (
                round((vals[0] * n - s) / math.sqrt(var_n2), 6)
                if var_n2 > 0
                else 0.0
            )
            assert got[(did, ch)] == (n, s, sq, z), (did, ch)


def test_personalized_pagerank_python_replay(spark, sf_dir):
    """Top-25 PPR must equal a 3-iteration Python power replay with the
    seed-restart vector (8dp rounding, id tiebreak)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    cust = {r.o_orderkey: r.o_custkey for r in orders}
    e0 = {
        (f"c{cust[r.l_orderkey]}", f"s{r.l_suppkey}")
        for r in li
        if r.l_orderkey in cust
    }
    edges: dict = {}
    for s, d in e0 | {(d, s) for s, d in e0}:
        edges.setdefault(s, []).append(d)
    nodes = sorted(edges)
    seeds = {
        f"c{cust[r.l_orderkey]}"
        for r in li
        if r.l_orderkey in cust and cust[r.l_orderkey] % 100 == 0
    }
    ns = len(seeds)
    rank = {v: (1.0 / ns if v in seeds else 0.0) for v in nodes}
    for _ in range(3):
        contrib: dict = {}
        for src, dsts in edges.items():
            if rank[src] != 0.0:
                share = rank[src] / len(dsts)
                for d in dsts:
                    contrib[d] = contrib.get(d, 0.0) + share
        rank = {
            v: (0.15 / ns if v in seeds else 0.0)
            + 0.85 * contrib.get(v, 0.0)
            for v in nodes
        }
    want = sorted(
        ((round(r, 8), v) for v, r in rank.items() if round(r, 8) > 0),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    got = [
        (r.rank, r.node_id)
        for r in QUERIES["graph_personalized_pagerank"].fn(spark, sf_dir).collect()
    ]
    # compare as float/name pairs with tolerance on the float sum order
    assert [v for _, v in want] == [v for _, v in got]
    for (wr, _), (gr, _) in zip(want, got):
        assert abs(wr - gr) < 1e-6


def test_full_outer_interval_contains_left_and_errors(spark, sf_dir):
    """The full-outer streaming interval join must contain the left
    form's rows exactly, plus one null-padded row for every error with
    no qualifying purchase."""
    full = QUERIES["stream_full_outer_interval"].fn(spark, sf_dir)
    left = QUERIES["stream_left_outer_interval"].fn(spark, sf_dir)
    f_rows = {(r.p_event_id, r.e_event_id) for r in full.collect()}
    l_rows = {(r.p_event_id, r.e_event_id) for r in left.collect()}
    assert l_rows <= f_rows
    extra = f_rows - l_rows
    assert all(p is None for p, _ in extra)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    p = ev.filter(F.col("event_type") == "purchase").collect()
    e = ev.filter(F.col("event_type") == "error").collect()
    matched_errors = {
        er.event_id
        for er in e
        for pr in p
        if er.user_id == pr.user_id
        and pr.ts > er.ts >= pr.ts - __import__("datetime").timedelta(hours=1)
    }
    want_extra = {(None, er.event_id) for er in e if er.event_id not in matched_errors}
    assert extra == want_extra


def test_adamic_adar_python_replay(spark, sf_dir):
    """AA scores must equal the Python wedge-count replay with the
    per-node floor(1e6/ln(deg)) term table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    by_order: dict = {}
    for r in li:
        if r.l_orderkey % 23 == 0:
            by_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    e0 = set()
    for supps in by_order.values():
        ss = sorted(supps)
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1:]:
                if s2 - s1 <= 15:
                    e0.add((s1, s2))
    adj: dict = {}
    for s1, s2 in e0:
        adj.setdefault(s1, set()).add(s2)
        adj.setdefault(s2, set()).add(s1)
    term = {u: math.floor(1e6 / math.log(len(vs))) for u, vs in adj.items()}
    want = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            common = adj[a] & adj[b]
            if len(common) >= 3:
                aa = sum(term[w] for w in common)
                want[(a, b)] = (len(common), aa, round(aa / 1e6, 6))
    got = {
        (r.a, r.b): (r.n_common, r.aa_micro, r.adamic_adar)
        for r in QUERIES["graph_adamic_adar"].fn(spark, sf_dir).collect()
    }
    assert got == want and want


def test_parameterized_sql_equals_inlined(spark, sf_dir):
    """Bound named parameters must produce the identical result as the
    inlined-literal form of the same SQL."""
    got = {
        tuple(r)
        for r in QUERIES["sql_parameterized_query"].fn(spark, sf_dir).collect()
    }
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_p")
    inlined = {
        tuple(r)
        for r in spark.sql(
            """
            SELECT o_orderpriority, count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders_p
            WHERE o_orderdate >= DATE '1995-01-01'
              AND o_orderdate < DATE '1996-01-01'
              AND o_totalprice > 1000.0
            GROUP BY o_orderpriority
            """
        ).collect()
    }
    assert got == inlined and got


def test_ab_assignment_hash_replay(spark, sf_dir):
    """Arm assignment must equal a hashlib.md5 replay (engine-neutral
    hash contract) and the chi-square must be the exact integer form."""
    import hashlib

    users = {
        r.user_id
        for r in load_table(spark, sf_dir, "events").select("user_id").collect()
    }
    n_a = sum(
        1
        for u in users
        if hashlib.md5(f"exp1:{u}".encode()).hexdigest()[0] < "8"
    )
    n_b = len(users) - n_a
    row = QUERIES["sample_ab_assignment"].fn(spark, sf_dir).collect()[0]
    chi2 = (n_a - n_b) * (n_a - n_b) * 1_000_000 // (n_a + n_b)
    assert (row.n_a, row.n_b, row.chi2_micro, row.srm_pass) == (
        n_a,
        n_b,
        chi2,
        chi2 < 3_841_459,
    )


def test_sax_symbols_python_replay(spark, sf_dir):
    """SAX letters must match the z-breakpoint replay on hourly cents
    sums, and every series must use only the 4-letter alphabet."""
    rows = QUERIES["timeseries_sax_symbols"].fn(spark, sf_dir).collect()
    assert rows and {r.symbol for r in rows} <= {"a", "b", "c", "d"}
    series: dict = {}
    for r in rows:
        series.setdefault(r.event_type, []).append((r.hour_start, r.v_cents, r.symbol))
    for et, pts in series.items():
        n = len(pts)
        s = sum(v for _, v, _ in pts)
        sq = sum(v * v for _, v, _ in pts)
        var_n2 = n * sq - s * s
        assert var_n2 > 0  # degenerate series must have been dropped
        for _, v, sym in pts:
            z = (v * n - s) / math.sqrt(var_n2)
            want = "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"
            assert sym == want, (et, v)


def test_array_hof_python_replay(spark, sf_dir):
    """The four HOF outputs must equal list comprehension replays."""
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    got = {
        r.vec_id: (r.n_pos, r.has_big, r.all_lt3, r.top3_sum)
        for r in QUERIES["fn_array_hof"].fn(spark, sf_dir).collect()
    }
    for vid, vec in emb.items():
        top3 = sorted(vec, reverse=True)[:3]
        acc = 0.0
        for x in top3:
            acc += x
        want = (
            sum(1 for x in vec if x > 0),
            any(abs(x) > 2 for x in vec),
            all(x < 3 for x in vec),
            round(acc, 4),
        )
        assert got[vid] == want, vid


def test_stream_alerting_batch_twin(spark, sf_dir):
    """The composed streaming alert pipeline must equal its batch twin
    (window agg + threshold join + CASE), and conserve event counts."""
    rows = QUERIES["pipeline_stream_alerting"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    th = {
        r.event_type: r.floor
        for r in ev.groupBy("event_type")
        .agg(F.expr("count(*) div 200").alias("floor"))
        .collect()
    }
    twin = {
        (r.window_start, r.event_type): (r.n, r.cents)
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    got = {(r.window_start, r.event_type): (r.n, r.cents) for r in rows}
    assert got == twin
    for r in rows:
        assert r.alert_floor == th[r.event_type]
        assert r.status == ("ALERT" if r.n > r.alert_floor else "ok")
    assert sum(n for n, _ in got.values()) == ev.count()


def test_hll_intersection_gate_exact_and_bound(spark, sf_dir):
    """Exact overlap terms must match a set replay; the inclusion-
    exclusion estimate must clear its within-10%-of-union gate."""
    row = QUERIES["agg_hll_intersection_gate"].fn(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey"
    ).collect()
    a = {r.o_custkey for r in orders if r.o_orderstatus == "O"}
    b = {r.o_custkey for r in orders if r.o_orderstatus == "F"}
    assert (row.n_a, row.n_b, row.n_inter_exact) == (
        len(a),
        len(b),
        len(a & b),
    )
    assert row.inter_within_10pct_of_union == 1


def test_regression_metrics_python_replay(spark, sf_dir):
    """MAE/RMSE/R2/MAPE must equal an exact-integer Python replay of
    the literal linear model."""
    from mapreducenonequijoin_spark.plans.evalmetrics import _REG_A, _REG_B

    rows = load_table(spark, sf_dir, "lineitem").select(
        F.round("l_extendedprice", 0).cast("long").alias("y"),
        F.round("l_quantity", 0).cast("long").alias("q"),
    ).collect()
    n = len(rows)
    sae = sse = sy = syy = sape = 0
    for r in rows:
        yhat = _REG_A + _REG_B * r.q
        e = abs(r.y - yhat)
        sae += e
        sse += e * e
        sy += r.y
        syy += r.y * r.y
        sape += e * 1_000_000 // r.y
    got = QUERIES["eval_regression_metrics"].fn(spark, sf_dir).collect()[0]
    assert got.n == n
    assert got.mae_dollars == round(sae / n, 4)
    assert got.rmse_dollars == round(math.sqrt(sse / n), 4)
    assert got.r2 == round(1.0 - sse / (syy - sy / n * sy), 6)
    assert got.mape_pct == round(sape / n / 10_000, 6)


def test_percentile_disc_is_observed_value(spark, sf_dir):
    """Every discrete percentile must be an ACTUAL observed value at
    exactly rank ceil(p*n) of the sorted group."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.round("l_quantity", 0).cast("long").alias("q")
    ).collect()
    groups: dict = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(r.q)
    got = {
        (r.grp, r.pct): r.value_disc
        for r in QUERIES["agg_percentile_disc"].fn(spark, sf_dir).collect()
    }
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        for pct in (25, 50, 75, 95):
            k = (n * pct + 99) // 100
            assert got[(g, pct)] == vals[k - 1], (g, pct)
            assert got[(g, pct)] in vals


def test_deletion_vectors_never_rewrite_base(spark, sf_dir):
    """The MOR contract: committing the deletion vector must leave the
    base file set byte-identical (names + sizes + mtimes), and the
    read must equal the predicate twin."""
    import os

    from mapreducenonequijoin_spark.plans.warehouse import _dv_build, _dv_dir

    d = _dv_build(spark, sf_dir)

    def base_state():
        out = {}
        for root, _, files in os.walk(f"{d}/base"):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = base_state()
    # force a fresh DV commit and re-read
    import shutil

    shutil.rmtree(f"{d}/dv")
    got = {
        (r.o_orderstatus): (r.n_rows, r.cents)
        for r in QUERIES["warehouse_deletion_vectors"].fn(spark, sf_dir).collect()
    }
    assert base_state() == before, "DV commit rewrote base files"
    want = {
        r.o_orderstatus: (r.n, r.c)
        for r in load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 13 != 1)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("c"),
        )
        .collect()
    }
    assert got == want


def test_rag_context_python_replay(spark, sf_dir):
    """Context assembly must equal the Python replay: chunk, score,
    top-32 by (score desc, doc, chunk), greedy prefix-sum packing."""
    from mapreducenonequijoin_spark.plans.datapipe import (
        _CHUNK_LEN,
        _CHUNK_STRIDE,
        _RAG_CTX_CHARS,
        _RAG_TERMS,
        _RAG_TOPK,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    scored = []
    for r in docs:
        text = r.text
        for idx, s in enumerate(range(1, max(len(text), 1) + 1, _CHUNK_STRIDE)):
            chunk = text[s - 1 : s - 1 + _CHUNK_LEN]
            sc = sum(1 for w in chunk.split(" ") if w in _RAG_TERMS)
            if sc > 0:
                scored.append((sc, r.doc_id, idx, len(chunk)))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    top = scored[:_RAG_TOPK]
    want: dict = {}
    off = 0
    for sc, did, cno, clen in top:
        ctx = off // _RAG_CTX_CHARS
        n, nd, tc, ss = want.get(ctx, (0, set(), 0, 0))
        want[ctx] = (n + 1, nd | {did}, tc + clen, ss + sc)
        off += clen
    got = {
        r.ctx_id: (r.n_chunks, r.n_docs, r.total_chars, r.score_sum)
        for r in QUERIES["pipeline_rag_context"].fn(spark, sf_dir).collect()
    }
    assert got == {
        k: (n, len(nd), tc, ss) for k, (n, nd, tc, ss) in want.items()
    } and got
