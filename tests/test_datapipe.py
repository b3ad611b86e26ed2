"""Property tests for the training-pipeline operators in
plans/datapipe.py — Spark-internal invariants that complement the
DuckDB oracle checks (which pin cross-engine value parity)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from mapreducenonequijoin_spark.plans.datapipe import (
    _CTX_WINDOW,
    _MIX_DEFAULT,
    _MIX_RATES,
    _RSV_K,
    pack_sequences,
    sample_reservoir_grouped,
    sample_stratified,
    text_bm25_search,
    text_pii_redact,
    text_repetition_filter,
)
from mapreducenonequijoin_spark.sources.io import load_table


def test_repetition_fracs_match_python(spark, sf_dir):
    got = {r.doc_id: r for r in text_repetition_filter(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    assert len(got) == len(docs)
    for d in docs:
        w = d.text.split(" ")
        r = got[d.doc_id]
        assert r.n_words == len(w)
        assert abs(r.dup_word_frac - (1 - len(set(w)) / len(w))) < 1e-12
        bigrams = [f"{a} {b}" for a, b in zip(w, w[1:])]
        want_top = (
            Counter(bigrams).most_common(1)[0][1] / len(bigrams) if bigrams else 0.0
        )
        assert abs(r.top_bigram_frac - want_top) < 1e-12


def test_stratified_sample_is_subset_with_plausible_rates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = sample_stratified(spark, sf_dir)
    # sample ⊆ corpus, and re-running gives the identical membership
    assert kept.exceptAll(docs.select("doc_id", "source", "lang")).count() == 0
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(r.doc_id for r in sample_stratified(spark, sf_dir).collect())
    assert ids1 == ids2
    # per-source keep counts honor the configured rate direction
    tot = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in tot.items():
        rate = _MIX_RATES.get(src, _MIX_DEFAULT)
        # binomial(n, rate) stays within ±4·σ + 1 of the mean
        sigma = (n * rate * (1 - rate)) ** 0.5
        assert abs(got.get(src, 0) - n * rate) <= 4 * sigma + 1, src


def test_reservoir_exactly_k_per_group(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sizes = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = Counter(r.source for r in sample_reservoir_grouped(spark, sf_dir).collect())
    for src, n in sizes.items():
        assert got[src] == min(_RSV_K, n)


def test_pii_redact_removes_all_matches(spark, sf_dir):
    out = text_pii_redact(spark, sf_dir)
    assert out.filter(F.col("n_emails") < 1).count() == 0  # synthesized PII
    assert out.filter(F.col("n_phones") < 1).count() == 0
    leftover = out.filter(
        F.col("redacted").rlike("[a-z0-9]+@[a-z]+\\.[a-z]+")
        | F.col("redacted").rlike("[0-9]{3}-[0-9]{4}")
    )
    assert leftover.count() == 0
    assert out.filter(~F.col("redacted").contains("<EMAIL>")).count() == 0


def test_packing_offsets_are_contiguous_per_source(spark, sf_dir):
    rows = pack_sequences(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.offset == cum, src
            assert r.seq_id == cum // _CTX_WINDOW
            cum += r.n_tokens


def test_bm25_ranks_against_python(spark, sf_dir):
    import math

    from mapreducenonequijoin_spark.plans.datapipe import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
    )

    docs = load_table(spark, sf_dir, "documents").collect()
    n = len(docs)
    dls = {d.doc_id: len(d.text.split(" ")) for d in docs}
    avgdl = sum(dls.values()) / n
    tf: dict[int, Counter] = {
        d.doc_id: Counter(w for w in d.text.split(" ") if w in _BM25_TERMS)
        for d in docs
    }
    df = Counter(t for c in tf.values() for t in c)
    scores = {}
    for doc_id, c in tf.items():
        if not c:
            continue
        s = 0.0
        for t, f in c.items():
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * f * (_BM25_K1 + 1) / (
                f + _BM25_K1 * (1 - _BM25_B + _BM25_B * dls[doc_id] / avgdl)
            )
        scores[doc_id] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_BM25_TOPK]
    got = [
        (r.doc_id, r.score)
        for r in text_bm25_search(spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == [(d, s) for d, s in want]


def test_unigram_logprob_matches_python(spark, sf_dir):
    import math

    from mapreducenonequijoin_spark.plans.datapipe import text_unigram_logprob

    docs = load_table(spark, sf_dir, "documents").collect()
    freq: Counter = Counter(w for d in docs for w in d.text.split(" "))
    total = sum(freq.values())
    got = {r.doc_id: r for r in text_unigram_logprob(spark, sf_dir).collect()}
    assert len(got) == len(docs)
    for d in docs:
        ws = d.text.split(" ")
        want = round(-sum(math.log(freq[w] / total) for w in ws) / len(ws), 6)
        assert abs(got[d.doc_id].avg_nll - want) < 1e-9
        assert got[d.doc_id].n_tokens == len(ws)


def test_top_bigram_fold_edge_cases(spark):
    """The sorted-hash run-length fold must match a Python bigram
    Counter on adversarial word patterns the fixture corpus lacks
    (single word, all-same, alternating, palindromic runs)."""
    import random

    from mapreducenonequijoin_spark.plans.datapipe import _top_bigram_count

    rng = random.Random(42)
    texts = ["x", "x x", "x x x x x x", "a b a b a b a", "a a b b a a b b"]
    texts += [
        " ".join(rng.choice("abcd") for _ in range(rng.randint(1, 15)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    w = F.split("text", " ")
    got = {
        r.i: r.top
        for r in df.select("i", _top_bigram_count(w, F.size(w)).alias("top")).collect()
    }
    for i, t in enumerate(texts):
        ws = t.split(" ")
        bigrams = list(zip(ws, ws[1:]))
        want = max(Counter(bigrams).values()) if bigrams else 0
        assert got[i] == want, (t, got[i], want)


def test_repetition_filter_plan_is_shuffle_free(spark, sf_dir):
    """The per-doc fold formulation must never reintroduce an
    exchange — the whole point of _top_bigram_count (the explode
    formulation went superlinear at 100k docs)."""
    plan = (
        text_repetition_filter(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_incremental_etl_split_invariant(spark, sf_dir):
    """The merged incremental state must equal the full-batch
    aggregate for ANY bookmark position (monoid partial aggregation
    is associative/commutative over any input partition)."""
    from pyspark.sql import functions as F

    from mapreducenonequijoin_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    full = {
        r.user_id: (r.n, r.c)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("c"))
        .collect()
    }
    for q in (0.2, 0.5, 0.8):
        cut = (
            ev.agg(F.percentile_approx("ts", F.lit(q), F.lit(100)).alias("c"))
            .collect()[0]["c"]
        )
        inc1 = ev.filter(F.col("ts") <= F.lit(cut))
        inc2 = ev.filter(F.col("ts") > F.lit(cut))
        merged: dict = {}
        for part in (inc1, inc2):
            for r in (
                part.groupBy("user_id")
                .agg(F.count("*").alias("n"), F.sum("cents").alias("c"))
                .collect()
            ):
                n, c = merged.get(r.user_id, (0, 0))
                merged[r.user_id] = (n + r.n, c + r.c)
        assert merged == full, f"split at q={q} diverged"


def test_line_dedup_keeps_exactly_distinct_segments(spark, sf_dir):
    """Global keep-first segment dedup: the total surviving segment
    count must equal the number of DISTINCT segment texts in the
    corpus, and every document's kept count is bounded by its segment
    count (the CCNet line-dedup invariant)."""
    from mapreducenonequijoin_spark.plans.datapipe import (
        _SEG_WORDS,
        text_line_dedup,
    )

    out = text_line_dedup(spark, str(sf_dir)).collect()
    docs = load_table(spark, str(sf_dir), "documents").select("doc_id", "text")
    words = F.split("text", " ")
    n_segs = F.ceil(F.size(words) / F.lit(float(_SEG_WORDS))).cast("long")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * _SEG_WORDS + 1, _SEG_WORDS)),
    )
    n_distinct = (
        docs.select(F.explode(segs).alias("seg")).select("seg").distinct().count()
    )
    assert sum(r.n_kept for r in out) == n_distinct
    assert all(0 <= r.n_kept <= r.n_segments for r in out)
    assert any(r.n_kept < r.n_segments for r in out)  # filter must fire


def test_heavy_hitters_exact_vs_full_wordcount(spark, sf_dir):
    """Two-pass Misra-Gries + recount must equal the full-wordcount
    answer exactly: no false negatives (the pigeonhole completeness
    guarantee) and no false positives (the recount)."""
    from mapreducenonequijoin_spark.plans.datapipe import (
        _HH_COUNTERS,
        agg_heavy_hitters,
    )

    got = {(r.word, r.freq) for r in agg_heavy_hitters(spark, str(sf_dir)).collect()}
    tokens = (
        load_table(spark, str(sf_dir), "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
    )
    n = tokens.count()
    want = {
        (r.word, r.freq)
        for r in tokens.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") > n / (_HH_COUNTERS + 1))
        .collect()
    }
    assert got == want and len(want) > 0


def test_balanced_downsample_equal_class_sizes(spark, sf_dir):
    """Every language must end at exactly min-class-count rows, and the
    kept set must be deterministic across runs (md5 rank, no RNG)."""
    from mapreducenonequijoin_spark.plans.datapipe import (
        sample_balanced_downsample,
    )

    out1 = sample_balanced_downsample(spark, str(sf_dir))
    sizes = {r.lang: r.n for r in out1.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    docs = load_table(spark, str(sf_dir), "documents")
    want = min(
        r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    assert set(sizes.values()) == {want}
    got1 = {(r.doc_id, r.lang) for r in out1.collect()}
    got2 = {
        (r.doc_id, r.lang)
        for r in sample_balanced_downsample(spark, str(sf_dir)).collect()
    }
    assert got1 == got2


def test_gaps_islands_no_adjacent_islands(spark, sf_dir):
    """Islands per priority must be disjoint AND separated by at least
    one missing day (adjacent islands would mean the run was split),
    and n_days must equal the inclusive day span (runs are gap-free)."""
    import datetime as dt

    from mapreducenonequijoin_spark.plans.analytics import win_gaps_and_islands

    rows = win_gaps_and_islands(spark, str(sf_dir)).collect()
    by_pri: dict = {}
    for r in rows:
        s = dt.date.fromisoformat(r.island_start)
        e = dt.date.fromisoformat(r.island_end)
        assert (e - s).days + 1 == r.n_days
        by_pri.setdefault(r.priority, []).append((s, e))
    for pri, spans in by_pri.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert (s2 - e1).days >= 2  # a real gap separates islands


def test_weighted_systematic_pps_bias(spark, sf_dir):
    """Systematic PPS: ~50 rows come back, deterministic across runs,
    and the selected set is size-biased — mean weight of the sample
    strictly exceeds the corpus mean weight."""
    from mapreducenonequijoin_spark.plans.datapipe import (
        sample_weighted_systematic,
    )

    out1 = sample_weighted_systematic(spark, str(sf_dir)).collect()
    out2 = sample_weighted_systematic(spark, str(sf_dir)).collect()
    assert {r.doc_id for r in out1} == {r.doc_id for r in out2}
    assert 45 <= len(out1) <= 55
    docs = load_table(spark, str(sf_dir), "documents").select("n_chars").collect()
    corpus_mean = sum(r.n_chars for r in docs) / len(docs)
    sample_mean = sum(r.weight for r in out1) / len(out1)
    assert sample_mean > corpus_mean


def test_collocation_lift_recount(spark, sf_dir):
    """Every reported bigram must truly occur n_ab >= 5 times, and its
    lift must equal the closed-form ratio recomputed from raw counts."""
    from collections import Counter

    from mapreducenonequijoin_spark.plans.datapipe import text_collocations_pmi

    docs = [r.text for r in
            load_table(spark, str(sf_dir), "documents").select("text").collect()]
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in docs:
        ws = t.split(" ")
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    nw, nb = sum(uni.values()), sum(bi.values())
    out = text_collocations_pmi(spark, str(sf_dir)).collect()
    assert out
    for r in out:
        n_ab = bi[(r.w1, r.w2)]
        assert n_ab == r.n_ab and n_ab >= 5
        want = round(n_ab * nw * nw / nb / uni[r.w1] / uni[r.w2], 6)
        assert abs(r.lift - want) < 1e-9


def test_quality_gate_clean_fixture_passes(spark, sf_dir):
    """The TPC-H-ish fixture satisfies the structural invariants the
    gate asserts (unique PK, no null FK keys, no orphans): those
    checks must report zero violations, and every check must have
    scanned a non-empty population."""
    from mapreducenonequijoin_spark.plans.datapipe import (
        pipeline_quality_gate_report,
    )

    rows = {
        r.check_name: r for r in pipeline_quality_gate_report(spark, sf_dir).collect()
    }
    assert len(rows) == 6
    for name in ("orders_null_custkey", "orders_dup_pk", "lineitem_orphan_fk"):
        assert rows[name].n_violations == 0, name
    for r in rows.values():
        assert r.n_checked > 0


def test_ohlc_bar_invariants(spark, sf_dir):
    """Every OHLC bar: low <= open, close <= high, volume >= 1."""
    import pyspark.sql.functions as F

    from mapreducenonequijoin_spark.plans.analytics import (
        timeseries_ohlc_resample,
    )

    bad = (
        timeseries_ohlc_resample(spark, sf_dir)
        .filter(
            ~(
                (F.col("low") <= F.col("open"))
                & (F.col("open") <= F.col("high"))
                & (F.col("low") <= F.col("close"))
                & (F.col("close") <= F.col("high"))
                & (F.col("n_events") >= 1)
            )
        )
        .count()
    )
    assert bad == 0


def test_ema_matches_reference_recurrence(spark, sf_dir):
    """Re-run the recurrence in plain Python off the raw events and
    compare every smoothed point (pre-rounding order fixed by
    (ts, event_id))."""
    import pyspark.sql.functions as F

    from mapreducenonequijoin_spark.plans.analytics import timeseries_ema_smooth
    from mapreducenonequijoin_spark.sources.io import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        series.setdefault(r.user_id, []).append(float(r.value))
    expect = {}
    for u, xs in series.items():
        y = None
        for i, x in enumerate(xs, start=1):
            y = x if y is None else 0.7 * y + 0.3 * x
            expect[(u, i)] = int(y * 1000000.0)  # truncated micros (r14)
    got = timeseries_ema_smooth(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        assert r.ema_micro == expect[(r.user_id, r.rn)], r


def test_url_canonical_collapses_planted_variants(spark, sf_dir):
    """Docs sharing (source, doc_id mod 400) must collapse to one
    canonical URL regardless of scheme/case/www/utm/slash noise, and
    the keeper is the smallest doc_id of the group."""
    import pyspark.sql.functions as F

    from mapreducenonequijoin_spark.plans.datapipe import dedup_url_canonical

    res = dedup_url_canonical(spark, sf_dir)
    # no canonical url retains any of the noise
    noisy = res.filter(
        F.col("canonical_url").rlike("utm_|www\\.|/$|^http://")
        | (F.col("canonical_url") != F.lower(F.col("canonical_url")))
    ).count()
    assert noisy == 0
    # planted collisions exist and keepers are minima
    assert res.filter(F.col("n_docs") > 1).count() > 0


def test_poisson_bootstrap_mass_and_spread(spark, sf_dir):
    """Each replicate draws ~n rows (Poisson(1) total mass) and the
    replicate means differ (independent seeds) while staying near the
    population mean."""
    import pyspark.sql.functions as F

    from mapreducenonequijoin_spark.plans.datapipe import sample_poisson_bootstrap
    from mapreducenonequijoin_spark.sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    pop_mean = li.agg(F.avg("l_extendedprice")).collect()[0][0]
    rows = sample_poisson_bootstrap(spark, sf_dir).collect()
    assert len(rows) == 3
    means = {r.mean_price for r in rows}
    assert len(means) == 3  # distinct draws per replicate
    for r in rows:
        assert abs(r.n_drawn - n) < 0.05 * n, (r.n_drawn, n)
        assert abs(r.mean_price - pop_mean) < 0.05 * pop_mean


def test_waterfill_max_min_fair_invariants(spark, sf_dir):
    """Allocation never exceeds a domain's own tokens; total stays
    within the budget and undershoots by less than #domains; every
    clipped domain gets the same cap, and no kept-whole domain is
    larger than the cap."""
    from mapreducenonequijoin_spark.plans.datapipe import (
        pipeline_token_budget_waterfill,
    )

    rows = pipeline_token_budget_waterfill(spark, sf_dir).collect()
    total = sum(r.toks for r in rows)
    budget = int(0.6 * total)
    alloc = sum(r.alloc for r in rows)
    assert alloc <= budget
    assert budget - alloc < len(rows)
    clipped = {r.alloc for r in rows if r.alloc < r.toks}
    assert len(clipped) <= 1  # common cap
    if clipped:
        cap = clipped.pop()
        assert all(r.toks <= cap or r.alloc == cap for r in rows)
    for r in rows:
        assert 0 <= r.alloc <= r.toks


def test_preference_pairs_margins(spark, sf_dir):
    from mapreducenonequijoin_spark.plans.datapipe import pipeline_preference_pairs

    for r in pipeline_preference_pairs(spark, sf_dir).collect():
        assert r.chosen_score >= r.rejected_score
        assert r.score_margin == r.chosen_score - r.rejected_score
        if r.score_margin > 0:
            assert r.chosen_doc_id != r.rejected_doc_id


def test_kneser_ney_reference_recompute(spark, sf_dir):
    """Full Python reference recompute of interpolated Kneser-Ney from
    the raw documents — every statistic (c_ab, c_a, N1+(a.), N1+(.b),
    type total) and the fixed-parenthesization probability must match
    the distributed plan exactly after the single 6dp rounding."""
    from collections import Counter

    from mapreducenonequijoin_spark.plans.datapipe import text_bigram_kneser_ney
    from mapreducenonequijoin_spark.sources.io import load_table

    texts = [r.text for r in load_table(spark, sf_dir, "documents").select("text").collect()]
    cab: Counter = Counter()
    for t in texts:
        w = t.split(" ")
        for i in range(len(w) - 1):
            cab[(w[i], w[i + 1])] += 1
    c_a: Counter = Counter()
    n1p_a: Counter = Counter()
    n1p_b: Counter = Counter()
    for (a, b), c in cab.items():
        c_a[a] += c
        n1p_a[a] += 1
        n1p_b[b] += 1
    n_types = len(cab)
    got = {(r.a, r.b): (r.c_ab, r.p_kn) for r in text_bigram_kneser_ney(spark, sf_dir).collect()}
    want = {
        (a, b): (
            c,
            round(
                max(c - 0.75, 0) / c_a[a]
                + (0.75 * n1p_a[a] / c_a[a]) * (n1p_b[b] / n_types),
                6,
            ),
        )
        for (a, b), c in cab.items()
        if c >= 8
    }
    assert got == want
    # interpolated-KN sanity: every probability strictly in (0, 1]
    assert all(0 < p <= 1 for _, p in got.values())


def test_dataset_card_recompute(spark, sf_dir):
    """Card rows must match a Python recompute: volumes, dup fraction
    (exact text dups), language entropy over the per-source mix."""
    import math
    from collections import Counter, defaultdict

    from mapreducenonequijoin_spark.plans.datapipe import pipeline_dataset_card
    from mapreducenonequijoin_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", "n_chars", "text"
    ).collect()
    vol = defaultdict(lambda: [0, 0, 0, set()])
    langs = defaultdict(Counter)
    for r in docs:
        v = vol[r.source]
        v[0] += 1
        v[1] += r.n_chars
        v[2] += len(r.text.split(" "))
        v[3].add(r.text)
        langs[r.source][r.lang] += 1
    got = {r.source: r for r in pipeline_dataset_card(spark, sf_dir).collect()}
    assert set(got) == set(vol)
    for src, (n, chars, toks, texts) in vol.items():
        r = got[src]
        assert (r.n_docs, r.total_chars, r.total_tokens) == (n, chars, toks)
        assert r.n_dup_docs == n - len(texts)
        assert r.dup_frac == round((n - len(texts)) / n, 6)
        assert r.mean_tokens == round(toks / n, 6)
        cs = list(langs[src].values())
        assert r.n_langs == len(cs)
        ent = round(math.log(n) - sum(c * math.log(c) for c in cs) / n, 6)
        assert abs(r.lang_entropy - ent) <= 1e-6


def test_group_holdout_no_leakage(spark, sf_dir):
    """Every source maps to exactly ONE split (the leakage guarantee),
    both splits are non-empty, volumes match a direct recount, and
    the assignment is the deterministic md5 bucket."""
    import hashlib
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans.datapipe import sample_group_holdout
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = sample_group_holdout(spark, sf_dir).collect()
    splits = defaultdict(set)
    for r in rows:
        splits[r.source].add(r.split)
    assert all(len(s) == 1 for s in splits.values()), "a source leaked across splits"
    assert {r.split for r in rows} == {"train", "holdout"}
    cut = format(int(0.8 * 16**8), "08x")
    recount = {
        (r.source, r.n): r.chars
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    for r in rows:
        want = (
            "train"
            if hashlib.md5(f"grp{r.source}".encode()).hexdigest()[:8] < cut
            else "holdout"
        )
        assert r.split == want
        assert recount[(r.source, r.n_docs)] == r.n_chars


def test_cumulative_share_pareto_invariants(spark, sf_dir):
    """cum_share is monotone in rank order, ends at 1.0 for the
    globally-last part if sampled, classes respect the 0.8/0.95
    boundaries, and cum_cents matches a full recompute."""
    from mapreducenonequijoin_spark.plans.relational import win_cumulative_share
    from mapreducenonequijoin_spark.sources.io import load_table

    per_part = {
        r.l_partkey: r.cents
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"))
        .groupBy("l_partkey")
        .agg(F.sum("pc").alias("cents"))
        .collect()
    }
    order = sorted(per_part, key=lambda k: (-per_part[k], k))
    total = sum(per_part.values())
    cum = {}
    acc = 0
    for k in order:
        acc += per_part[k]
        cum[k] = acc
    for r in win_cumulative_share(spark, sf_dir).collect():
        assert r.l_partkey % 50 == 0
        assert r.cents == per_part[r.l_partkey]
        assert r.cum_cents == cum[r.l_partkey]
        assert r.cum_share == round(cum[r.l_partkey] / total, 6)
        want_cls = "A" if r.cum_share <= 0.8 else "B" if r.cum_share <= 0.95 else "C"
        assert r.abc_class == want_cls


def test_span_corruption_reference(spark, sf_dir):
    """Spans must match a sequential Python replay of the md5 coin:
    contiguous masked runs, correct numbering, ~15% mask rate, and
    span_text reassembles the original tokens."""
    import hashlib

    from mapreducenonequijoin_spark.plans.datapipe import (
        _SPAN_CUT,
        pipeline_span_corruption,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 6 == 2)
        .select("doc_id", "text")
        .collect()
    }
    want = {}
    n_tok = n_masked = 0
    for doc_id, toks in docs.items():
        span_id = 0
        prev = False
        for i, w in enumerate(toks, start=1):
            n_tok += 1
            m = hashlib.md5(f"span{doc_id}:{i}".encode()).hexdigest()[:8] < _SPAN_CUT
            if m:
                n_masked += 1
                if not prev:
                    span_id += 1
                    want[(doc_id, span_id)] = [i, 0, []]
                want[(doc_id, span_id)][1] += 1
                want[(doc_id, span_id)][2].append(w)
            prev = m
    got = {
        (r.doc_id, r.span_id): (r.start_pos, r.span_len, r.span_text)
        for r in pipeline_span_corruption(spark, sf_dir).collect()
    }
    assert got == {k: (v[0], v[1], " ".join(v[2])) for k, v in want.items()}
    assert 0.10 < n_masked / n_tok < 0.20  # the 15% schedule, loosely


def test_neyman_allocation_reference(spark, sf_dir):
    """Allocations must match the N_h·σ_h rule recomputed in numpy,
    respect the budget, and give zero to zero-variance strata."""
    import math
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans.datapipe import (
        _NEYMAN_TOTAL,
        sample_stratified_neyman,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    strata = defaultdict(list)
    for r in load_table(spark, sf_dir, "documents").select("source", "n_chars").collect():
        strata[r.source].append(r.n_chars)
    sig = {}
    for src, xs in strata.items():
        n = len(xs)
        sx, sx2 = sum(xs), sum(x * x for x in xs)
        sig[src] = (n, math.sqrt((n * sx2 - sx * sx) / (n * n)))
    denom = sum(n * s for n, s in sig.values())
    got = {r.source: r for r in sample_stratified_neyman(spark, sf_dir).collect()}
    assert set(got) == set(sig)
    for src, (n, s) in sig.items():
        r = got[src]
        assert r.n_h == n
        assert r.sigma == round(s, 6)
        assert r.n_alloc == math.floor(_NEYMAN_TOTAL * (n * s) / denom)
    assert sum(r.n_alloc for r in got.values()) <= _NEYMAN_TOTAL


def test_rendezvous_sharding_minimal_movement(spark, sf_dir):
    """HRW core property: re-sharding from 8 to 7 shards moves ONLY
    the docs whose argmax was the removed shard — every other doc
    keeps its assignment (verified in a Python replay); the Spark
    rollup matches the replay's shard census."""
    import hashlib

    from mapreducenonequijoin_spark.plans.datapipe import (
        _HRW_SHARDS,
        pipeline_rendezvous_sharding,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    ids = [r.doc_id for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()]

    def assign(doc, n):
        return max(range(n), key=lambda s: (hashlib.md5(f"{doc}#{s}".encode()).hexdigest(), -s))

    a8 = {d: assign(d, _HRW_SHARDS) for d in ids}
    a7 = {d: assign(d, _HRW_SHARDS - 1) for d in ids}
    moved = [d for d in ids if a8[d] != a7[d]]
    assert all(a8[d] == _HRW_SHARDS - 1 for d in moved), "a survivor moved"
    census = {}
    for d, s in a8.items():
        n, lo, hi = census.get(s, (0, d, d))
        census[s] = (n + 1, min(lo, d), max(hi, d))
    got = {r.shard: (r.n_docs, r.min_doc, r.max_doc)
           for r in pipeline_rendezvous_sharding(spark, sf_dir).collect()}
    assert got == census


def test_point_in_time_features_no_leakage(spark, sf_dir):
    """Every feature must be computable from STRICTLY earlier events
    only — verified by a sequential per-user replay; feature values
    at the first event are 0/NULL."""
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans.datapipe import (
        pipeline_point_in_time_features,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    timelines = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts", "value")
        .collect()
    ):
        timelines[r.user_id].append((r.ts, r.event_id, r.event_type, round(r.value * 100)))
    want = {}
    for uid, tl in timelines.items():
        tl.sort()
        clicks = events = 0
        last_view = None
        for _, eid, etype, cents in tl:
            if etype == "purchase":
                want[eid] = (uid, clicks, last_view, events, cents)
            clicks += etype == "click"
            events += 1
            if etype == "view":
                last_view = cents
    got = {
        r.event_id: (r.user_id, r.clicks_before, r.last_view_cents,
                     r.events_before, r.label_cents)
        for r in pipeline_point_in_time_features(spark, sf_dir).collect()
    }
    assert got == want


def test_perplexity_filter_shape_and_keep_consistency(spark, sf_dir):
    """Every doc with >= 2 words appears with n_bigrams = words-1
    (the corpus-trained LM has no OOV bigrams), scores are positive,
    and keep is exactly the rounded-score comparison."""
    from mapreducenonequijoin_spark.plans.datapipe import text_perplexity_filter
    from mapreducenonequijoin_spark.sources.io import load_table

    words = {
        r.doc_id: len(r.text.split(" "))
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    rows = {r.doc_id: r for r in text_perplexity_filter(spark, sf_dir).collect()}
    expect = {d for d, w in words.items() if w >= 2}
    assert set(rows) == expect
    for d, r in rows.items():
        assert r.n_bigrams == words[d] - 1, d
        assert r.avg_nll > 0
        assert r.keep == (r.avg_nll <= 6.0)


def test_temporal_embargo_boundaries_and_gap(spark, sf_dir):
    """Every event is assigned; split boundaries respect time order
    (max train ts < min embargo ts <= max embargo ts < min eval ts
    when the middle band is non-empty) and the embargo band sits at
    the 75-80% span positions."""
    from mapreducenonequijoin_spark.plans.datapipe import split_temporal_embargo
    from mapreducenonequijoin_spark.sources.io import load_table

    ev = {r.event_id: r.ts for r in
          load_table(spark, sf_dir, "events").collect()}
    rows = {
        r.event_id: r.split for r in split_temporal_embargo(spark, sf_dir).collect()
    }
    assert set(rows) == set(ev)
    by = {"train": [], "embargo": [], "eval": []}
    for eid, s in rows.items():
        by[s].append(ev[eid])
    assert by["train"] and by["eval"]
    if by["embargo"]:
        assert max(by["train"]) < min(by["embargo"])
        assert max(by["embargo"]) < min(by["eval"])
    else:
        assert max(by["train"]) < min(by["eval"])
    mn, mx = min(ev.values()), max(ev.values())
    span = (mx - mn).total_seconds()
    cut75 = (max(by["train"]) - mn).total_seconds() / span
    cut80 = (min(by["eval"]) - mn).total_seconds() / span
    assert cut75 < 0.75 + 0.01
    assert cut80 > 0.80 - 0.01


def test_bpe_merges_greedy_recompute(spark, sf_dir):
    """Recompute the 4 merges in plain Python with the same
    left-to-right non-overlapping pairing (regex two-pass fixpoint
    over ' x y ' patterns) and identical tie-break; the emitted merge
    table must match exactly."""
    import re
    from collections import Counter

    from mapreducenonequijoin_spark.plans.datapipe import (
        _BPE_STEPS,
        tokenizer_bpe_merges,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    wc = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        for w in r.text.split(" "):
            if re.fullmatch("[a-z]+", w):
                wc[w] += 1
    syms = {w: " " + " ".join(w) + " " for w in wc}
    want = []
    for _ in range(_BPE_STEPS):
        pc = Counter()
        for w, s in syms.items():
            arr = s.split()
            for x, y in zip(arr, arr[1:]):
                pc[(x, y)] += wc[w]
        mc = max(pc.values())
        x, y = min(p for p, c in pc.items() if c == mc)
        want.append((x, y, x + y, mc))
        pat, rep = f" {x} {y} ", f" {x}{y} "
        syms = {
            w: s.replace(pat, rep).replace(pat, rep) for w, s in syms.items()
        }
    got = sorted(tokenizer_bpe_merges(spark, sf_dir).collect(),
                 key=lambda r: r.step)
    assert [(r.left_sym, r.right_sym, r.merged_sym, r.pair_count)
            for r in got] == want


def test_ngram_novelty_bounds_and_short_doc_guard(spark, sf_dir):
    """novelty ∈ [0,1] with n_novel ≤ n_trigrams; every test doc with
    ≥3 words appears exactly once; Python recompute on a sample doc
    (guards the sequence(0,-1) descending-array pitfall)."""
    from mapreducenonequijoin_spark.plans.datapipe import text_ngram_novelty
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = {r.doc_id: r for r in text_ngram_novelty(spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        assert r.doc_id % 10 == 0
        assert 0 <= r.n_novel <= r.n_trigrams, r
    docs = {
        d.doc_id: d.text
        for d in load_table(spark, sf_dir, "documents").collect()
    }
    trains = set()
    for did, text in docs.items():
        if did % 10 != 0:
            w = text.split(" ")
            trains.update(
                " ".join(w[i : i + 3]) for i in range(len(w) - 2)
            )
    some = sorted(k for k in rows if len(docs[k].split(" ")) >= 3)[0]
    w = docs[some].split(" ")
    grams = [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
    assert rows[some].n_trigrams == len(grams)
    assert rows[some].n_novel == sum(g not in trains for g in grams)


def test_ess_importance_bounds(spark, sf_dir):
    """1 ≤ ESS ≤ n (Cauchy-Schwarz both ways for non-negative
    weights); ratio consistent with ess/n."""
    from mapreducenonequijoin_spark.plans.datapipe import sample_ess_importance

    for r in sample_ess_importance(spark, sf_dir).collect():
        assert 1.0 <= r.ess <= r.n + 1e-6, r
        assert abs(r.ess_ratio - round(r.ess / r.n, 6)) < 1e-5, r


def test_mix_kl_gibbs_inequality(spark, sf_dir):
    """Σ kl_term ≥ 0 (Gibbs) with equality iff uniform; p sums to ~1
    and every q is 1/n_sources."""
    from mapreducenonequijoin_spark.plans.datapipe import pipeline_mix_kl

    rows = pipeline_mix_kl(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.p for r in rows) - 1.0) < 1e-3
    qs = {r.q for r in rows}
    assert len(qs) == 1 and abs(qs.pop() - 1.0 / len(rows)) < 1e-5
    assert sum(r.kl_term for r in rows) >= -1e-9


def test_distinct_ngrams_bounds(spark, sf_dir):
    """0 < distinct-k ≤ 1, d ≤ n, and distinct2 ≥ distinct1 is NOT
    assumed (not a theorem) — but both ratios recompute exactly."""
    from mapreducenonequijoin_spark.plans.datapipe import eval_distinct_ngrams

    rows = eval_distinct_ngrams(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.d1 <= r.n1 and 0 < r.d2 <= r.n2, r
        assert abs(r.distinct1 - round(r.d1 / r.n1, 6)) < 1e-12
        assert abs(r.distinct2 - round(r.d2 / r.n2, 6)) < 1e-12


def test_autocorr_sequential_recompute(spark, sf_dir):
    """ACF(1) per stream must match a sequential Python recompute over
    the (ts, event_id)-ordered cents series, truncation included."""
    import math

    from mapreducenonequijoin_spark.plans.analytics import timeseries_autocorr
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    want = {}
    for et, pts in series.items():
        pts.sort(key=lambda t: (t[0], t[1]))
        cents = [int(round(v * 100)) for _, _, v in pts]
        xs, ys = cents[1:], cents[:-1]
        n = len(xs)
        if n < 2:
            continue
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        vx = float(n) * float(sxx) - float(sx) * float(sx)
        vy = float(n) * float(syy) - float(sy) * float(sy)
        if vx <= 0 or vy <= 0:
            continue
        num = float(n) * float(sxy) - float(sx) * float(sy)
        want[et] = (n, int(num / (math.sqrt(vx) * math.sqrt(vy)) * 1_000_000.0))
    got = {
        r.event_type: (r.n, r.acf1_micro)
        for r in timeseries_autocorr(spark, sf_dir).collect()
    }
    assert got == want
    for n, micro in got.values():
        assert -1_000_000 <= micro <= 1_000_000


def test_skew_kurtosis_matches_statistics_module(spark, sf_dir):
    """Population skewness/kurtosis per group vs a two-pass Python
    recompute on the raw quantities (the n-power one-pass formula must
    agree with the naive centered definition to ~1e-6 relative)."""
    from mapreducenonequijoin_spark.plans.analytics import agg_skew_kurtosis
    from mapreducenonequijoin_spark.sources.io import load_table

    raw: dict[str, list[int]] = {}
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).collect():
        raw.setdefault(r.l_returnflag, []).append(int(r.l_quantity))
    got = {r.l_returnflag: r for r in agg_skew_kurtosis(spark, sf_dir).collect()}
    assert set(got) == set(raw)
    for flag, xs in raw.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        assert got[flag].n == n
        assert abs(got[flag].skew_micro / 1e6 - m3 / m2**1.5) < 1e-4
        assert abs(got[flag].kurt_micro / 1e6 - (m4 / m2**2 - 3)) < 1e-4


def test_oov_rate_consistent_with_vocab(spark, sf_dir):
    """OOV counts must equal a Python recompute against the exact
    top-K vocab, and a token in the vocab must never count as OOV."""
    from mapreducenonequijoin_spark.plans.datapipe import (
        _VOCAB_K,
        tokenizer_coverage_oov,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    from collections import Counter

    global_c: Counter = Counter()
    per_source: dict[str, Counter] = {}
    for r in docs:
        toks = r.text.split(" ")
        global_c.update(toks)
        per_source.setdefault(r.source, Counter()).update(toks)
    vocab = {
        w for w, _ in sorted(global_c.items(), key=lambda kv: (-kv[1], kv[0]))[:_VOCAB_K]
    }
    got = {r.source: r for r in tokenizer_coverage_oov(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for src, c in per_source.items():
        n_tokens = sum(c.values())
        n_oov = sum(v for w, v in c.items() if w not in vocab)
        assert (got[src].n_tokens, got[src].n_oov) == (n_tokens, n_oov)
        assert got[src].oov_rate == round(n_oov / n_tokens, 6)


def test_kfold_balanced_and_stable(spark, sf_dir):
    """Folds partition the corpus, are ~balanced (within 4x of ideal
    at smoke scale), and a rerun yields the identical assignment."""
    from mapreducenonequijoin_spark.plans.datapipe import (
        _KFOLD_K,
        sample_kfold_assign,
    )

    a = {r.doc_id: r.fold for r in sample_kfold_assign(spark, sf_dir).collect()}
    b = {r.doc_id: r.fold for r in sample_kfold_assign(spark, sf_dir).collect()}
    assert a == b
    from collections import Counter

    sizes = Counter(a.values())
    assert set(sizes) <= set(range(_KFOLD_K))
    ideal = len(a) / _KFOLD_K
    for k in range(_KFOLD_K):
        assert sizes.get(k, 0) > ideal / 4
        assert sizes.get(k, 0) < ideal * 4


def test_feature_hashing_matches_python_recompute(spark, sf_dir):
    """Bucket counts must equal a Python md5-bucketed recompute and
    conserve the total token count."""
    import hashlib
    from collections import Counter

    from mapreducenonequijoin_spark.plans.datapipe import text_feature_hashing
    from mapreducenonequijoin_spark.sources.io import load_table

    want: Counter = Counter()
    n_tokens = 0
    for r in load_table(spark, sf_dir, "documents").collect():
        for w in r.text.split(" "):
            want[(r.source, hashlib.md5(w.encode()).hexdigest()[:2])] += 1
            n_tokens += 1
    got = {
        (r.source, r.bucket): r.n
        for r in text_feature_hashing(spark, sf_dir).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == n_tokens


def test_gini_matches_python_recompute(spark, sf_dir):
    """Per-source Gini must match the sorted-rank identity recomputed
    in Python and sit in [0, 1e6)."""
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans.datapipe import agg_gini_inequality
    from mapreducenonequijoin_spark.sources.io import load_table

    by_src = defaultdict(list)
    for r in load_table(spark, sf_dir, "documents").collect():
        by_src[r.source].append((r.n_chars, r.doc_id))
    got = {r.source: (r.n, r.gini_micro) for r in agg_gini_inequality(spark, sf_dir).collect()}
    assert set(got) == set(by_src)
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        sx = sum(x for x, _ in vals)
        six = sum((i + 1) * x for i, (x, _) in enumerate(vals))
        want = (2 * six - (n + 1) * sx) * 1_000_000 // (n * sx)
        assert got[src] == (n, want)
        assert 0 <= want < 1_000_000


def test_mattr_matches_python_recompute(spark, sf_dir):
    """Per-source MATTR must match a Python sliding-window recompute
    and sit in (0, 1e6]."""
    from collections import defaultdict

    from mapreducenonequijoin_spark.plans.datapipe import (
        _MATTR_W,
        text_lexical_diversity,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    per_src = defaultdict(list)
    for r in load_table(spark, sf_dir, "documents").collect():
        tk = r.text.split(" ")
        if len(tk) >= _MATTR_W:
            wins = [
                len(set(tk[i : i + _MATTR_W]))
                for i in range(len(tk) - _MATTR_W + 1)
            ]
            w_eff = _MATTR_W
        else:
            wins = [len(set(tk))]
            w_eff = len(tk)
        per_src[r.source].append(
            sum(wins) * 1_000_000 // (len(wins) * w_eff)
        )
    got = {
        r.source: (r.n_docs, r.mattr_micro)
        for r in text_lexical_diversity(spark, sf_dir).collect()
    }
    assert set(got) == set(per_src)
    for src, vals in per_src.items():
        assert got[src] == (len(vals), sum(vals) // len(vals))
        assert 0 < got[src][1] <= 1_000_000


def test_universe_sample_completeness_gate(spark, sf_dir):
    """The consistency gate: sampled users keep ALL their events, and
    the user set equals the Python md5 replay."""
    import hashlib

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    users = {
        r.user_id
        for r in load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .collect()
    }
    picked = {
        u
        for u in users
        if hashlib.md5(f"uv{u}".encode()).hexdigest()[:8] < "1999999a"
    }
    got = QUERIES["sample_universe_consistent"].fn(spark, sf_dir).collect()[0]
    assert got.n_partial_users == 0
    assert got.n_users == len(picked)
    assert 0 < got.share_milli < 1000


def test_zipf_fit_matches_python_recompute(spark, sf_dir):
    """Slope must match an exact-int replay over the same top-256
    spectrum with the embedded ln(rank) table."""
    import math

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.datapipe import (
        _LN_RANK_MILLI,
        _ZIPF_K,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    freq: dict = {}
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        for w in r.text.split(" "):
            freq[w] = freq.get(w, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_K]
    n = len(top)
    sx = sy = sxy = sxx = 0
    for i, (_, c) in enumerate(top):
        x = _LN_RANK_MILLI[i]
        y = math.trunc(math.log(c) * 1_000_000)
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    got = QUERIES["text_zipf_fit"].fn(spark, sf_dir).collect()[0]
    assert got.n_ranks == n
    assert got.slope_micro == math.trunc(num * 1000 / den)
    # natural-ish corpus: slope in (-2, -0.1)
    assert -2_000_000 < got.slope_micro < -100_000


def test_jensen_shannon_matches_python_recompute(spark, sf_dir):
    """Per-token JS terms replayed in Python; terms non-negative and
    their sum inside [0, ln2]."""
    import math

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    c1: dict = {}
    c2: dict = {}
    for r in load_table(spark, sf_dir, "documents").filter(
        "source in ('src0', 'src1')"
    ).collect():
        tgt = c1 if r.source == "src0" else c2
        for w in r.text.split(" "):
            tgt[w] = tgt.get(w, 0) + 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    exp = {}
    for w in set(c1) | set(c2):
        p = c1.get(w, 0) / n1
        q = c2.get(w, 0) / n2
        t = 0.0
        if c1.get(w, 0) > 0:
            t += p * math.log(2.0 * p / (p + q))
        if c2.get(w, 0) > 0:
            t += q * math.log(2.0 * q / (p + q))
        exp[w] = (c1.get(w, 0), c2.get(w, 0), math.trunc(t * 500_000))
    got = {
        r.w: (r.c1, r.c2, r.js_term_micro)
        for r in QUERIES["eval_jensen_shannon"].fn(spark, sf_dir).collect()
    }
    assert got == exp
    total = sum(v[2] for v in got.values())
    assert 0 <= total <= int(math.log(2) * 1_000_000) + len(got)


def test_time_decay_matches_python_replay(spark, sf_dir):
    """Exact replay of the md5 draw against the embedded decay
    ladder, bucketed by age week."""
    import hashlib

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.datapipe import _DECAY_MILLI
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    ).collect()
    mxd = max(r.ts.date() for r in rows)
    agg: dict = {}
    for r in rows:
        age = (mxd - r.ts.date()).days
        u = int(hashlib.md5(f"td{r.event_id}".encode()).hexdigest()[:8], 16)
        p = _DECAY_MILLI[age] if age < len(_DECAY_MILLI) else 0
        kept = 1 if u * 1000 < p * 4294967296 else 0
        k = (r.event_type, age // 7)
        n, nk = agg.get(k, (0, 0))
        agg[k] = (n + 1, nk + kept)
    exp = {
        k: (n, nk, nk * 1000 // n) for k, (n, nk) in agg.items()
    }
    got = {
        (r.event_type, r.week): (r.n_events, r.n_kept, r.kept_milli)
        for r in QUERIES["sample_time_decay"].fn(spark, sf_dir).collect()
    }
    assert got == exp
    # week-0 events keep at near-full rate, old weeks decay
    wk = sorted({k[1] for k in got})
    assert max(v[1] for k, v in got.items() if k[1] == wk[0]) > 0


def _rake_doc_nominate(text: str, pat, topk: int):
    """Guarded RAKE per-doc pass (plans/datapipe._RAKE_DOC_TOPK): split
    into candidate phrases, score with DOC-LOCAL degree/freq stats,
    return the top-k (score DESC, phrase) phrases with per-doc counts."""
    cnt: dict = {}
    for seg in pat.sub("|", text).split("|"):
        seg = seg.strip()
        if seg:
            cnt[seg] = cnt.get(seg, 0) + 1
    freq: dict = {}
    deg: dict = {}
    for ph, n in cnt.items():
        ws = ph.split(" ")
        for w in ws:
            freq[w] = freq.get(w, 0) + n
            deg[w] = deg.get(w, 0) + len(ws) * n
    scored = sorted(
        (-sum(deg[w] * 1000 // freq[w] for w in ph.split(" ")), ph, n)
        for ph, n in cnt.items()
    )
    return [(ph, n) for _, ph, n in scored[:topk]], len(cnt)


def test_rake_keywords_matches_python_replay(spark, sf_dir):
    """Full GUARDED RAKE replay: per-doc top-k nomination by doc-local
    degree/freq score, then corpus degree/freq stats over the nominated
    (phrase, count) pairs only. Also asserts the guard's invariants:
    each doc nominates ≤ k phrases, and nomination is the identity for
    docs with ≤ k candidates."""
    import re

    from mapreducenonequijoin_spark.functions.text import STOPWORDS
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.datapipe import _RAKE_DOC_TOPK
    from mapreducenonequijoin_spark.sources.io import load_table

    pat = re.compile(r"\b(" + "|".join(STOPWORDS) + r")\b")
    kept: list = []
    saw_capped = saw_identity = False
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        nom, n_cand = _rake_doc_nominate(r.text, pat, _RAKE_DOC_TOPK)
        assert len(nom) <= _RAKE_DOC_TOPK
        if n_cand > _RAKE_DOC_TOPK:
            saw_capped = True
        else:
            assert len(nom) == n_cand  # ≤ k candidates → identity
            saw_identity = True
        kept.extend(nom)
    # the fixture must exercise both sides of the guard
    assert saw_capped and saw_identity
    freq: dict = {}
    deg: dict = {}
    for ph, n in kept:
        ws = ph.split(" ")
        for w in ws:
            freq[w] = freq.get(w, 0) + n
            deg[w] = deg.get(w, 0) + len(ws) * n
    pc: dict = {}
    for ph, n in kept:
        pc[ph] = pc.get(ph, 0) + n
    scored = [
        (ph, n, sum(deg[w] * 1000 // freq[w] for w in ph.split(" ")))
        for ph, n in pc.items()
    ]
    exp = sorted(scored, key=lambda t: (-t[2], t[0]))[:25]
    got = [
        (r.phrase, r.n_occur, r.score_milli)
        for r in QUERIES["text_rake_keywords"].fn(spark, sf_dir).collect()
    ]
    assert got == exp


def test_corpus_curate_fuses_scan_and_exchanges(spark, sf_dir):
    """VERDICT r10 item 8: the composed curation plan reads the corpus
    ONCE and runs two exchanges (dedup groupBy(text) + final tiny
    groupBy(source)); the standalone chain it fuses scans the corpus
    once per stage."""
    import re

    from mapreducenonequijoin_spark.plans import QUERIES

    def plan_of(name):
        return (
            QUERIES[name].fn(spark, str(sf_dir))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    plan = plan_of("pipeline_corpus_curate")
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert len(re.findall(r"Exchange (?!SinglePartition)", plan)) == 2
    part_scans = sum(
        len(re.findall(r"Scan parquet", plan_of(n)))
        for n in ("dedup_exact", "text_quality", "sample_stratified")
    )
    assert part_scans >= 3


def test_corpus_curate_stage_semantics_replay(spark, sf_dir):
    """Python replay of dedup -> gate -> mix -> accounting, proving the
    fused plan's stages against the standalone semantics."""
    import hashlib

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.datapipe import (
        _MIX_DEFAULT,
        _MIX_RATES,
        _rate_hex,
    )
    from mapreducenonequijoin_spark.functions.text import STOPWORDS
    from mapreducenonequijoin_spark.sources.io import load_table

    docs = load_table(spark, str(sf_dir), "documents").select(
        "doc_id", "source", "text"
    ).collect()
    by_text: dict = {}
    for r in docs:
        cur = by_text.get(r.text)
        if cur is None or r.doc_id < cur[0]:
            by_text[r.text] = (r.doc_id, r.source, (cur[2] + 1) if cur else 1)
        else:
            by_text[r.text] = (cur[0], cur[1], cur[2] + 1)
    stop = set(STOPWORDS)
    acc: dict = {}
    for text, (doc_id, source, n_copies) in by_text.items():
        ws = text.split(" ")
        n_words, n_stop = len(ws), sum(1 for w in ws if w in stop)
        if n_words < 5 or n_stop * 50 < n_words:
            continue
        key = hashlib.md5(f"smp{doc_id}".encode()).hexdigest()[:8]
        if key >= _rate_hex(_MIX_RATES.get(source, _MIX_DEFAULT)):
            continue
        d, w, c = acc.get(source, (0, 0, 0))
        acc[source] = (d + 1, w + n_words, c + n_copies - 1)
    got = {
        r.source: (r.docs_kept, r.words_kept, r.dup_copies_removed)
        for r in QUERIES["pipeline_corpus_curate"].fn(spark, str(sf_dir)).collect()
    }
    assert got == acc
