"""Reference recomputes for the eval-metric plans: AUC, confusion,
NDCG@k, RRF fusion — each checked against a brute-force Python
recompute at smoke scale, independent of the DuckDB oracle."""

from __future__ import annotations

import math


def _scored_rows(spark, sf_dir):
    from mapreducenonequijoin_spark.plans.evalmetrics import _POS_LABEL, _scored

    return [
        (r.score, r.label == _POS_LABEL)
        for r in _scored(spark, sf_dir).collect()
    ]


def test_auc_matches_pairwise_bruteforce(spark, sf_dir):
    """Rank-sum AUC must equal the O(n²) pairwise definition
    (P[score_pos > score_neg] + ½·P[tie]) exactly."""
    from mapreducenonequijoin_spark.plans.evalmetrics import eval_auc_rank_sum

    rows = _scored_rows(spark, sf_dir)
    pos = [s for s, p in rows if p]
    neg = [s for s, p in rows if not p]
    wins = sum(1.0 if sp > sn else 0.5 if sp == sn else 0.0 for sp in pos for sn in neg)
    want = round(wins / (len(pos) * len(neg)), 6)
    got = eval_auc_rank_sum(spark, sf_dir).collect()[0]
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    assert got.auc == want
    assert 0.0 <= got.auc <= 1.0


def test_confusion_metrics_recompute(spark, sf_dir):
    from mapreducenonequijoin_spark.plans.evalmetrics import eval_confusion_metrics

    rows = _scored_rows(spark, sf_dir)
    tp = sum(1 for s, p in rows if s >= 0.5 and p)
    fp = sum(1 for s, p in rows if s >= 0.5 and not p)
    fn = sum(1 for s, p in rows if s < 0.5 and p)
    tn = sum(1 for s, p in rows if s < 0.5 and not p)
    r = eval_confusion_metrics(spark, sf_dir).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    assert r.precision == round(tp / (tp + fp), 6)
    assert r.recall == round(tp / (tp + fn), 6)
    assert r.f1 == round(2 * tp / (2 * tp + fp + fn), 6)
    assert r.accuracy == round((tp + tn) / len(rows), 6)


def test_ndcg_reference_recompute(spark, sf_dir):
    """NDCG@10 per query must match a Python recompute from the k-NN
    output, the label table, and the embedded integer discounts."""
    from mapreducenonequijoin_spark.operators.similarity import knn_cosine
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _DISC_INT,
        _DISC_PREFIX,
        _NDCG_K,
        eval_ndcg_at_k,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    cls = {}
    for lab in labels.values():
        cls[lab] = cls.get(lab, 0) + 1
    want = {}
    topk = knn_cosine(emb, "vec_id", "embedding", k=_NDCG_K).collect()
    per_q: dict = {}
    for r in topk:
        per_q.setdefault(r.q_id, []).append((r.rank, labels[r.n_id]))
    for q, hits in per_q.items():
        dcg = sum(_DISC_INT[rank - 1] for rank, nl in hits if nl == labels[q])
        n_rel = sum(1 for _, nl in hits if nl == labels[q])
        idcg = _DISC_PREFIX[min(_NDCG_K, cls[labels[q]] - 1) - 1]
        want[q] = (n_rel, round(dcg / idcg, 6))
    got = {r.q_id: (r.n_rel_topk, r.ndcg) for r in eval_ndcg_at_k(spark, sf_dir).collect()}
    assert got == want
    assert all(0.0 <= v <= 1.0 for _, v in got.values())
    # discounts really are 1/log2(i+1) in micro-units
    assert _DISC_INT[0] == 1_000_000 and _DISC_INT[2] == round(1e6 / math.log2(4))


def test_rrf_fusion_contract(spark, sf_dir):
    """Fused list: scores follow the RRF formula from the member
    ranks, ranks are dense/sorted, and both single- and dual-arm hits
    are representable."""
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _RRF_K,
        _RRF_TOPK,
        retrieval_rrf_fusion,
    )

    rows = sorted(retrieval_rrf_fusion(spark, sf_dir).collect(), key=lambda r: r.fused_rank)
    assert [r.fused_rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= _RRF_TOPK
    prev = None
    for r in rows:
        want = round(
            (1.0 / (_RRF_K + r.lex_rank) if r.lex_rank is not None else 0.0)
            + (1.0 / (_RRF_K + r.vec_rank) if r.vec_rank is not None else 0.0),
            6,
        )
        assert r.rrf == want
        assert r.lex_rank is not None or r.vec_rank is not None
        if prev is not None:
            assert (prev.rrf, -prev.doc_id) >= (r.rrf, -r.doc_id)
        prev = r


def test_calibration_bins_recompute(spark, sf_dir):
    """Bin counts, positive fractions, and mean predictions must match
    a Python recompute at the sharpened temperature; bins partition
    the scored set."""
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _CAL_BINS,
        _CAL_SCALE,
        _POS_LABEL,
        _scored,
        eval_calibration_bins,
    )

    rows = [
        (r.score, r.label == _POS_LABEL)
        for r in _scored(spark, sf_dir, _CAL_SCALE).collect()
    ]
    want: dict = {}
    for s, p in rows:
        b = min(int(s * _CAL_BINS), _CAL_BINS - 1)
        n, np_, sm = want.get(b, (0, 0, 0))
        want[b] = (n + 1, np_ + (1 if p else 0), sm + round(s * 1_000_000))
    got = eval_calibration_bins(spark, sf_dir).collect()
    assert sum(r.n for r in got) == len(rows)
    for r in got:
        n, np_, sm = want[r.bin]
        assert (r.n, r.n_pos) == (n, np_)
        assert r.frac_pos == round(np_ / n, 6)
        assert r.mean_pred == round(sm / n / 1_000_000, 6)
        assert r.bin / _CAL_BINS - 1e-9 <= r.mean_pred <= (r.bin + 1) / _CAL_BINS + 1e-9


def test_feature_standardize_moments(spark, sf_dir):
    """Standardized output: per-dim z of the emitted sample matches a
    numpy recompute over milli-quantized values; full-population z has
    mean 0 / population std 1 by construction."""
    import numpy as np

    from mapreducenonequijoin_spark.plans.warehouse import feature_standardize
    from mapreducenonequijoin_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    m = {r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1000) for r in emb}
    mat = np.stack([m[k] for k in sorted(m)])
    n = mat.shape[0]
    s = mat.sum(axis=0)
    ssq = (mat * mat).sum(axis=0)
    mean = s / n
    std = np.sqrt((n * ssq - s * s) / (n * n))
    got = feature_standardize(spark, sf_dir).collect()
    assert len(got) == len([k for k in m if k % 20 == 0]) * mat.shape[1]
    for r in got:
        want = round((m[r.vec_id][r.dim] - mean[r.dim]) / std[r.dim], 6)
        assert abs(r.z - want) <= 2e-6, (r, want)


def test_rejection_sample_matches_reference_draw(spark, sf_dir):
    """Per-label acceptance counts must equal the deterministic
    md5-draw recompute; acceptance rate tracks the mean score (the
    reward-proportional property) within binomial noise."""
    import hashlib

    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _CAL_SCALE,
        _scored,
        pipeline_reward_rejection_sample,
    )

    scored = _scored(spark, sf_dir, _CAL_SCALE).collect()
    want = {}
    mean_score = {}
    for r in scored:
        u13 = int(hashlib.md5(f"rej{r.vec_id}".encode()).hexdigest()[:13], 16)
        cut = int(r.score * 4503599627370496)  # floor: score >= 0
        n, acc, ssum = want.get(r.label, (0, 0, 0.0))
        want[r.label] = (n + 1, acc + (1 if u13 < cut else 0), ssum + r.score)
    got = pipeline_reward_rejection_sample(spark, sf_dir).collect()
    assert {r.label for r in got} == set(want)
    for r in got:
        n, acc, ssum = want[r.label]
        assert (r.n, r.n_accepted) == (n, acc)
        assert r.acc_rate == round(acc / n, 6)
        # reward-proportional: E[acc_rate] = mean score; 4 sigma bound
        p = ssum / n
        sigma = (p * (1 - p) / n) ** 0.5
        assert abs(r.acc_rate - p) <= 4 * sigma + 1e-9


def test_brier_score_recompute_and_bounds(spark, sf_dir):
    """Brier must equal the exact integer recompute; bounded [0,1];
    better than the constant-0.5 predictor's 0.25 iff informative."""
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _CAL_SCALE,
        _POS_LABEL,
        _scored,
        eval_brier_score,
    )

    rows = [
        (round(r.score * 1_000_000), 1_000_000 if r.label == _POS_LABEL else 0)
        for r in _scored(spark, sf_dir, _CAL_SCALE).collect()
    ]
    sq = sum((p - y) ** 2 for p, y in rows)
    r = eval_brier_score(spark, sf_dir).collect()[0]
    assert (r.n, r.sq_sum_micro2) == (len(rows), sq)
    assert r.brier == round(sq / len(rows) / 1_000_000_000_000, 6)
    assert 0.0 <= r.brier <= 1.0


def test_mrr_recall_reference(spark, sf_dir):
    """MRR and recall@k must match the Python recompute from the knn
    output and labels; MRR <= recall (1/rank <= 1 per hit)."""
    from mapreducenonequijoin_spark.operators.similarity import knn_cosine
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _NDCG_K,
        _RR_INT,
        eval_mrr_recall_at_k,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    first_rel = {}
    for r in knn_cosine(emb, "vec_id", "embedding", k=_NDCG_K).collect():
        if labels[r.n_id] == labels[r.q_id]:
            first_rel[r.q_id] = min(first_rel.get(r.q_id, r.rank), r.rank)
    n = len(labels)
    hits = len(first_rel)
    mrr_num = sum(_RR_INT[r - 1] for r in first_rel.values())
    got = eval_mrr_recall_at_k(spark, sf_dir).collect()[0]
    assert (got.n_queries, got.n_hit) == (n, hits)
    assert got.recall_at_k == round(hits / n, 6)
    assert got.mrr == round(mrr_num / n / 1_000_000, 6)
    assert got.mrr <= got.recall_at_k + 1e-9


def test_pass_at_k_matches_math_comb(spark, sf_dir):
    """Recompute pass@k per task with math.comb from the raw first-20
    attempt window — the textbook C(n-c,k)/C(n,k) form the product
    form must equal exactly."""
    import math

    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _PASS_AT_K_N,
        _PASS_AT_KS,
        eval_pass_at_k,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        per.setdefault(r.user_id, []).append(r.event_type == "purchase")
    rows = {r.task_id: r for r in eval_pass_at_k(spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for task, attempts in per.items():
        att = attempts[:_PASS_AT_K_N]
        n, c = len(att), sum(att)
        r = rows[task]
        assert (r.n, r.c) == (n, c), task
        for k in _PASS_AT_KS:
            got = getattr(r, f"pass_at_{k}")
            if n < k:
                assert got is None, (task, k)
            else:
                want = round(1.0 - math.comb(n - c, k) / math.comb(n, k), 6) \
                    if n - c >= k else 1.0
                assert got == want, (task, k, got, want)


def test_kendall_tau_python_recompute(spark, sf_dir):
    """Brute-force tau-a over the collected common pool must equal the
    emitted statistics exactly."""
    from mapreducenonequijoin_spark.plans.evalmetrics import eval_kendall_tau

    row = eval_kendall_tau(spark, sf_dir).collect()[0]
    assert row.n_common >= 2
    assert row.n_concordant + row.n_discordant == (
        row.n_common * (row.n_common - 1) // 2
    )
    want = round(
        (row.n_concordant - row.n_discordant)
        / (row.n_common * (row.n_common - 1) / 2),
        6,
    )
    assert row.kendall_tau == want
    assert -1.0 <= row.kendall_tau <= 1.0


def test_bradley_terry_mm_recompute(spark, sf_dir):
    """Recompute the two integer-unit MM iterations in plain Python
    from the raw match list; ratings must match exactly and order by
    win strength against the faced opposition."""
    from collections import Counter, defaultdict

    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _BT_SCALE,
        eval_elo_bradley_terry,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect()
    per = defaultdict(list)
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        per[r.user_id].append((r.event_type, int(round(r.value * 100))))
    n = Counter()
    wins = Counter()
    for seq in per.values():
        for (pt, pc), (ct, cc) in zip(seq, seq[1:]):
            if pt == ct:
                continue
            n[(min(pt, ct), max(pt, ct))] += 1
            wins[ct if cc > pc else pt if pc > cc else min(pt, ct)] += 1
    players = sorted({t for pair in n for t in pair})
    rm = {t: 1_000_000 for t in players}
    for _ in range(2):
        new = {}
        for t in players:
            denom = sum(
                cnt * _BT_SCALE // (rm[a] + rm[b])
                for (a, b), cnt in n.items()
                if t in (a, b)
            )
            new[t] = wins[t] * _BT_SCALE // denom
        rm = new
    tot = sum(rm.values())
    got = {r.event_type: r for r in eval_elo_bradley_terry(spark, sf_dir).collect()}
    assert set(got) == set(players)
    for t in players:
        assert got[t].rating_micro == rm[t], t
        assert got[t].n_wins == wins[t], t
        assert got[t].rating == round(rm[t] / tot, 6), t


def test_wilson_ci_brackets_p_hat_and_tightens(spark, sf_dir):
    """Interval contains p_hat, sits inside [0,1], and a scipy-free
    recompute of the closed form matches."""
    import math

    from mapreducenonequijoin_spark.plans.evalmetrics import eval_wilson_ci

    for r in eval_wilson_ci(spark, sf_dir).collect():
        assert 0 <= r.ci_lo <= r.p_hat <= r.ci_hi <= 1
        z, n, p = 1.96, r.n, r.x / r.n
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt((p * (1 - p) + z * z / (4 * n * n)) / n)
        assert abs(r.ci_lo - (center - half) / denom) < 2e-6
        assert abs(r.ci_hi - (center + half) / denom) < 2e-6


def test_token_f1_bounds_and_overlap(spark, sf_dir):
    """F1 ∈ [0,1]; overlap never exceeds either side's token count;
    F1 == 1 would require identical bags (not expected on the random
    fixture but the bound must hold)."""
    from mapreducenonequijoin_spark.plans.evalmetrics import eval_token_f1

    rows = eval_token_f1(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overlap <= min(r.n_pred, r.n_ref), r
        assert 0.0 <= r.f1 <= 1.0, r
        want = round(2 * r.n_overlap / (r.n_pred + r.n_ref), 6)
        assert abs(r.f1 - want) < 1e-12, r


def test_bleu2_bounds_and_recompute(spark, sf_dir):
    """bleu2 ∈ [0,1]; Python recompute of the clipped precisions and
    brevity penalty from raw texts matches every emitted row."""
    import math

    from mapreducenonequijoin_spark.plans.evalmetrics import eval_bleu2
    from mapreducenonequijoin_spark.sources.io import load_table

    docs = {
        d.doc_id: d.text
        for d in load_table(spark, sf_dir, "documents").collect()
    }
    rows = eval_bleu2(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.bleu2 <= 1.0, r
        pw, rw = docs[r.pair_id].split(" "), docs[r.pair_id + 1].split(" ")
        assert (r.c_len, r.r_len) == (len(pw), len(rw))

        def clip(p, q):
            from collections import Counter

            cp, cq = Counter(p), Counter(q)
            return sum(min(c, cq[g]) for g, c in cp.items())

        big = lambda w: [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]  # noqa: E731
        assert r.ov1 == clip(pw, rw), r
        assert r.ov2 == clip(big(pw), big(rw)), r
        p1, p2 = r.ov1 / r.c_len, r.ov2 / (r.c_len - 1)
        bp = 1.0 if r.c_len >= r.r_len else math.exp(1 - r.r_len / r.c_len)
        assert abs(r.bleu2 - round(bp * math.sqrt(p1 * p2), 6)) < 1e-9, r


def test_auc_pr_bounds_and_recompute(spark, sf_dir):
    """AP ∈ (0,1]; exact Python recompute of the tie-block
    lower-step AP from the scored frame, including the 1e-6 integer
    quantization of each block term."""
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _POS_LABEL,
        _scored,
        eval_auc_pr,
    )

    row = eval_auc_pr(spark, sf_dir).collect()[0]
    assert 0.0 < row.ap <= 1.0
    per = {}
    for r in _scored(spark, sf_dir).collect():
        c, p = per.get(r.score, (0, 0))
        per[r.score] = (c + 1, p + (1 if r.label == _POS_LABEL else 0))
    cum_n = cum_p = s_micro = n_pos = 0
    for score in sorted(per, reverse=True):
        c, p = per[score]
        cum_n += c
        cum_p += p
        n_pos += p
        s_micro += (p * cum_p * 1_000_000) // cum_n
    assert row.n_pos == n_pos
    assert abs(row.ap - round(s_micro / (n_pos * 1_000_000), 6)) < 1e-12


def test_spearman_rho_scipy_free_recompute(spark, sf_dir):
    """Per-stratum Spearman must match a pure-Python tie-averaged-rank
    Pearson recompute (doubled-rank trick included), truncated to
    micro-units the same way."""
    import math as _m

    from mapreducenonequijoin_spark.plans.evalmetrics import eval_spearman_rho
    from mapreducenonequijoin_spark.sources.io import load_table
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("x"),
            F.size(F.split("text", " ")).cast("long").alias("y"),
        )
        .collect()
    )
    strata: dict[tuple, list[tuple[int, int]]] = {}
    for r in docs:
        strata.setdefault((r.lang, r.source), []).append((r.x, r.y))

    def doubled_ranks(vals):
        order = sorted(vals)
        first = {}
        cnt = {}
        for i, v in enumerate(order):
            first.setdefault(v, i + 1)
            cnt[v] = cnt.get(v, 0) + 1
        return [2 * first[v] + cnt[v] - 1 for v in vals]

    want = {}
    for k, pts in strata.items():
        if len(pts) < 2:
            continue
        dx = doubled_ranks([p[0] for p in pts])
        dy = doubled_ranks([p[1] for p in pts])
        n = len(pts)
        sx, sy = sum(dx), sum(dy)
        sxy = sum(a * b for a, b in zip(dx, dy))
        sxx = sum(a * a for a in dx)
        syy = sum(b * b for b in dy)
        vx = float(n) * float(sxx) - float(sx) * float(sx)
        vy = float(n) * float(syy) - float(sy) * float(sy)
        if vx <= 0 or vy <= 0:
            continue
        num = float(n) * float(sxy) - float(sx) * float(sy)
        want[k] = int(num / (_m.sqrt(vx) * _m.sqrt(vy)) * 1_000_000.0)

    got = {
        (r.lang, r.source): (r.n, r.rho_micro)
        for r in eval_spearman_rho(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, rho in want.items():
        assert got[k][0] == len(strata[k])
        assert got[k][1] == rho
        # char length and word count correlate positively once the
        # stratum is big enough for rank noise to wash out (tiny
        # smoke-scale strata can legitimately invert)
        if got[k][0] >= 20:
            assert rho > 0


def test_cohens_kappa_recompute_and_range(spark, sf_dir):
    """κ from the four marginal counts must match the closed form and
    sit strictly above chance for the logreg scorer."""
    from mapreducenonequijoin_spark.plans.evalmetrics import eval_cohens_kappa

    rows = _scored_rows(spark, sf_dir)
    n = len(rows)
    a1 = sum(1 for s, _ in rows if s >= 0.5)
    b1 = sum(1 for _, p in rows if p)
    n11 = sum(1 for s, p in rows if s >= 0.5 and p)
    n00 = sum(1 for s, p in rows if s < 0.5 and not p)
    e = a1 * b1 + (n - a1) * (n - b1)
    want = round((n * (n11 + n00) - e) / (n * n - e), 6)
    got = eval_cohens_kappa(spark, sf_dir).collect()[0]
    assert (got.n, got.n11, got.n00, got.a1, got.b1) == (n, n11, n00, a1, b1)
    assert got.kappa == want
    assert -1.0 <= got.kappa <= 1.0


def test_mcnemar_recompute_and_ablation_differs(spark, sf_dir):
    """The ablated arm must actually disagree with the full model
    somewhere (otherwise the test statistic is vacuous), and the
    continuity-corrected χ² must match the b/c closed form."""
    from mapreducenonequijoin_spark.plans.evalmetrics import eval_mcnemar

    got = eval_mcnemar(spark, sf_dir).collect()[0]
    assert got.n > 0
    assert got.b_cnt + got.c_cnt > 0, "ablation produced an identical classifier"
    corr = max(abs(got.b_cnt - got.c_cnt) - 1, 0)
    assert got.mcnemar_chi2 == round(corr * corr / (got.b_cnt + got.c_cnt), 6)
    assert got.mcnemar_chi2 >= 0.0


def test_rouge_recall_bounds_and_bleu_consistency(spark, sf_dir):
    """ROUGE recall ∈ [0,1]; its clipped-overlap counts must be the
    very same ov1/ov2 eval_bleu2 computes (shared integer layer), and
    recall must equal ov/r_len exactly."""
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        eval_bleu2,
        eval_rouge_recall,
    )

    rouge = {r.pair_id: r for r in eval_rouge_recall(spark, sf_dir).collect()}
    bleu = {r.pair_id: r for r in eval_bleu2(spark, sf_dir).collect()}
    assert set(rouge) == set(bleu)
    for pid, r in rouge.items():
        b = bleu[pid]
        assert (r.ov1, r.ov2) == (b.ov1, b.ov2)
        assert r.r_len == b.r_len
        assert r.rouge1_recall == round(r.ov1 / r.r_len, 6)
        assert 0.0 <= r.rouge1_recall <= 1.0
        if r.r_len >= 2:
            assert r.rouge2_recall == round(r.ov2 / (r.r_len - 1), 6)
        assert 0.0 <= r.rouge2_recall <= 1.0


def test_ece_equals_binwise_sum(spark, sf_dir):
    """The ECE scalar must equal the mass-weighted |acc − conf| sum
    over eval_calibration_bins' own bins (shared binning)."""
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        eval_calibration_bins,
        eval_ece,
    )

    bins = eval_calibration_bins(spark, sf_dir).collect()
    got = eval_ece(spark, sf_dir).collect()[0]
    n_total = sum(r.n for r in bins)
    assert got.n_total == n_total
    assert got.n_bins == len(bins)
    # recompute from the integer layer: |1e6*pos - sum_micro| per bin
    # is not directly exposed by the bins query, so recompute from
    # frac_pos/mean_pred would reintroduce rounding; use bounds + a
    # manual integer recompute instead
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _CAL_BINS,
        _CAL_SCALE,
        _POS_LABEL,
        _scored,
    )

    per = {}
    for r in _scored(spark, sf_dir, _CAL_SCALE).collect():
        b = min(int(r.score * _CAL_BINS), _CAL_BINS - 1)
        n, p, s = per.get(b, (0, 0, 0))
        per[b] = (n + 1, p + (1 if r.label == _POS_LABEL else 0), s + round(r.score * 1_000_000))
    gap = sum(abs(p * 1_000_000 - s) for _, p, s in per.values())
    assert got.ece_micro == gap // n_total
    assert 0 <= got.ece_micro <= 1_000_000


def test_fleiss_kappa_matches_python_recompute(spark, sf_dir):
    """kappa/P_o/P_e must match a full Python simulation of the keyed
    md5 rating table, and kappa must sit in [-1, 1] micro-units."""
    import hashlib
    from collections import Counter

    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _FLEISS_AGREE_HEX,
        _FLEISS_C,
        _FLEISS_R,
        eval_fleiss_kappa,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    doc_ids = [r.doc_id for r in load_table(spark, sf_dir, "documents").collect()]
    nij: Counter = Counter()
    for d in doc_ids:
        t = d % _FLEISS_C
        for rr in range(_FLEISS_R):
            h = hashlib.md5(f"fl{d}:{rr}".encode()).hexdigest()
            if h[:8] < _FLEISS_AGREE_HEX:
                cat = t
            elif h[8:16] < "40000000":
                cat = 0
            elif h[8:16] < "80000000":
                cat = 1
            elif h[8:16] < "c0000000":
                cat = 2
            else:
                cat = 3
            nij[(d, cat)] += 1
    s1 = sum(c * (c - 1) for c in nij.values())
    total = sum(nij.values())
    cj: Counter = Counter()
    for (_, cat), c in nij.items():
        cj[cat] += c
    s2 = sum(c * c for c in cj.values())
    d1 = total * (_FLEISS_R - 1)
    d2 = total * total
    got = eval_fleiss_kappa(spark, sf_dir).collect()[0]
    assert got.total == total
    assert got.p_o_micro == s1 * 1_000_000 // d1
    assert got.p_e_micro == s2 * 1_000_000 // d2
    assert got.kappa_micro == int((s1 * d2 - s2 * d1) * 1_000_000 / (d1 * (d2 - s2)))
    assert -1_000_000 <= got.kappa_micro <= 1_000_000
    # 0.7 echo probability must land well above chance agreement
    assert got.kappa_micro > 200_000


def test_psi_terms_nonnegative_and_recompute(spark, sf_dir):
    """Each PSI term must match a Python recompute from the collected
    bin counts, be non-negative, and cover all bins."""
    import math

    from mapreducenonequijoin_spark.plans.evalmetrics import _PSI_BINS, eval_psi

    rows = eval_psi(spark, sf_dir).collect()
    assert sorted(r.bin for r in rows) == list(range(_PSI_BINS))
    t_ref = sum(r.n_ref for r in rows)
    t_cur = sum(r.n_cur for r in rows)
    assert t_ref > 0 and t_cur > 0
    for r in rows:
        p = (r.n_ref + 1) / (t_ref + _PSI_BINS)
        q = (r.n_cur + 1) / (t_cur + _PSI_BINS)
        want = round((p - q) * math.log(p / q) * 1_000_000)
        assert r.term_micro == want
        assert r.term_micro >= 0
    # even/odd halves of the same scored population: PSI must be tiny
    assert sum(r.term_micro for r in rows) < 250_000


def test_welch_ttest_matches_python_recompute(spark, sf_dir):
    """t and df must match the Welch formulas recomputed from the
    collected deci-unit populations."""
    import math

    from mapreducenonequijoin_spark.plans.evalmetrics import eval_welch_ttest
    from mapreducenonequijoin_spark.sources.io import load_table

    pops = {"click": [], "view": []}
    for r in load_table(spark, sf_dir, "events").collect():
        if r.event_type in pops:
            pops[r.event_type].append(math.floor(r.value * 10 + 0.5))
    n1, n2 = len(pops["click"]), len(pops["view"])
    s1, s2 = sum(pops["click"]), sum(pops["view"])
    q1 = sum(v * v for v in pops["click"])
    q2 = sum(v * v for v in pops["view"])
    vn1 = (n1 * q1 - s1 * s1) / (n1 * n1 * (n1 - 1))
    vn2 = (n2 * q2 - s2 * s2) / (n2 * n2 * (n2 - 1))
    diff = s1 / n1 - s2 / n2
    t = diff / math.sqrt(vn1 + vn2)
    df = (vn1 + vn2) ** 2 / (vn1**2 / (n1 - 1) + vn2**2 / (n2 - 1))
    got = eval_welch_ttest(spark, sf_dir).collect()[0]
    assert (got.n1, got.n2) == (n1, n2)
    assert got.t_micro == int(t * 1_000_000)
    assert got.df_milli == int(df * 1_000)
    # df must sit between min(n)-1 and n1+n2-2 (Welch bounds)
    assert (min(n1, n2) - 1) * 1_000 <= got.df_milli <= (n1 + n2 - 2) * 1_000


def test_chi_square_matches_python_recompute(spark, sf_dir):
    """chi2 must equal the per-cell integer-quantized sum and sit near
    the float chi-square (within one micro-unit per cell)."""
    from collections import Counter

    from mapreducenonequijoin_spark.plans.evalmetrics import eval_chi_square
    from mapreducenonequijoin_spark.sources.io import load_table

    o: Counter = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        o[(r.lang, r.source)] += 1
    rr: Counter = Counter()
    cc: Counter = Counter()
    for (lg, src), v in o.items():
        rr[lg] += v
        cc[src] += v
    n = sum(o.values())
    terms = []
    for (lg, src), v in o.items():
        e_milli = 1000 * rr[lg] * cc[src] // n
        if e_milli > 0:
            terms.append((1000 * v - e_milli) ** 2 * 1000 // e_milli)
    got = eval_chi_square(spark, sf_dir).collect()[0]
    assert got.n_cells == len(terms)
    assert got.dof == (len(rr) - 1) * (len(cc) - 1)
    assert got.chi2_micro == sum(terms)
    float_chi2 = sum(
        (v - rr[lg] * cc[src] / n) ** 2 / (rr[lg] * cc[src] / n)
        for (lg, src), v in o.items()
    )
    # e quantized at milli → per-cell drift bounded by ~(o/e) micro
    # per milli of e-error; generous envelope at fixture masses
    assert abs(got.chi2_micro - float_chi2 * 1_000_000) <= 2_000 * len(o)


def test_krippendorff_alpha_matches_python_recompute(spark, sf_dir):
    """Alpha must match a plain-Python coincidence recompute over the
    identical md5-generated ratings; and on shared data alpha should
    land close to Fleiss kappa (full-rating nominal case)."""
    import hashlib
    import math

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _FLEISS_AGREE_HEX,
        _FLEISS_C,
        _FLEISS_R,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    docs = [r.doc_id for r in load_table(spark, sf_dir, "documents").collect()]
    nij: dict = {}
    for d in docs:
        t = d % _FLEISS_C
        for rr in range(_FLEISS_R):
            h = hashlib.md5(f"fl{d}:{rr}".encode()).hexdigest()
            if h[:8] < _FLEISS_AGREE_HEX:
                cat = t
            elif h[8:16] < "40000000":
                cat = 0
            elif h[8:16] < "80000000":
                cat = 1
            elif h[8:16] < "c0000000":
                cat = 2
            else:
                cat = 3
            nij[(d, cat)] = nij.get((d, cat), 0) + 1
    d_o = sum(c * (_FLEISS_R - c) for c in nij.values())
    n = sum(nij.values())
    totals: dict = {}
    for (_, cat), c in nij.items():
        totals[cat] = totals.get(cat, 0) + c
    sq = sum(v * v for v in totals.values())
    den = (_FLEISS_R - 1) * (n * n - sq)
    num = den - d_o * (n - 1)
    got = QUERIES["eval_krippendorff_alpha"].fn(spark, sf_dir).collect()[0]
    assert (got.n_pairable, got.d_o_scaled) == (n, d_o)
    assert got.alpha_micro == math.trunc(num * 1_000_000 / den)
    # sanity: a p=0.7-agreement campaign is solidly mid-range
    assert 200_000 < got.alpha_micro < 900_000


def test_cramers_v_matches_python_recompute(spark, sf_dir):
    """chi2/v2 must match a plain-Python replay of the two-stage
    integer quantization over the (priority, status) grid."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    o: dict = {}
    for r in rows:
        k = (r.o_orderpriority, r.o_orderstatus)
        o[k] = o.get(k, 0) + 1
    rt: dict = {}
    ct: dict = {}
    for (p, s), c in o.items():
        rt[p] = rt.get(p, 0) + c
        ct[s] = ct.get(s, 0) + c
    n = sum(o.values())
    chi2 = 0
    n_cells = 0
    for (p, s), c in o.items():
        e_milli = (1000 * rt[p] * ct[s]) // n
        if e_milli > 0:
            n_cells += 1
            chi2 += (1000 * c - e_milli) ** 2 * 1000 // e_milli
    k = min(len(rt) - 1, len(ct) - 1)
    got = QUERIES["eval_cramers_v"].fn(spark, sf_dir).collect()[0]
    assert got.n_cells == n_cells
    assert got.dof == (len(rt) - 1) * (len(ct) - 1)
    assert got.chi2_micro == chi2
    assert got.v2_micro == chi2 // (n * k)
    # near-independent synthetic grid: V^2 should be tiny
    assert got.v2_micro < 100_000


def test_gain_lift_matches_python_replay(spark, sf_dir):
    """Decile table must match a Python replay of the group-atomic
    decile convention over the engine's own (score, label) frame."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _POS_LABEL,
        _scored,
    )

    sc = [
        (r.score, 1 if r.label == _POS_LABEL else 0)
        for r in _scored(spark, sf_dir).collect()
    ]
    g: dict = {}
    for s, y in sc:
        c, p = g.get(s, (0, 0))
        g[s] = (c + 1, p + y)
    n = sum(c for c, _ in g.values())
    pp = sum(p for _, p in g.values())
    dec: dict = {}
    cum_before = 0
    for s in sorted(g, reverse=True):
        c, p = g[s]
        d = cum_before * 10 // n
        rr, po = dec.get(d, (0, 0))
        dec[d] = (rr + c, po + p)
        cum_before += c
    exp = []
    cr = cp = 0
    for d in sorted(dec):
        rr, po = dec[d]
        cr += rr
        cp += po
        exp.append(
            (d, rr, po, cp, cp * 1_000_000 // pp,
             cp * n * 1_000_000 // (cr * pp))
        )
    got = sorted(
        (r.decile, r.n_rows, r.n_pos, r.cum_pos, r.gain_micro, r.lift_micro)
        for r in QUERIES["eval_gain_lift"].fn(spark, sf_dir).collect()
    )
    assert got == exp
    # last decile captures everything: gain == 1e6 exactly
    assert got[-1][4] == 1_000_000


def test_ks_statistic_matches_python_recompute(spark, sf_dir):
    """D must equal the exact integer sup over the cent grid."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = load_table(spark, sf_dir, "events").filter(
        "event_type in ('click', 'view')"
    ).select("event_type", "value").collect()
    g: dict = {}
    for r in rows:
        cents = int(r.value * 100 + 0.5)  # HALF_UP like both engines
        c1, c2 = g.get(cents, (0, 0))
        g[cents] = (
            c1 + (r.event_type == "click"),
            c2 + (r.event_type == "view"),
        )
    n1 = sum(a for a, _ in g.values())
    n2 = sum(b for _, b in g.values())
    cum1 = cum2 = d = 0
    for k in sorted(g):
        cum1 += g[k][0]
        cum2 += g[k][1]
        d = max(d, abs(cum1 * n2 - cum2 * n1))
    got = QUERIES["eval_ks_statistic"].fn(spark, sf_dir).collect()[0]
    assert (got.n1, got.n2, got.d_scaled) == (n1, n2, d)
    assert got.ks_milli == d * 1000 // (n1 * n2)


def test_bootstrap_ci_matches_python_recompute(spark, sf_dir):
    """Replicate means and order-statistic CI replayed from the md5
    draws; full-sample mean inside the CI on the fixture."""
    import hashlib

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.datapipe import _POIS_CUTS
    from mapreducenonequijoin_spark.plans.evalmetrics import _BOOTCI_B
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    ).collect()

    def pois(u):
        for k, c in enumerate(_POIS_CUTS):
            if u < c:
                return k
        return 6

    means = []
    for d in range(_BOOTCI_B // 4):
        accs = [[0, 0] for _ in range(4)]
        for row in rows:
            cents = int(row.l_extendedprice * 100 + 0.5)
            hexd = hashlib.md5(
                f"bci{d}:{row.l_orderkey}-{row.l_linenumber}".encode()
            ).hexdigest()
            for w in range(4):
                k = pois(int(hexd[8 * w : 8 * w + 8], 16))
                accs[w][0] += k * cents
                accs[w][1] += k
        for skc, sk in accs:
            if sk > 0:
                means.append(skc // sk)
    means.sort()
    total = sum(int(r.l_extendedprice * 100 + 0.5) for r in rows)
    got = QUERIES["eval_bootstrap_ci_mean"].fn(spark, sf_dir).collect()[0]
    assert got.n_replicates == len(means)
    assert got.mean_cents == total // len(rows)
    assert got.ci_lo_cents == means[1]
    assert got.ci_hi_cents == means[len(means) - 2]
    assert got.ci_lo_cents <= got.mean_cents <= got.ci_hi_cents


def test_roc_points_matches_python_replay(spark, sf_dir):
    """ROC operating points replayed from the engine's own scored
    frame with the group-atomic decile convention; monotone and
    consistent with gain_lift's cum_pos."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _POS_LABEL,
        _scored,
    )

    sc = [
        (r.score, 1 if r.label == _POS_LABEL else 0)
        for r in _scored(spark, sf_dir).collect()
    ]
    g: dict = {}
    for s, y in sc:
        c, p = g.get(s, (0, 0))
        g[s] = (c + 1, p + y)
    n = sum(c for c, _ in g.values())
    pp = sum(p for _, p in g.values())
    dec: dict = {}
    cum_before = 0
    for s in sorted(g, reverse=True):
        c, p = g[s]
        d = cum_before * 10 // n
        tp, fp = dec.get(d, (0, 0))
        dec[d] = (tp + p, fp + c - p)
        cum_before += c
    exp = []
    ctp = cfp = 0
    for d in sorted(dec):
        tp, fp = dec[d]
        ctp += tp
        cfp += fp
        exp.append(
            (d, ctp, cfp, ctp * 1_000_000 // pp,
             cfp * 1_000_000 // (n - pp))
        )
    got = sorted(
        (r.decile, r.cum_tp, r.cum_fp, r.tpr_micro, r.fpr_micro)
        for r in QUERIES["eval_roc_points"].fn(spark, sf_dir).collect()
    )
    assert got == exp
    # both rates end at exactly 1e6 and are monotone
    assert got[-1][3] == 1_000_000 and got[-1][4] == 1_000_000
    assert all(a[3] <= b[3] and a[4] <= b[4] for a, b in zip(got, got[1:]))


def test_matthews_corr_recompute(spark, sf_dir):
    """MCC must match the closed form over a Python-recomputed
    confusion matrix, and sit in [-1, 1]."""
    from mapreducenonequijoin_spark.plans.evalmetrics import eval_matthews_corr

    rows = _scored_rows(spark, sf_dir)
    tp = sum(1 for s, p in rows if s >= 0.5 and p)
    fp = sum(1 for s, p in rows if s >= 0.5 and not p)
    fn = sum(1 for s, p in rows if s < 0.5 and p)
    tn = sum(1 for s, p in rows if s < 0.5 and not p)
    want = round(
        (tp * tn - fp * fn)
        / math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)),
        6,
    )
    got = eval_matthews_corr(spark, sf_dir).collect()[0]
    assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, fn, tn)
    assert got.mcc == want
    assert -1.0 <= got.mcc <= 1.0


def test_log_loss_recompute(spark, sf_dir):
    """Per-label loss sums must match a Python recompute of the
    clamped floor-quantized terms, and every term is non-negative."""
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _CAL_SCALE,
        _POS_LABEL,
        _scored,
        eval_log_loss,
    )

    want: dict = {}
    for r in _scored(spark, sf_dir, _CAL_SCALE).collect():
        pm = min(max(round(r.score * 1_000_000), 1), 999_999)
        x = (pm if r.label == _POS_LABEL else 1_000_000 - pm) / 1_000_000
        t = math.floor(-math.log(x) * 1_000_000)
        n, s = want.get(r.label, (0, 0))
        want[r.label] = (n + 1, s + t)
    got = {
        r.label: (r.n, r.loss_sum_micro, r.log_loss)
        for r in eval_log_loss(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for lbl, (n, s) in want.items():
        assert got[lbl][:2] == (n, s)
        assert got[lbl][2] == round(s / n / 1_000_000, 6)
        assert s >= 0


def test_retrieval_eval_pipeline_python_replay(spark, sf_dir):
    """The composed retrieval-eval pipeline (VERDICT r11 item 6) must
    match a full Python replay: exact top-k by fold-order dot product,
    RRF fusion of the exact and IVF arms in integer micro-units, and
    label-relevance hits/MRR — plus the two fused-quality gate booleans
    the oracle can only state as TRUE."""
    import numpy as np

    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.plans.evalmetrics import (
        _PREV_IVF_GATE,
        _PREV_K,
        _PREV_NQ,
        _PREV_RRF_INT,
        _RR_INT,
    )
    from mapreducenonequijoin_spark.operators.similarity import knn_query_table
    from mapreducenonequijoin_spark.sources.io import load_table

    row = QUERIES["pipeline_retrieval_eval"].fn(spark, sf_dir).collect()[0]
    assert row.fused_hits_ge_090 and row.fused_mrr_ge_090

    emb = load_table(spark, sf_dir, "embeddings").collect()
    lbl = {r.vec_id: r.label for r in emb}
    probes = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
              for r in emb if r.vec_id < _PREV_NQ]
    corpus = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
              for r in emb if r.vec_id >= _PREV_NQ]
    assert row.n_queries == len(probes) == _PREV_NQ

    # exact arm replay: left-fold dot products, ties by n_id
    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    exact = {}
    for q_id, q in probes:
        scored = sorted(
            ((-fold_dot(q, c), n_id) for n_id, c in corpus)
        )[:_PREV_K]
        exact[q_id] = [n for _, n in scored]
    ex_hits = sum(
        sum(1 for n in exact[q] if lbl[n] == lbl[q]) for q in exact
    )
    ex_mrr = sum(
        next(
            (_RR_INT[i] for i, n in enumerate(exact[q]) if lbl[n] == lbl[q]),
            0,
        )
        for q in exact
    )
    assert row.exact_hits == ex_hits
    assert row.exact_mrr_micro == ex_mrr

    # fused replay from the engine's own IVF arm (deterministic k-means)
    emb_df = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    ivf = knn_query_table(
        emb_df.filter(F.col("vec_id") >= _PREV_NQ).select("vec_id", "embedding"),
        emb_df.filter(F.col("vec_id") < _PREV_NQ).select("vec_id", "embedding"),
        "vec_id",
        "embedding",
        k=_PREV_K,
        max_queries=_PREV_IVF_GATE,
    ).collect()
    iv_rank = {(r.q_id, r.n_id): r.rank for r in ivf}
    fu_hits = fu_mrr = 0
    for q, ex_list in exact.items():
        cand = {n: _PREV_RRF_INT[i] for i, n in enumerate(ex_list)}
        for (qq, n), rk in iv_rank.items():
            if qq == q:
                cand[n] = cand.get(n, 0) + _PREV_RRF_INT[int(rk) - 1]
        fused = sorted(cand, key=lambda n: (-cand[n], n))[:_PREV_K]
        fu_hits += sum(1 for n in fused if lbl[n] == lbl[q])
        fu_mrr += next(
            (_RR_INT[i] for i, n in enumerate(fused) if lbl[n] == lbl[q]), 0
        )
    assert (fu_hits * 10 >= ex_hits * 9) == row.fused_hits_ge_090
    assert (fu_mrr * 10 >= ex_mrr * 9) == row.fused_mrr_ge_090


def test_retrieval_eval_pipeline_plan_shape(spark, sf_dir):
    """Fusion economics: the composed plan must keep the corpus
    map-side (MapInPandas scoring, no cartesian/BNLJ pair generation
    anywhere) and fuse two <=|Q|*k-row rankings with a constant-size
    join."""
    from mapreducenonequijoin_spark.plans import QUERIES

    plan = (
        QUERIES["pipeline_retrieval_eval"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
