"""Round-14 operator replays: compaction, SemDeDup, OOF target
encoding — each checked against an independent Python/numpy recompute
(SURVEY.md §5's replay rule), not against the plan's own arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducenonequijoin_spark.sources.io import load_table


def test_warehouse_compaction_gates_and_file_accounting(spark, sf_dir):
    """All four gate booleans must be TRUE, and the underlying file
    accounting must hold when recomputed from the manifests directly:
    v2 has strictly fewer files than v1, shares v0's base file by
    path, and the packed files' envelopes are disjoint and cover the
    insert key range only."""
    from mapreducenonequijoin_spark.plans.warehouse import (
        _vt_dir,
        warehouse_compaction,
    )
    from mapreducenonequijoin_spark.operators.table_format import (
        manifest_entries,
    )

    row = warehouse_compaction(spark, sf_dir).collect()[0]
    assert row.files_reduced and row.content_identical
    assert row.base_file_shared and row.envelopes_disjoint

    d = _vt_dir(sf_dir).replace("versioned_orders", "compaction_orders")
    v1, v2 = manifest_entries(d, 1), manifest_entries(d, 2)
    assert len(v2) < len(v1)
    base = {e["path"] for e in manifest_entries(d, 0)}
    assert base <= {e["path"] for e in v2}
    packed = sorted(
        (e for e in v2 if e["path"] not in base), key=lambda e: e["min"]
    )
    assert all(e["min"] > 600_000_000 for e in packed)  # inserts only
    assert all(
        packed[i]["max"] < packed[i + 1]["min"] for i in range(len(packed) - 1)
    )
    # row counts conserved file-by-file between v1's smalls and v2's bins
    assert sum(e["rows"] for e in v1) == sum(e["rows"] for e in v2)


def test_compaction_noop_when_nothing_small(spark, sf_dir):
    """A table with no fragment tail must compact as a NO-OP: same
    version, no new commit (scheduled-OPTIMIZE idempotence)."""
    import shutil

    from mapreducenonequijoin_spark.operators.table_format import (
        compact,
        create_table,
        current_version,
    )

    d = "/tmp/mrnej_cache/compact_noop_test"
    shutil.rmtree(d, ignore_errors=True)
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("cents")
    )
    create_table(spark, df, d, "k", n_files=2)
    ver, before, after, rewritten = compact(
        spark, d, "k", small_rows=100, target_rows=1000
    )
    assert (ver, rewritten) == (0, 0) and before == after
    assert current_version(d) == 0


def test_semdedup_precision_and_coverage_vs_truth(spark, sf_dir):
    """The gate booleans must be TRUE, and the cluster-scoped pair set
    recomputed here (numpy cosine over the collected embeddings +
    the plan's own cluster assignment) must (a) contain ONLY true
    global pairs and (b) equal the truth restricted to co-located
    pairs — i.e. cluster scoping loses exactly the cross-cluster
    pairs, nothing else."""
    import numpy as np

    from mapreducenonequijoin_spark.operators.ivf import (
        assign_clusters,
        kmeans_lite,
    )
    from mapreducenonequijoin_spark.plans.llm import dedup_semdedup

    row = dedup_semdedup(spark, sf_dir).collect()[0]
    assert row.found_subset_of_true and row.no_dup_pair_survives

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    X = np.array([list(map(float, r[1])) for r in rows])
    S = X @ X.T
    iu, ju = np.triu_indices(len(ids), k=1)
    true_mask = S[iu, ju] >= 0.4
    truth = {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
        for a, b in zip(iu[true_mask], ju[true_mask])
    }
    assert len(truth) == row.n_true_pairs

    k = max(8, emb.count() // 250)  # the plan's adaptive-k rule
    cents = kmeans_lite(emb, "vec_id", "embedding", k=k)
    cl = {
        r.vec_id: r.cluster
        for r in assign_clusters(emb, "vec_id", "embedding", cents)
        .select("vec_id", "cluster")
        .collect()
    }
    co_truth = {(a, b) for a, b in truth if cl[a] == cl[b]}
    # replicate the plan's found set independently
    from mapreducenonequijoin_spark.operators.dedup import blocked_self_pairs

    clustered = assign_clusters(emb, "vec_id", "embedding", cents).select(
        "vec_id", "embedding", "cluster"
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("a_embedding").cast("array<double>"),
            F.col("b_embedding").cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    found = {
        (r.a_vec_id, r.b_vec_id)
        for r in blocked_self_pairs(clustered, "vec_id", ["cluster"])
        .withColumn("cosine", dot)
        .filter(F.col("cosine") >= 0.4)
        .collect()
    }
    assert found <= truth  # precision 1.0
    # numpy fold vs JVM fold can flip exact-boundary pairs; none sit
    # on the boundary in the fixtures, so the sets must agree exactly
    assert found == co_truth


def test_target_encode_oof_matches_pandas_recompute(spark, sf_dir):
    """OOF encodings must equal a pandas groupby recompute with the
    same cleared-division arithmetic, and must differ from the in-fold
    (leaky) encoding wherever a fold's own rows move the mean."""
    import math

    rows = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_nationkey").alias("nation"),
            (F.col("o_orderkey") % 5).alias("fold"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    from collections import defaultdict

    n_nf, s_nf = defaultdict(int), defaultdict(int)
    for r in rows:
        n_nf[(r.nation, r.fold)] += 1
        s_nf[(r.nation, r.fold)] += r.cents
    n_n = defaultdict(int)
    s_n = defaultdict(int)
    n_f = defaultdict(int)
    s_f = defaultdict(int)
    for (nat, f), n in n_nf.items():
        n_n[nat] += n
        s_n[nat] += s_nf[(nat, f)]
        n_f[f] += n
        s_f[f] += s_nf[(nat, f)]
    big_n, total_c = sum(n_f.values()), sum(s_f.values())
    m = 10.0
    want = {}
    for (nat, f) in n_nf:
        noof = n_n[nat] - n_nf[(nat, f)]
        soof = s_n[nat] - s_nf[(nat, f)]
        gn, gc = big_n - n_f[f], total_c - s_f[f]
        enc = (float(soof) * float(gn) + m * float(gc)) / (
            float(gn) * (float(noof) + m)
        )
        want[(nat, f)] = (noof, math.trunc(enc * 1000.0))

    from mapreducenonequijoin_spark.plans.warehouse import (
        feature_target_encode_oof,
    )

    got = {
        (r.nation, r.fold): (r.n_oof, r.enc_oof_millicents)
        for r in feature_target_encode_oof(spark, sf_dir).collect()
    }
    assert got == want
    # leakage check: OOF must differ from the in-fold encoding for
    # most cells (identical everywhere would mean the fold exclusion
    # is not happening)
    leaky = {}
    for (nat, f) in n_nf:
        enc = (float(s_n[nat]) * float(big_n) + m * float(total_c)) / (
            float(big_n) * (float(n_n[nat]) + m)
        )
        leaky[(nat, f)] = math.trunc(enc * 1000.0)
    n_diff = sum(
        1 for k in want if want[k][1] != leaky[k]
    )
    assert n_diff > len(want) // 2
