"""Blocked numpy kernels must reproduce the DataFrame brute-force
plans exactly — including bit-identical cosines (the _fold_matmul
order-preservation property)."""

from __future__ import annotations

from mapreducenonequijoin_spark.operators.similarity import (
    knn_cosine_blocked,
    knn_cosine_brute,
    threshold_similarity_blocked,
    threshold_similarity_join,
)
from mapreducenonequijoin_spark.sources.io import load_table


def test_knn_blocked_equals_brute(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.q_id, r.rank): (r.n_id, r.cosine)
        for r in knn_cosine_blocked(emb, "vec_id", "embedding", k=5).collect()
    }
    want = {
        (r.q_id, r.rank): (r.n_id, r.cosine)
        for r in knn_cosine_brute(emb, "vec_id", "embedding", k=5).collect()
    }
    assert got == want  # exact equality incl. float bits


def test_threshold_blocked_equals_1bucket(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.a_id, r.b_id): r.cosine
        for r in threshold_similarity_blocked(
            emb, "vec_id", "embedding", 0.3
        ).collect()
    }
    want = {
        (r.a_id, r.b_id): r.cosine
        for r in threshold_similarity_join(emb, "vec_id", "embedding", 0.3).collect()
    }
    assert got == want and len(want) > 0
