"""Measured recall for every approximate operator (VERDICT r5 item 7).

Compares each approximate/probabilistic operator against its exact
brute-force twin at a given sf_dir and prints one table row per
operator: measured recall, candidate margin, and the analytic claim
it replaces. Paste the table into AUDIT.md's round recall section.

Usage: python tools/recall_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mapreducenonequijoin_spark.session import get_spark  # noqa: E402
from mapreducenonequijoin_spark.sources.io import load_table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("recall-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []

    # --- dedup_near_minhash: LSH pairs vs exact-Jaccard pairs --------
    from mapreducenonequijoin_spark.operators.dedup import (
        minhash_incremental_pairs,
        minhash_near_dup_pairs,
    )
    from mapreducenonequijoin_spark.plans.llm import _MINHASH_ORACLE  # noqa: F401

    docs = load_table(spark, sf, "documents")
    got = {
        (r.a_id, r.b_id)
        for r in minhash_near_dup_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    # exact truth via the ngram-jaccard exact path (prefix-filter, no LSH)
    from mapreducenonequijoin_spark.plans.llm import dedup_ngram_jaccard

    truth_rows = dedup_ngram_jaccard(spark, sf).collect()
    truth = {(r.a_id, r.b_id) for r in truth_rows}
    jmin = min((r.jaccard for r in truth_rows), default=float("nan"))
    rec = len(got & truth) / len(truth) if truth else 1.0
    rows.append(
        ("dedup_near_minhash", f"{rec:.3f}", f"{len(truth)} true pairs",
         f"min true J={jmin:.3f}; analytic miss P<=1-0.99 near J=0.5 knee")
    )

    # --- dedup_incremental: asymmetric LSH vs brute delta x base -----
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    base = docs.filter(F.col("doc_id") % 10 != 0)
    got_i = {
        (r.delta_id, r.base_id)
        for r in minhash_incremental_pairs(
            base, delta, "doc_id", "text", threshold=0.5
        ).collect()
    }
    import duckdb

    from mapreducenonequijoin_spark.plans.llm import _INCREMENTAL_ORACLE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    truth_i_rows = con.execute(_INCREMENTAL_ORACLE).fetchall()
    truth_i = {(r[0], r[1]) for r in truth_i_rows}
    jmin_i = min((r[2] for r in truth_i_rows), default=float("nan"))
    rec_i = len(got_i & truth_i) / len(truth_i) if truth_i else 1.0
    rows.append(
        ("dedup_incremental", f"{rec_i:.3f}", f"{len(truth_i)} true pairs",
         f"min true J={jmin_i:.3f}; LSH P(candidate)~0.99 at J=0.5")
    )

    # --- sim_lsh_hyperplane vs exact threshold join (tau=0.4) --------
    from mapreducenonequijoin_spark.operators.similarity import (
        hyperplane_lsh_pairs,
        knn_query_table,
        threshold_similarity_blocked,
    )

    emb = load_table(spark, sf, "embeddings")
    truth_t = {
        (r.a_id, r.b_id)
        for r in threshold_similarity_blocked(
            emb, "vec_id", "embedding", 0.4
        ).collect()
    }
    got_h = {
        (r.a_id, r.b_id)
        for r in hyperplane_lsh_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    rec_h = len(got_h & truth_t) / len(truth_t) if truth_t else 1.0
    rows.append(
        ("sim_lsh_hyperplane", f"{rec_h:.3f}", f"{len(truth_t)} true pairs",
         "banded random-hyperplane signatures")
    )

    # --- sim_ivf_search (self kNN) vs exact blocked kNN --------------
    from mapreducenonequijoin_spark.operators.ivf import ivf_self_search
    from mapreducenonequijoin_spark.operators.similarity import (
        knn_cosine_blocked,
    )

    truth_k = {
        (r.q_id, r.n_id)
        for r in knn_cosine_blocked(emb, "vec_id", "embedding", k=5).collect()
    }
    got_k = {
        (r.q_id, r.n_id)
        for r in ivf_self_search(emb, "vec_id", "embedding", 5).collect()
    }
    rec_k = len(got_k & truth_k) / len(truth_k) if truth_k else 1.0
    rows.append(
        ("sim_ivf_search", f"{rec_k:.3f}", f"recall@5, {len(truth_k)} truths",
         "8 cells, 6 probes (registry defaults)")
    )

    # --- knn_query_table IVF fallback vs exact serving path ----------
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    truth_q = {
        (r.q_id, r.n_id)
        for r in knn_query_table(
            corpus, queries, "vec_id", "embedding", k=5
        ).collect()
    }
    got_q = {
        (r.q_id, r.n_id)
        for r in knn_query_table(
            corpus, queries, "vec_id", "embedding", k=5, max_queries=10
        ).collect()
    }
    rec_q = len(got_q & truth_q) / len(truth_q) if truth_q else 1.0
    rows.append(
        ("knn_query_table>gate", f"{rec_q:.3f}",
         f"recall@5, {len(truth_q)} truths", "IVF 32 cells, 20 probes")
    )

    # --- sim_pq_search (ADC + exact re-rank) vs exact L2 top-5 -------
    import numpy as np

    from mapreducenonequijoin_spark.operators.pq import pq_search

    q_ids = list(range(8))
    got_p = {
        (r.q_id, r.n_id)
        for r in pq_search(
            emb, "vec_id", "embedding", query_ids=q_ids, k_neighbors=5
        ).collect()
    }
    erows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in erows])
    X = np.array([list(map(float, r[1])) for r in erows])
    truth_p = set()
    for q in q_ids:
        d = ((X - X[ids == q][0]) ** 2).sum(1)
        d[ids == q] = np.inf
        for i in np.lexsort((ids, d))[:5]:
            truth_p.add((q, int(ids[i])))
    rec_p = len(got_p & truth_p) / len(truth_p) if truth_p else 1.0
    rows.append(
        ("sim_pq_search", f"{rec_p:.3f}", f"recall@5, {len(truth_p)} truths",
         "m=8 ksub=16 ADC shortlist 100 + exact re-rank")
    )

    # --- sim_ivfpq_search (coarse cells + residual PQ + re-rank) -----
    from mapreducenonequijoin_spark.operators.pq import ivfpq_search

    got_ip = {
        (r.q_id, r.n_id)
        for r in ivfpq_search(
            emb, "vec_id", "embedding", query_ids=q_ids, k_neighbors=5
        ).collect()
    }
    rec_ip = len(got_ip & truth_p) / len(truth_p) if truth_p else 1.0
    rows.append(
        ("sim_ivfpq_search", f"{rec_ip:.3f}", f"recall@5, {len(truth_p)} truths",
         "8 cells / 4 probes, residual PQ m=8 ksub=16, exact re-rank")
    )

    print(f"\nsf_dir={sf}")
    print(f"{'operator':<22} {'recall':<8} {'basis':<26} note")
    for r in rows:
        print(f"{r[0]:<22} {r[1]:<8} {r[2]:<26} {r[3]}")


if __name__ == "__main__":
    main()
