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
         "m=8 ksub=16 ADC shortlist max(100, 10% batch) + exact re-rank")
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
         "8 cells / 4 probes, residual PQ m=8 ksub=16, re-rank 50% of cell")
    )

    # --- dedup_semdedup: cluster-scoped coverage vs global truth -----
    # (r14: coverage is deliberately NOT a driver gate — on the
    # fixture's i.i.d.-random embeddings tau=0.4 pairs are weakly
    # cell-correlated, the IVF-caveat worst case; production semantic
    # dups (cos>=0.9) share their nearest cell almost surely. This row
    # keeps the honest number on record.)
    from mapreducenonequijoin_spark.operators.dedup import (
        blocked_self_pairs,
    )
    from mapreducenonequijoin_spark.operators.ivf import (
        assign_clusters,
        kmeans_lite,
    )

    cents_sd = kmeans_lite(
        emb, "vec_id", "embedding", k=max(8, emb.count() // 250)
    )
    clustered_sd = assign_clusters(
        emb, "vec_id", "embedding", cents_sd
    ).select("vec_id", "embedding", "cluster")
    dot_sd = F.aggregate(
        F.zip_with(
            F.col("a_embedding").cast("array<double>"),
            F.col("b_embedding").cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    found_sd = {
        (r.a_vec_id, r.b_vec_id)
        for r in blocked_self_pairs(clustered_sd, "vec_id", ["cluster"])
        .withColumn("cosine", dot_sd)
        .filter(F.col("cosine") >= 0.4)
        .collect()
    }
    cov = len(found_sd & truth_t) / len(truth_t) if truth_t else 1.0
    prec_viol = len(found_sd - truth_t)
    rows.append(
        ("dedup_semdedup", f"{cov:.3f}",
         f"{len(truth_t)} true pairs, {prec_viol} precision viol.",
         "coverage of cluster-scoped search; precision MUST be 1.000 "
         "(iid-random = worst case for coverage, see AUDIT caveat)")
    )

    # --- dedup_simhash: pigeonhole banding vs brute-force Hamming ----
    # (VERDICT r13 item 4: the minhash minwise bug survived the hash
    # oracle because the estimate gate conditions on FOUND pairs; the
    # structural-recall families get the same planted-truth treatment.
    # Truth here is numpy popcount over the SAME Spark fingerprints —
    # independent of the banding that generates candidates.)
    import numpy as np  # noqa: F811 (also imported in the PQ section)

    def popcount64(x: "np.ndarray") -> "np.ndarray":
        x = x.astype(np.uint64)
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)

    def brute_hamming_pairs(ids, fps, budget: int) -> set:
        """All (a_id, b_id) with popcount(xor) <= budget, a_id < b_id,
        chunked so sf0.1-sized inputs stay in memory."""
        order = np.argsort(ids)
        ids, fps = ids[order], fps[order].astype(np.uint64)
        out = set()
        step = 2000
        for s in range(0, len(ids), step):
            xa = fps[s : s + step, None] ^ fps[None, :]
            ham = popcount64(xa)
            ai, bi = np.nonzero(ham <= budget)
            for a, b in zip(ai, bi):
                ia, ib = ids[s + a], ids[b]
                if ia < ib:
                    out.add((int(ia), int(ib)))
        return out

    from mapreducenonequijoin_spark.functions.text import simhash_frame
    from mapreducenonequijoin_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    sim_rows = simhash_frame(docs, "doc_id", "text", 32).collect()
    s_ids = np.array([r[0] for r in sim_rows], dtype=np.int64)
    s_fps = np.array([r[1] for r in sim_rows], dtype=np.int64)
    truth_s = brute_hamming_pairs(s_ids, s_fps, 3)
    got_s = {
        (r.a_id, r.b_id)
        for r in simhash_near_dup_pairs(
            docs, "doc_id", "text", max_hamming=3
        ).collect()
    }
    rec_s = len(got_s & truth_s) / len(truth_s) if truth_s else 1.0
    extra_s = len(got_s - truth_s)
    rows.append(
        ("dedup_simhash", f"{rec_s:.3f}",
         f"{len(truth_s)} true pairs, +{extra_s} spurious",
         "pigeonhole 4x8-bit bands: recall MUST be 1.000 (structural)")
    )

    # --- dedup_phash_hamming: image-hash banding vs brute Hamming ----
    from mapreducenonequijoin_spark.operators.multimodal import (
        ahash_ppm,
        with_ppm_variant_payload,
    )
    from mapreducenonequijoin_spark.plans.llm import dedup_phash_hamming

    pdocs = docs.select(
        "doc_id",
        (F.col("doc_id") % 250).cast("long").alias("seed"),
        (F.col("doc_id") / 250 % 200).cast("long").alias("bright"),
    )
    ph_rows = (
        ahash_ppm(with_ppm_variant_payload(pdocs, "seed", "bright"), "doc_id")
        .select(
            "doc_id",
            (
                F.shiftleft(F.col("phash_hi").cast("long"), 32)
                + F.col("phash_lo").cast("long")
            ).alias("ph"),
        )
        .collect()
    )
    p_ids = np.array([r[0] for r in ph_rows], dtype=np.int64)
    p_fps = np.array([r[1] for r in ph_rows], dtype=np.int64)
    truth_ph = brute_hamming_pairs(p_ids, p_fps, 3)
    got_ph = {
        (r.a_id, r.b_id) for r in dedup_phash_hamming(spark, sf).collect()
    }
    rec_ph = len(got_ph & truth_ph) / len(truth_ph) if truth_ph else 1.0
    rows.append(
        ("dedup_phash_hamming", f"{rec_ph:.3f}",
         f"{len(truth_ph)} true pairs, +{len(got_ph - truth_ph)} spurious",
         "pigeonhole 4x16-bit bands over 64-bit aHash: recall MUST be 1.000")
    )

    # --- dedup_bloom_prescreen: zero-FN + measured fp vs analytic ----
    from mapreducenonequijoin_spark.plans.llm import _BLOOM_K, _BLOOM_M

    digest = F.xxhash64("text")
    # PLANTED truth: the fixture's delta split contains no exact dups
    # of the base (near-dups only), which would make the no-FN claim
    # vacuous — so plant 97 true dups (copies of base texts under
    # fresh doc_ids) into the delta before screening.
    plant = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .filter(F.col("doc_id") % 97 == 1)
        .select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
        )
    )
    delta_docs = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
        .unionByName(plant)
    )
    delta_b = delta_docs.select("doc_id", digest.alias("dg"), "text")
    base_b = docs.filter(F.col("doc_id") % 10 != 0).select(digest.alias("dg"))

    def positions(df):
        return df.select(
            *df.columns,
            F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("i"),
        ).withColumn(
            "pos", F.pmod(F.xxhash64("dg", "i"), F.lit(_BLOOM_M)).cast("long")
        )

    base_pos = positions(base_b).select("i", "pos").distinct()
    passed_ids = {
        r.doc_id
        for r in positions(delta_b)
        .join(base_pos, ["i", "pos"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") == _BLOOM_K)
        .collect()
    }
    base_texts = (
        docs.filter(F.col("doc_id") % 10 != 0).select("text").distinct()
    )
    true_ids = {
        r.doc_id
        for r in delta_docs.join(base_texts, "text", "left_semi")
        .select("doc_id")
        .collect()
    }
    all_delta = {r.doc_id for r in delta_docs.select("doc_id").collect()}
    fn = len(true_ids - passed_ids)
    negatives = all_delta - true_ids
    fp = len((passed_ids - true_ids) & negatives)
    fp_rate = fp / len(negatives) if negatives else 0.0
    import math

    n_base = base_b.distinct().count()
    analytic = (1 - math.exp(-_BLOOM_K * n_base / _BLOOM_M)) ** _BLOOM_K
    rec_b = 1.0 - (fn / len(true_ids) if true_ids else 0.0)
    rows.append(
        ("dedup_bloom_prescreen", f"{rec_b:.3f}",
         f"{len(true_ids)} planted true dups, FN={fn}",
         f"fp {fp_rate:.5f} vs analytic {(analytic):.5f} "
         f"(k={_BLOOM_K}, m=2^21, n={n_base}); FN MUST be 0 (structural)")
    )

    print(f"\nsf_dir={sf}")
    print(f"{'operator':<22} {'recall':<8} {'basis':<26} note")
    for r in rows:
        print(f"{r[0]:<22} {r[1]:<8} {r[2]:<26} {r[3]}")


if __name__ == "__main__":
    main()
