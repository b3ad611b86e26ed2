"""Similarity search over embedding columns (SURVEY.md §2.9).

Fixtures: embeddings.embedding is ArrayType(Float), dim=64,
L2-normalized → cosine ≡ dot product.

- knn_cosine_brute: exact all-pairs top-k. O(n²) dot products but
  fully shuffle-parallel; the correctness baseline and the oracle for
  the approximate paths.
- threshold_similarity_join: all pairs with cos ≥ τ through the
  1-Bucket theta rewrite [OR11 §4] — exact answer, load-balanced
  all-pairs work (this is precisely the workload class the reference
  exists for: a similarity join IS a theta join).
- hyperplane_lsh_pairs: the 100 TB scale path — random-hyperplane
  signatures (Charikar 2002) as the bucketing key, exact-dot residual
  verify. Approximate recall → driver records rows-only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import dot_expr
from .joins import theta_join

__all__ = [
    "knn_cosine_brute",
    "knn_cosine_blocked",
    "threshold_similarity_join",
    "threshold_similarity_blocked",
    "hyperplane_lsh_pairs",
]


def _fold_matmul(a64, b64):
    """All-pairs dot products with LEFT-FOLD accumulation order.

    NOT ``A @ B.T``: BLAS reorders the reduction (blocked/SIMD), which
    perturbs the last ulp and would break bit-parity with the DuckDB
    oracle and with the Spark higher-order-function fold. Accumulating
    one dimension at a time reproduces exactly
    ``acc = (..(0.0 + x0*y0) + x1*y1 ..)`` per pair — the same FP
    operation sequence as both engines — while staying vectorized
    (64 outer-product updates instead of 4M interpreted folds).
    """
    import numpy as np

    m, dim = a64.shape
    s = np.zeros((m, b64.shape[0]), dtype=np.float64)
    for d in range(dim):
        s += np.outer(a64[:, d], b64[:, d])
    return s


def knn_cosine_brute(
    emb: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Exact k nearest neighbours per vector (self, excluding itself).
    Output: (q_id, n_id, cosine, rank), rank 1..k, ties broken by id
    so the result is deterministic across engines."""
    a = emb.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    b = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", dot_expr("q_vec", "n_vec"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def knn_cosine_blocked(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_blocks: int | None = None,
) -> DataFrame:
    """Exact k-NN, Arrow-vectorized: partition the query side into
    blocks, replicate the candidate side to every block (the [OR11]
    replicate-one-side pattern with blocks as regions), and compute
    each block's pair scores in one numpy kernel via applyInPandas.
    Identical results to knn_cosine_brute — including bit-identical
    cosines (see _fold_matmul) — at a fraction of the cost: the fold
    moves from per-pair interpreted expressions to vectorized batch
    math. Candidate-side replication is the scale limit; beyond
    ~10⁵ candidates switch to the LSH/IVF path.
    """
    import pandas as pd

    spark = emb.sparkSession
    nb = num_blocks or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    a = emb.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.pmod(F.col(id_col), F.lit(nb)).cast("int").alias("__blk"),
    )
    b = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("__blk"),
    )
    def topk(adf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if adf.empty or bdf.empty:
            return pd.DataFrame(
                {"q_id": [], "n_id": [], "cosine": [], "rank": []}
            ).astype({"q_id": "int64", "n_id": "int64", "cosine": "float64", "rank": "int64"})
        a64 = np.stack(adf["q_vec"].to_numpy()).astype(np.float64)
        b64 = np.stack(bdf["n_vec"].to_numpy()).astype(np.float64)
        s = _fold_matmul(a64, b64)
        q_ids = adf["q_id"].to_numpy()
        n_ids = bdf["n_id"].to_numpy()
        out_q, out_n, out_c, out_r = [], [], [], []
        for i in range(len(q_ids)):
            row = s[i]
            mask = n_ids != q_ids[i]
            cand_n, cand_c = n_ids[mask], row[mask]
            order = np.lexsort((cand_n, -cand_c))[:k]
            out_q.extend([q_ids[i]] * len(order))
            out_n.extend(cand_n[order])
            out_c.extend(cand_c[order])
            out_r.extend(range(1, len(order) + 1))
        return pd.DataFrame(
            {"q_id": out_q, "n_id": out_n, "cosine": out_c,
             "rank": pd.array(out_r, dtype="int64")}
        )

    return (
        a.groupBy("__blk")
        .cogroup(b.groupBy("__blk"))
        .applyInPandas(topk, schema="q_id long, n_id long, cosine double, rank long")
    )


def threshold_similarity_blocked(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    num_blocks: int | None = None,
) -> DataFrame:
    """Exact threshold self-similarity join with the same blocked
    numpy kernel; each unordered pair is scored once (in the block of
    its lower id) — the [OR11 §4] unique-region property."""
    import pandas as pd

    spark = emb.sparkSession
    nb = num_blocks or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    a = emb.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        F.pmod(F.col(id_col), F.lit(nb)).cast("int").alias("__blk"),
    )
    b = emb.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("__blk"),
    )

    def pairs(adf: pd.DataFrame, bdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if adf.empty or bdf.empty:
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cosine": "float64"}
            )
        a64 = np.stack(adf["a_vec"].to_numpy()).astype(np.float64)
        b64 = np.stack(bdf["b_vec"].to_numpy()).astype(np.float64)
        s = _fold_matmul(a64, b64)
        a_ids = adf["a_id"].to_numpy()[:, None]
        b_ids = bdf["b_id"].to_numpy()[None, :]
        keep = (s >= tau) & (a_ids < b_ids)
        ai, bi = np.nonzero(keep)
        return pd.DataFrame(
            {"a_id": a_ids[ai, 0], "b_id": b_ids[0, bi], "cosine": s[ai, bi]}
        )

    return (
        a.groupBy("__blk")
        .cogroup(b.groupBy("__blk"))
        .applyInPandas(pairs, schema="a_id long, b_id long, cosine double")
    )


def threshold_similarity_join(
    emb: DataFrame, id_col: str, vec_col: str, tau: float
) -> DataFrame:
    """Exact self-similarity join: pairs (a_id < b_id) with cosine ≥ τ,
    executed through the 1-Bucket-Theta region rewrite so the
    quadratic pair space is balanced across the cluster instead of
    landing in one BNLJ partition pair."""
    a = emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    cond = (F.col("a_id") < F.col("b_id")) & (dot_expr("a_vec", "b_vec") >= tau)
    return (
        theta_join(a, b, cond, strategy="1bucket")
        .withColumn("cosine", dot_expr("a_vec", "b_vec"))
        .select("a_id", "b_id", "cosine")
    )


def _hyperplane_signs(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 pseudo-random hyperplanes from md5 bits (no
    RNG state, reproducible across runs/sessions/executors)."""
    planes = []
    for p in range(num_planes):
        signs = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()
            signs.append(1.0 if h[0] & 1 else -1.0)
        planes.append(signs)
    return planes


def hyperplane_lsh_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate threshold similarity join: bucket = the
    ``num_planes``-bit sign signature of the vector against fixed
    random hyperplanes; candidates share the full signature; residual
    exact dot ≥ τ. P(two vectors at angle θ agree on one bit) =
    1 − θ/π, so near-identical vectors almost surely collide while
    the bucket join prunes the O(n²) space. Scale path: replication
    ×1, one shuffle on an 8-bit key + AQE skew split."""
    planes = _hyperplane_signs(num_planes, dim)

    def signature(vec: str):
        sig = F.lit(0)
        for p, signs in enumerate(planes):
            proj = F.aggregate(
                F.zip_with(
                    F.col(vec),
                    F.array(*[F.lit(s) for s in signs]),
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return sig

    a = emb.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        signature(vec_col).alias("a_sig"),
    )
    b = emb.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        signature(vec_col).alias("b_sig"),
    )
    return (
        a.join(b, (F.col("a_sig") == F.col("b_sig")) & (F.col("a_id") < F.col("b_id")))
        .withColumn("cosine", dot_expr("a_vec", "b_vec"))
        .filter(F.col("cosine") >= tau)
        .select("a_id", "b_id", "cosine")
    )
