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

__all__ = ["knn_cosine_brute", "threshold_similarity_join", "hyperplane_lsh_pairs"]


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
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
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
