"""IVF (inverted-file) approximate nearest-neighbour search — the
clustered scale path for similarity search (north-star: "an IVF or
LSH-bucketed variant as the scale path").

A lightweight Lloyd's k-means (deterministic init, fixed iterations)
partitions the vector space; search probes only the query's nearest
centroid cell(s), turning O(n²) scoring into O(n·n/k·probes). The
centroid model is O(k·dim) floats — model parameters, exchanged with
the driver like any fitted statistic (the [OR11] analogue: the
histogram/statistics step), NOT a data materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot_expr

__all__ = ["kmeans_lite", "assign_clusters", "ivf_self_search"]


def _dots_to_centroids(vec_col: str, centroids: list[list[float]]):
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(c)) for c in cent]),
                    lambda x, c: x.cast("double") * c,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for cent in centroids
        ]
    )


def kmeans_lite(
    emb: DataFrame, id_col: str, vec_col: str, k: int = 8, iterations: int = 3
) -> list[list[float]]:
    """Deterministic k-means: init = the k lowest-id vectors; a fixed
    number of Lloyd iterations (assign via max-dot since vectors are
    L2-normalized ⇒ spherical k-means; update via per-cluster mean).
    Each iteration is one shuffle; only k×dim floats reach the driver."""
    import numpy as np

    init = (
        emb.orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = [list(map(float, r[0])) for r in init]
    for _ in range(iterations):
        assigned = (
            emb.withColumn("__dots", _dots_to_centroids(vec_col, centroids))
            .withColumn(
                "__cl",
                (F.expr("array_position(__dots, array_max(__dots))") - 1).cast("int"),
            )
        )

        def mean_vec(pdf):
            import pandas as pd

            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            c = mat.mean(axis=0)
            c = c / np.linalg.norm(c)  # re-normalize (spherical k-means)
            return pd.DataFrame({"__cl": [int(pdf["__cl"].iloc[0])], "c": [c.tolist()]})

        new = (
            assigned.groupBy("__cl")
            .applyInPandas(mean_vec, schema="__cl int, c array<double>")
            .collect()
        )
        by_cl = {r["__cl"]: r["c"] for r in new}
        centroids = [by_cl.get(i, centroids[i]) for i in range(k)]
    return centroids


def assign_clusters(
    emb: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, vec, cluster) — nearest-centroid assignment, JVM-side."""
    return (
        emb.withColumn("__dots", _dots_to_centroids(vec_col, centroids))
        .withColumn(
            "cluster",
            (F.expr("array_position(__dots, array_max(__dots))") - 1).cast("int"),
        )
        .drop("__dots")
    )


def ivf_self_search(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k_neighbors: int = 5,
    n_clusters: int = 8,
) -> DataFrame:
    """Approximate self k-NN: probe only the query's own cell —
    candidates drop from n to ~n/k_clusters per query. Recall is
    bounded by cell purity (vectors near a cell boundary may miss
    true neighbours in the adjacent cell — probe >1 cell to trade
    cost for recall). Output: (q_id, n_id, cosine, rank)."""
    from pyspark.sql import Window as W

    centroids = kmeans_lite(emb, id_col, vec_col, k=n_clusters)
    assigned = assign_clusters(emb, id_col, vec_col, centroids)
    a = assigned.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col("cluster").alias("q_cl"),
    )
    b = assigned.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        F.col("cluster").alias("n_cl"),
    )
    pairs = (
        a.join(b, (F.col("q_cl") == F.col("n_cl")) & (F.col("q_id") != F.col("n_id")))
        .withColumn("cosine", dot_expr("q_vec", "n_vec"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k_neighbors)
        .select("q_id", "n_id", "cosine", "rank")
    )
