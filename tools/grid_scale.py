"""Measured scaling evidence for the spatial grid ε-join (round 6).

Uniform 2D points at 1x/10x/50x the sf0.1 embeddings volume with the
DOMAIN scaled to hold density constant (the regime a fixed ε targets);
measures wall-clock for the grid-bucketed plan, the candidate-pair
count versus the emitted pair count (grid selectivity), and — at 1x
only, where it is feasible — the naive cross-join+filter plan for a
correctness+cost reference point.

Paste the printed table into SCALE.md. Runtime ~2-3 min at 50x.

Usage: python tools/grid_scale.py [--max-scale 50]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mapreducenonequijoin_spark.operators.joins import (  # noqa: E402
    grid_distance_join_2d,
)
from mapreducenonequijoin_spark.session import get_spark  # noqa: E402

BASE_ROWS = 5_000  # = sf0.1 embeddings volume
EPS = 0.02


def points(spark, rows: int, side: float, seed: int):
    # value-derived uniform coords (replay-stable, like the operators)
    h1 = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1_000_003)) / 1_000_003.0
    h2 = F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1_000_003)) / 1_000_003.0
    return spark.range(rows).select(
        F.col("id").alias("pid"),
        (h1 * side).alias("x"),
        (h2 * side).alias("y"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-scale", type=int, default=50)
    args = ap.parse_args()
    spark = get_spark()
    scales = [s for s in (1, 10, args.max_scale) if s <= args.max_scale]
    print(f"| scale | rows | grid wall (s) | pairs | cand/pair | naive wall (s) |")
    print(f"| --- | --- | --- | --- | --- | --- |")
    for s in dict.fromkeys(scales):
        rows = BASE_ROWS * s
        side = math.sqrt(rows / BASE_ROWS)  # constant density
        p = points(spark, rows, side, seed=7)
        t0 = time.monotonic()
        out = grid_distance_join_2d(p, "pid", "x", "y", EPS)
        n_pairs = out.count()
        grid_wall = time.monotonic() - t0
        # candidate volume = same-cell + neighbour-cell pairs pre-filter
        cell = p.select(
            (F.floor(F.col("x") / EPS)).alias("cx"),
            (F.floor(F.col("y") / EPS)).alias("cy"),
        )
        per_cell = cell.groupBy("cx", "cy").count()
        cand = (
            per_cell.agg(F.sum(F.col("count") * F.col("count") * 9)).collect()[0][0]
        )
        naive_wall = float("nan")
        if s == 1:
            a = p.select(
                F.col("pid").alias("ia"), F.col("x").alias("xa"), F.col("y").alias("ya")
            )
            b = p.select(
                F.col("pid").alias("ib"), F.col("x").alias("xb"), F.col("y").alias("yb")
            )
            d = F.sqrt(
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            )
            t0 = time.monotonic()
            n_naive = (
                a.join(b, (F.col("ia") < F.col("ib")) & (d < F.lit(EPS))).count()
            )
            naive_wall = time.monotonic() - t0
            assert n_naive == n_pairs, (n_naive, n_pairs)
        ratio = cand / max(n_pairs, 1)
        print(
            f"| {s}x | {rows} | {grid_wall:.2f} | {n_pairs} |"
            f" {ratio:.0f} | {naive_wall:.2f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
