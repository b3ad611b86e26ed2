"""Adversarial skew evidence for the banded dedup family (VERDICT r11
item 7).

SCALE.md's dedup rows prove flat candidate mass on uniform synthetic
scale-ups; this harness attacks the remaining assumption — that no
single LSH band bucket serializes one reducer — with a POWER-LAW
duplicate corpus: one hot cluster owns half the duplicate mass (m
identical texts → identical minhash signatures → the same (band, key)
bucket in EVERY band, the worst case for the banded equi-join), plus a
mid tail of small clusters and a unique-document bulk.

Measured, printed as a markdown table for SCALE.md:

1. **band-key partition load** — max/median rows per shuffle partition
   when the banded signature frame is hash-partitioned on the join key
   (Murmur3, the exact key the SMJ exchange uses). This is the
   [OR11 §4.2] load-balance number for the candidate join's INPUT.
2. **candidate-join task load** — per-output-partition candidate-pair
   counts for the banded self-join (the pre-`distinct` stage of
   minhash_near_dup_pairs) with AQE skew-join OFF vs ON, broadcast
   disabled so the join takes the sort-merge shape a 100 TB corpus
   forces. The hot bucket emits C(m,2) pairs per band; without skew
   handling ONE task owns them all.

Toy-scale note (disclosed in the SCALE.md row): AQE's skew trigger is
byte-based (spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes,
default 256 MB — at 100 TB the hot bucket crosses it on its own), so at
this fixture scale the thresholds are lowered to demonstrate the SPLIT
MECHANISM, not re-tuned defaults: the split factor and the resulting
max/median bound are what transfer to cluster scale.

Usage: python tools/dedup_skew.py [n_unique] [hot_size]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mapreducenonequijoin_spark.operators.dedup import (  # noqa: E402
    minhash_signatures,
)
from mapreducenonequijoin_spark.session import get_spark  # noqa: E402

ROWS_PER_BAND = 2
NUM_PERMS = 32
BANDS = NUM_PERMS // ROWS_PER_BAND
PARTS = 32


def powerlaw_corpus(spark, n_unique: int, hot: int, mid_clusters: int = 100,
                    mid_size: int = 10):
    """doc_id/text frame: `hot` copies of one template, `mid_clusters`
    clusters of `mid_size`, `n_unique` singletons. Texts are 40-word
    strings derived from the cluster id by arithmetic hashing, so the
    corpus is deterministic and shingle-diverse across clusters."""
    def words(cluster: int) -> str:
        return " ".join(
            f"w{(cluster * 1_000_003 + i * 7919) % 900_719}" for i in range(40)
        )

    rows = []
    did = 0
    for _ in range(hot):
        rows.append((did, words(0)))
        did += 1
    for c in range(1, mid_clusters + 1):
        for _ in range(mid_size):
            rows.append((did, words(c)))
            did += 1
    for u in range(n_unique):
        rows.append((did, words(10_000 + u)))
        did += 1
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(
        PARTS
    )


def banded(sig, side: str):
    key = F.concat_ws(
        ",",
        F.transform(
            F.slice("mh", F.col("__band") * ROWS_PER_BAND + 1, ROWS_PER_BAND),
            lambda x: x.cast("string"),
        ),
    )
    return (
        sig.withColumn(
            "__band", F.explode(F.sequence(F.lit(0), F.lit(BANDS - 1)))
        )
        .select(
            F.col("doc_id").alias(f"{side}_id"),
            F.col("__band").alias(f"{side}_band"),
            key.alias(f"{side}_key"),
        )
    )


def load_stats(counts: list[int]) -> tuple[int, float, float]:
    mx = max(counts)
    md = statistics.median(counts)
    return mx, md, (mx / md if md else float("inf"))


def main() -> int:
    n_unique = int(sys.argv[1]) if len(sys.argv) > 1 else 17_000
    hot = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark("dedup-skew", shuffle_partitions=PARTS)
    spark.sparkContext.setLogLevel("ERROR")
    # the 100 TB join shape: no broadcast on either planner
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    corpus = powerlaw_corpus(spark, n_unique, hot)
    n_docs = corpus.count()
    sig = minhash_signatures(corpus, "doc_id", "text", NUM_PERMS).select(
        "doc_id", "mh"
    )
    sig.cache().count()

    # 1. static band-key partition load (Murmur3 = hashpartitioning)
    a = banded(sig, "a")
    loads = (
        a.withColumn("p", F.pmod(F.hash("a_band", "a_key"), F.lit(PARTS)))
        .groupBy("p")
        .count()
        .collect()
    )
    mx, md, ratio = load_stats([r["count"] for r in loads])
    print(f"corpus: {n_docs:,} docs, hot cluster {hot:,}, "
          f"{BANDS} bands, {PARTS} partitions")
    print("\n| measurement | max | median | max/median | wall |")
    print("| --- | --- | --- | --- | --- |")
    print(f"| band-key partition load (input rows) | {mx:,} | {md:,.0f} |"
          f" {ratio:.1f} | - |")

    # 2. candidate-join task load: production shapes via the operator's
    #    own banded_candidates_raw (unsalted / AQE-skew attempt / salted)
    from mapreducenonequijoin_spark.operators.dedup import (
        banded_candidates_raw,
    )

    def run(label: str, salt_hot: int, aqe_skew: bool):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower()
        )
        if aqe_skew:
            # lower the byte trigger far below the hot partition's size
            # so the mechanism WOULD fire if it could see the skew —
            # the point of this row is that it still cannot (the skew
            # is in the join OUTPUT, not the input bytes its trigger
            # reads), which is why the salt rewrite exists
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "64KB",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
            )
            spark.conf.set(
                "spark.sql.adaptive.forceOptimizeSkewedJoin", "true"
            )
        cand = banded_candidates_raw(
            sig,
            "doc_id",
            ROWS_PER_BAND,
            BANDS,
            salt_hot=salt_hot,
            hot_bucket_min=256,
        )
        t0 = time.time()
        per_task = (
            cand.select(F.spark_partition_id().alias("t"))
            .groupBy("t")
            .count()
            .collect()
        )
        wall = time.time() - t0
        counts = [r["count"] for r in per_task]
        mx, md, ratio = load_stats(counts)
        print(f"| {label} ({len(counts)} tasks) | {mx:,} | {md:,.0f} |"
              f" {ratio:.1f} | {wall:.1f} s |")
        return mx

    mx_plain = run("pairs/task, unsalted", 0, False)
    run("pairs/task, unsalted + AQE skew forced", 0, True)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    mx_salt = run("pairs/task, salt_hot=16", 16, False)
    print(f"\nmax-task reduction from salting: {mx_plain / mx_salt:.1f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
