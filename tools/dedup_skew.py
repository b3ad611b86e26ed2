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


def er_main() -> int:
    """--er mode (r14, VERDICT r13 item 6): the same hot-key attack on
    ENTITY-RESOLUTION blocking — one (nation, name-prefix) block owns
    the duplicate mass (placeholder/franchise names on real master
    data), cold blocks form the bulk. Measures per-task candidate-pair
    loads for operators.dedup.blocked_self_pairs unsalted vs salted;
    pair-set equality is pinned separately by
    tests/test_llm_ops.py::test_blocked_er_salt_pair_equality."""
    n_cold = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    hot = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    spark = get_spark("dedup-skew-er", shuffle_partitions=PARTS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # keep the 32 reducer tasks visible: at toy bytes AQE would
    # coalesce them to ~2 and hide the per-task load distribution this
    # harness exists to show (at 100 TB the partitions are at advisory
    # size and no coalescing occurs)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    from mapreducenonequijoin_spark.operators.dedup import blocked_self_pairs

    hot_rows = [
        (i, 7, "Customer#HOTBLOCK", 100 + i) for i in range(hot)
    ]
    cold_rows = [
        (hot + i, i % 25, f"Customer#{i % 7500:09d}", 500 + i)
        for i in range(n_cold)
    ]
    c = spark.createDataFrame(
        hot_rows + cold_rows,
        "c_custkey long, c_nationkey long, blk string, bal long",
    ).repartition(PARTS)
    c.cache().count()

    # static block-key partition load (the exchange the SMJ pays)
    loads = (
        c.withColumn("p", F.pmod(F.hash("blk", "c_nationkey"), F.lit(PARTS)))
        .groupBy("p")
        .count()
        .collect()
    )
    mx, md, ratio = load_stats([r["count"] for r in loads])
    print(f"ER corpus: {hot + n_cold:,} records, hot (nation, prefix) "
          f"block {hot:,}, {PARTS} partitions")
    print("\n| measurement | max | median | max/median | wall |")
    print("| --- | --- | --- | --- | --- |")
    print(f"| block-key partition load (input rows) | {mx:,} | {md:,.0f} |"
          f" {ratio:.1f} | - |")

    def run(label: str, salt_hot: int) -> int:
        pairs = blocked_self_pairs(
            c, "c_custkey", ["blk", "c_nationkey"],
            salt_hot=salt_hot, hot_block_min=256,
        )
        t0 = time.time()
        per_task = (
            pairs.select(F.spark_partition_id().alias("t"))
            .groupBy("t")
            .count()
            .collect()
        )
        wall = time.time() - t0
        mx, md, ratio = load_stats([r["count"] for r in per_task])
        print(f"| {label} ({len(per_task)} tasks) | {mx:,} | {md:,.0f} |"
              f" {ratio:.1f} | {wall:.1f} s |")
        return mx

    mx_plain = run("ER pairs/task, unsalted", 0)
    mx_salt = run("ER pairs/task, salt_hot=16", 16)
    print(f"\nmax-task reduction from salting: {mx_plain / mx_salt:.1f}x")
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--er":
        return er_main()
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


def main_incremental() -> int:
    """Same power-law attack, asymmetric skeleton (VERDICT r12 item 5):
    every 10th doc is the incoming DELTA, the rest the BASE — the hot
    cluster contributes ~hot/10 delta copies × ~0.9·hot base copies of
    the SAME signature, so one (band, key) bucket emits their full
    bipartite product per band into one task unless decomposed."""
    n_unique = int(sys.argv[2]) if len(sys.argv) > 2 else 17_000
    hot = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    spark = get_spark("dedup-skew-incr", shuffle_partitions=PARTS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # At fixture scale AQE folds the whole (byte-tiny) output into 1-2
    # tasks, hiding the per-key balance this harness exists to show;
    # at 100 TB coalescing operates far above hot-bucket granularity,
    # so the per-key distribution is the number that transfers.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    from mapreducenonequijoin_spark.operators.dedup import (
        incremental_candidates_raw,
    )

    corpus = powerlaw_corpus(spark, n_unique, hot)
    delta = corpus.filter(F.col("doc_id") % 10 == 0)
    base = corpus.filter(F.col("doc_id") % 10 != 0)
    sig_d = minhash_signatures(delta, "doc_id", "text", NUM_PERMS).select(
        "doc_id", "mh"
    )
    sig_b = minhash_signatures(base, "doc_id", "text", NUM_PERMS).select(
        "doc_id", "mh"
    )
    sig_d.cache().count()
    sig_b.cache().count()
    print(f"corpus: {corpus.count():,} docs (10% delta), hot cluster "
          f"{hot:,}, {BANDS} bands, {PARTS} partitions")
    print("\n| measurement | max | median | max/median | wall |")
    print("| --- | --- | --- | --- | --- |")

    def run(label: str, salt: int) -> int:
        cand = incremental_candidates_raw(
            sig_d, sig_b, "doc_id", ROWS_PER_BAND, BANDS,
            salt_hot=salt, hot_bucket_min=256,
        )
        t0 = time.time()
        per_task = (
            cand.select(F.spark_partition_id().alias("t"))
            .groupBy("t")
            .count()
            .collect()
        )
        wall = time.time() - t0
        mx, md, ratio = load_stats([r["count"] for r in per_task])
        print(f"| delta×base pairs/task, "
              f"{'salt_hot=' + str(salt) if salt else 'unsalted'} "
              f"({len(per_task)} tasks) | {mx:,} | {md:,.0f} |"
              f" {ratio:.1f} | {wall:.1f} s |")
        return mx

    mx_plain = run("unsalted", 0)
    mx_salt = run("salted", 16)
    print(f"\nmax-task reduction from salting: {mx_plain / mx_salt:.1f}x")
    spark.stop()
    return 0


def main_band() -> int:
    """Tied-value attack on band_join's bucket rewrite: one hot PRICE
    shared by m rows puts m left rows (and ~2m right replicas) into
    ONE bucket, whose task emits ~m² result pairs — the same
    output-skew geometry as the LSH hot cluster, in the value domain.
    Measures result pairs per task for the production band_join shape
    (broadcast off), unsalted vs salt_hot=16."""
    n_unique = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
    hot = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    spark = get_spark("band-skew", shuffle_partitions=PARTS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # see main_incremental: coalescing at fixture scale hides per-key
    # balance (it folded this whole measurement into ONE task)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    from mapreducenonequijoin_spark.operators.joins import band_join

    # integer prices spread over [0, n_unique) — band ±1 catches ~3
    # uniform rows — plus `hot` rows ALL at one tied price
    vals = (
        spark.range(n_unique)
        .select(F.col("id"), (F.col("id") % (n_unique // 4)).alias("price"))
        .unionByName(
            spark.range(n_unique, n_unique + hot).select(
                F.col("id"), F.lit(777).alias("price")
            )
        )
        .repartition(PARTS)
        .cache()
    )
    vals.count()
    print(f"rows: {n_unique + hot:,}, hot tied price 777 × {hot:,}, "
          f"band ±1, {PARTS} partitions")
    print("\n| measurement | max | median | max/median | wall |")
    print("| --- | --- | --- | --- | --- |")

    def run(salt: int) -> int:
        a = vals.select(F.col("id").alias("a_id"),
                        F.col("price").alias("a_price"))
        b = vals.select(F.col("id").alias("b_id"),
                        F.col("price").alias("b_price"))
        pairs = band_join(
            a, b, "a_price", "b_price", lower=-1.0, upper=1.0,
            salt_hot=salt, hot_bucket_min=256,
        ).filter(F.col("a_id") < F.col("b_id"))
        t0 = time.time()
        per_task = (
            pairs.select(F.spark_partition_id().alias("t"))
            .groupBy("t")
            .count()
            .collect()
        )
        wall = time.time() - t0
        mx, md, ratio = load_stats([r["count"] for r in per_task])
        print(f"| band pairs/task, "
              f"{'salt_hot=' + str(salt) if salt else 'unsalted'} "
              f"({len(per_task)} tasks) | {mx:,} | {md:,.0f} |"
              f" {ratio:.1f} | {wall:.1f} s |")
        return mx

    mx_plain = run(0)
    mx_salt = run(16)
    print(f"\nmax-task reduction from salting: {mx_plain / mx_salt:.1f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--incremental":
        raise SystemExit(main_incremental())
    if len(sys.argv) > 1 and sys.argv[1] == "--band":
        raise SystemExit(main_band())
    raise SystemExit(main())
