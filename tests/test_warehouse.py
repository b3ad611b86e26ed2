"""Invariant tests for the warehouse-maintenance plans (round 6):
properties the DuckDB oracle can't express — interval consistency,
probability-mass conservation, merge-count arithmetic."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_scd2_intervals_chain(spark):
    from mapreducenonequijoin_spark.plans.warehouse import scd2_dimension

    rows = scd2_dimension(spark, SF_DIR).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, versions in by_user.items():
        versions.sort(key=lambda r: r.version)
        # versions are 1..n dense; each interval closes where the next opens
        assert [v.version for v in versions] == list(range(1, len(versions) + 1))
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type
        assert versions[-1].valid_to is None  # current version is open


def test_pagerank_mass_and_bounds(spark):
    from mapreducenonequijoin_spark.plans.warehouse import graph_pagerank

    rows = graph_pagerank(spark, SF_DIR).collect()
    assert len(rows) == 25
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # undirected graph, no dangling mass: every rank ≥ teleport floor
    assert all(r > 0 for r in ranks)


def test_merge_upsert_counts_consistent(spark):
    from mapreducenonequijoin_spark.plans.warehouse import sink_merge_upsert
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = {r.merge_action: r for r in sink_merge_upsert(spark, SF_DIR).collect()}
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert set(rows) <= {"updated", "inserted", "unchanged"}
    n_upd = rows["updated"].n_rows if "updated" in rows else 0
    n_unc = rows["unchanged"].n_rows if "unchanged" in rows else 0
    # every target row survives the merge exactly once
    assert n_upd + n_unc == n_orders


def test_feature_bucketize_partitions_rows(spark):
    from mapreducenonequijoin_spark.plans.warehouse import feature_bucketize
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = feature_bucketize(spark, SF_DIR).collect()
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert {r.bucket_no for r in rows} <= set(range(10))
    los = [r.bucket_lo for r in sorted(rows, key=lambda r: r.bucket_no)]
    assert los == sorted(los)


def test_gapfill_dense_and_conserves_counts(spark):
    from mapreducenonequijoin_spark.plans.analytics import timeseries_gapfill
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = timeseries_gapfill(spark, SF_DIR).collect()
    hours = sorted({r.epoch_hour for r in rows})
    # dense spine: every hour between min and max present for every type
    assert hours == list(range(hours[0], hours[-1] + 1))
    types = {r.event_type for r in rows}
    assert len(rows) == len(hours) * len(types)
    n_total = sum(r.n_events for r in rows)
    assert n_total == load_table(spark, SF_DIR, "events").count()


def test_kmeans_assign_partitions_all_vectors(spark):
    from mapreducenonequijoin_spark.plans.warehouse import cluster_kmeans_assign
    from mapreducenonequijoin_spark.sources.io import load_table

    rows = cluster_kmeans_assign(spark, SF_DIR).collect()
    assert sum(r.n_points for r in rows) == load_table(
        spark, SF_DIR, "embeddings"
    ).count()
    assert {r.cluster_id for r in rows} <= {0, 1, 2, 3}


def test_pagerank_empty_graph(spark, tmp_path):
    """Empty inputs must yield an empty, correctly-typed result, not a
    1/0 at plan-build time."""
    from mapreducenonequijoin_spark.plans.warehouse import graph_pagerank

    d = str(tmp_path / "sf_empty")
    for t in ("orders", "lineitem"):
        full = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        full.limit(0).write.parquet(f"{d}/{t}.parquet")
    out = graph_pagerank(spark, d)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["node_id", "rank"]
