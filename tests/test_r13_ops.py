"""Round-13 operator tests: the sketch-only HLL intersection
production form (VERDICT r12 item 7) and other r13 additions."""

from __future__ import annotations


def test_hll_intersection_default_is_sketch_only(spark, sf_dir):
    """The production form (exact_truth=False, the default) must not
    shuffle custkeys: no sort-merge/shuffled-hash join and no distinct
    aggregate in the plan — only the two map-side sketches and the
    1-row scalar attach. Its est_inter must still clear the gate
    bound against a Python set replay."""
    from mapreducenonequijoin_spark.plans.relational import (
        hll_intersection_estimate,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    df = hll_intersection_estimate(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # the exact arm's distinct() would plan as HashAggregate over
    # o_custkey keys; the sketch form's only aggregates are the two
    # hll_sketch_agg objects
    assert "distinct" not in plan.lower()

    row = df.collect()[0]
    assert row.est_inter == row.est_a + row.est_b - row.est_u

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey"
    ).collect()
    a = {r.o_custkey for r in orders if r.o_orderstatus == "O"}
    b = {r.o_custkey for r in orders if r.o_orderstatus == "F"}
    assert abs(row.est_inter - len(a & b)) * 10 <= row.est_u


def test_hll_intersection_gate_row_uses_exact_arm(spark, sf_dir):
    """The registered gate row is the exact_truth=True form of the
    same kernel — its columns and oracle are unchanged by the r13
    split."""
    from mapreducenonequijoin_spark.plans import QUERIES

    df = QUERIES["agg_hll_intersection_gate"].fn(spark, sf_dir)
    assert df.columns == [
        "n_a",
        "n_b",
        "n_inter_exact",
        "inter_within_10pct_of_union",
    ]
