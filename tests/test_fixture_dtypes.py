"""Fixture-encoding canary (VERDICT r4 item 9).

Round 4 went red because the regenerated ``events`` fixture switched
its Parquet timestamp encoding (NANOS → MICROS isAdjustedToUTC=false)
and a vanilla Spark 4 session inferred TIMESTAMP_NTZ, breaking every
``unix_micros``/``withWatermark`` plan. This test pins BOTH layers:

1. what a VANILLA session (``spark.newSession()`` — fresh SQLConf, no
   engine confs) infers from each fixture file, so any future fixture
   re-encode fails here in seconds with an explicit dtype diff rather
   than as a cascade of DATATYPE_MISMATCH errors at round close;
2. what ``load_table`` (the engine's single scan boundary) guarantees
   to every plan: ``events.ts`` is exactly ``timestamp``, never
   ``timestamp_ntz`` or ``bigint``, regardless of the encoding.
"""

from __future__ import annotations

import os

import pytest

from mapreducenonequijoin_spark.sources.io import TABLES, load_table

# Engine-boundary contract: dtypes every plan is allowed to assume
# after load_table. Only columns with plan-level dependencies listed.
LOAD_TABLE_CONTRACT = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_shipdate": "timestamp",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_orderdate": "timestamp",
        "o_totalprice": "double",
    },
    "documents": {"doc_id": "bigint", "text": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
}

FORBIDDEN_PLAN_TYPES = {"timestamp_ntz"}


def test_vanilla_session_inference_is_known(spark, sf_dir):
    """A conf-free session must infer a dtype set the engine knows how
    to normalise: any timestamp-ish column may only be timestamp,
    timestamp_ntz (normalised by load_table), or bigint (nanos path).
    A new encoding (e.g. INT96, string dates) fails loudly here."""
    vanilla = spark.newSession()
    for conf in (
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
    ):
        # newSession should give defaults; unset defensively if a prior
        # test leaked the conf into this session's state.
        try:
            vanilla.conf.unset(conf)
        except Exception:
            pass
    # nanos fixtures refuse to read without nanosAsLong; that conf is
    # part of the engine boundary, so apply ONLY it here.
    vanilla.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    allowed = {"timestamp", "timestamp_ntz", "bigint", "date"}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        dtypes = dict(vanilla.read.parquet(path).dtypes)
        for col, t in dtypes.items():
            if "ts" == col or col.endswith("date"):
                assert t in allowed, (
                    f"{name}.{col} has unexpected vanilla dtype {t!r}; "
                    "fixture encoding changed — update sources/io.py"
                )


@pytest.mark.parametrize("name", sorted(LOAD_TABLE_CONTRACT))
def test_load_table_contract(spark, sf_dir, name):
    got = dict(load_table(spark, sf_dir, name).dtypes)
    for col, want in LOAD_TABLE_CONTRACT[name].items():
        assert got.get(col) == want, (
            f"load_table({name}).{col}: want {want}, got {got.get(col)}"
        )


def test_load_table_pins_utc_session_timezone(spark, sf_dir):
    """Timestamp values only match the DuckDB oracle when the session
    time zone is UTC. A vanilla driver session inherits the host TZ, so
    load_table must pin spark.sql.session.timeZone itself — even when
    the session starts out on a non-UTC zone (ADVICE r5 item 1)."""
    vanilla = spark.newSession()
    vanilla.conf.set("spark.sql.session.timeZone", "America/New_York")
    load_table(vanilla, sf_dir, "events")
    assert vanilla.conf.get("spark.sql.session.timeZone") == "UTC"


@pytest.mark.parametrize("name", TABLES)
def test_no_ntz_escapes_load_table(spark, sf_dir, name):
    """No plan-visible column may carry TIMESTAMP_NTZ — the type that
    unix_micros and withWatermark reject."""
    for col, t in load_table(spark, sf_dir, name).dtypes:
        assert t not in FORBIDDEN_PLAN_TYPES, f"{name}.{col} is {t}"
