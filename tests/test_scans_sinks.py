"""Sink round-trip properties: bucketed co-location must actually
eliminate the join shuffle, not just return correct rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducenonequijoin_spark.plans.scans import write_bucketed
from mapreducenonequijoin_spark.sources.io import load_table


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_bkt", str(tmp_path / "o"), "o_orderkey", 4)
    write_bucketed(li, "t_lineitem_bkt", str(tmp_path / "l"), "l_orderkey", 4)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_orders_bkt").join(
                spark.table("t_lineitem_bkt"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located SMJ: no Exchange on either side
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            # and values match the plain parquet join
            want = orders.join(
                li, F.col("o_orderkey") == F.col("l_orderkey")
            ).count()
            assert joined.count() == want > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """scan_dynamic_partition_pruning must actually plan a
    dynamicpruning subquery on the fact scan's PartitionFilters —
    otherwise the query silently degrades to a full-partition scan
    (correct answers, 15x the I/O at scale)."""
    from mapreducenonequijoin_spark.plans import QUERIES

    df = QUERIES["scan_dynamic_partition_pruning"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, "DPP subquery filter missing from fact scan"


def test_unpivot_no_shuffle(spark, sf_dir):
    """unpivot_melt is a narrow reshape: the plan must contain no
    Exchange (an Expand node only)."""
    from mapreducenonequijoin_spark.plans import QUERIES

    df = QUERIES["unpivot_melt"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and "Exchange" not in plan


def test_secondary_sort_within_files(spark, sf_dir):
    """Every written file must hold each user's events contiguously
    and time-ordered (the MR secondary-sort contract)."""
    import glob

    from mapreducenonequijoin_spark.plans.scans import (
        _cache_dir,
        sink_secondary_sort,
    )

    sink_secondary_sort(spark, sf_dir).collect()
    files = glob.glob(_cache_dir(sf_dir, "sink_secondary_sort") + "/*.parquet")
    assert files
    seen_users = set()
    for f in files:
        rows = spark.read.parquet(f).collect()
        file_users = []
        for r in rows:
            if not file_users or file_users[-1] != r.user_id:
                file_users.append(r.user_id)
        # each user appears in ONE contiguous run, in one file only
        assert len(file_users) == len(set(file_users))
        assert not (set(file_users) & seen_users)
        seen_users.update(file_users)
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append((r.ts, r.event_id))
        for evs in by_user.values():
            assert evs == sorted(evs)


def test_python_datasource_filter_pushdown(spark, tmp_path):
    """The tbl source must (a) parse the positional text layout
    correctly with nulls, and (b) receive planner predicates through
    pushFilters — asserted by the absence of a post-scan Filter node
    for the pushed predicate."""
    from mapreducenonequijoin_spark.sources.tbl import TblDataSource, TblReader
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringContains

    src = tmp_path / "t.tbl"
    src.write_text("1|alpha|10\n2||20\n3|gamma|\n")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(TblDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("tbl")
        .schema("id int, name string, v int")
        .option("path", str(src))
        .load()
    )
    rows = {tuple(r) for r in df.collect()}
    assert rows == {(1, "alpha", 10), (2, None, 20), (3, "gamma", None)}
    # v > 5 must drop row 3 (NULL comparison) and keep 1, 2
    got = {r.id for r in df.filter("v > 5").collect()}
    assert got == {1, 2}

    # unit-level: supported filters retained, unsupported handed back
    r = TblReader({"path": str(src)}, df.schema)
    residual = list(
        r.pushFilters([GreaterThan(("v",), 5), StringContains(("name",), "mm")])
    )
    assert [type(f) for f in residual] == [StringContains]
    assert [type(f) for f in r._pushed] == [GreaterThan]
    kept = [row for p in r.partitions() for row in r.read(p)]
    assert {row[0] for row in kept} == {1, 2}


def test_tbl_writer_two_phase_commit(tmp_path):
    """Unit: temp files become visible ONLY at commit; abort removes
    them (the FileOutputCommitter contract)."""
    from mapreducenonequijoin_spark.sources.tbl import TblWriter

    d = str(tmp_path / "out")
    w = TblWriter({"path": d}, None, overwrite=True)
    msg = w.write(iter([(1, "a"), (2, None)]))
    import os

    assert os.path.basename(msg.tmp_file).startswith("_tmp-")
    w2 = TblWriter({"path": d}, None, overwrite=True)
    aborted = w2.write(iter([(9, "x")]))
    w2.abort([aborted])
    assert not os.path.exists(aborted.tmp_file)
    w.commit([msg])
    files = [f for f in os.listdir(d) if not f.startswith("_")]
    assert len(files) == 1 and files[0].startswith("part-00000-")
    assert open(os.path.join(d, files[0])).read() == "1|a\n2|\n"


def test_tbl_writer_append_preserves_prior_job(tmp_path):
    """Append mode (overwrite=False) must ADD files, never rename over
    a previous job's parts — committed names carry a per-job token."""
    import os

    from mapreducenonequijoin_spark.sources.tbl import TblWriter

    d = str(tmp_path / "out")
    w1 = TblWriter({"path": d}, None, overwrite=True)
    w1.commit([w1.write(iter([(1, "a")]))])
    w2 = TblWriter({"path": d}, None, overwrite=False)
    w2.commit([w2.write(iter([(2, "b")]))])
    files = sorted(f for f in os.listdir(d) if not f.startswith("_"))
    assert len(files) == 2, f"append lost a part file: {files}"
    contents = sorted(open(os.path.join(d, f)).read() for f in files)
    assert contents == ["1|a\n", "2|b\n"]
    # and overwrite=True replaces everything
    w3 = TblWriter({"path": d}, None, overwrite=True)
    w3.commit([w3.write(iter([(9, "z")]))])
    files = [f for f in os.listdir(d) if not f.startswith("_")]
    assert len(files) == 1
    assert open(os.path.join(d, files[0])).read() == "9|z\n"


def test_tbl_reader_trailing_delimiter_and_ragged_lines(tmp_path):
    """Canonical TPC-H .tbl lines end with a trailing '|' — the reader
    must trim the resulting empty extra field; genuinely ragged lines
    must raise instead of silently misaligning columns; date/decimal
    columns must come back typed."""
    import datetime
    import decimal

    import pytest

    from mapreducenonequijoin_spark.sources.tbl import TblReader

    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("id int, d date, price decimal(10,2)")
    ok = tmp_path / "ok.tbl"
    ok.write_text("1|1996-01-02|17.35|\n2|1997-11-30|0.10|\n")
    r = TblReader({"path": str(ok)}, schema)
    rows = [row for p in r.partitions() for row in r.read(p)]
    assert rows == [
        (1, datetime.date(1996, 1, 2), decimal.Decimal("17.35")),
        (2, datetime.date(1997, 11, 30), decimal.Decimal("0.10")),
    ]

    bad = tmp_path / "bad.tbl"
    bad.write_text("1|1996-01-02\n")  # missing field
    r2 = TblReader({"path": str(bad)}, schema)
    with pytest.raises(ValueError, match="schema expects"):
        [row for p in r2.partitions() for row in r2.read(p)]

    # unsupported (nested) column types are rejected at planning time
    with pytest.raises(ValueError, match="cannot parse column type"):
        TblReader({"path": str(ok)}, StructType.fromDDL("a array<int>"))


def test_zorder_envelopes_tight_on_both_dims(spark, sf_dir):
    """Z-order files must have tighter-than-global min/max envelopes
    on BOTH interleaved dimensions (a single-column sort would be
    tight on one and global-wide on the other)."""
    import glob

    from mapreducenonequijoin_spark.plans.scans import (
        _cache_dir,
        sink_zorder_clustered,
    )

    sink_zorder_clustered(spark, sf_dir).collect()
    files = glob.glob(_cache_dir(sf_dir, "sink_zorder") + "/*.parquet")
    assert len(files) >= 4
    full = spark.read.parquet(_cache_dir(sf_dir, "sink_zorder"))
    import pyspark.sql.functions as F

    g = full.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("cw"),
        (F.max("o_orderdate").cast("long") - F.min("o_orderdate").cast("long")).alias("dw"),
    ).collect()[0]
    ratios_c, ratios_d = [], []
    for f in files:
        s = spark.read.parquet(f).agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("cw"),
            (F.max("o_orderdate").cast("long") - F.min("o_orderdate").cast("long")).alias("dw"),
        ).collect()[0]
        ratios_c.append(s.cw / g.cw)
        ratios_d.append(s.dw / g.dw)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    # median file covers well under the full range on BOTH dims
    assert med(ratios_c) <= 0.6, ratios_c
    assert med(ratios_d) <= 0.6, ratios_d


def test_compact_small_files_reduces_file_count(spark, sf_dir):
    """Compaction must actually cut the file count (64 fragments →
    ceil(bytes/512KiB) outputs) while the registered query's oracle
    pins row/value preservation."""
    import glob

    from mapreducenonequijoin_spark.plans.scans import (
        _cache_dir,
        sink_compact_small_files,
    )

    sink_compact_small_files(spark, sf_dir).collect()
    frag = glob.glob(_cache_dir(sf_dir, "compact_frag") + "/part-*.parquet")
    out = glob.glob(_cache_dir(sf_dir, "compact_out") + "/part-*.parquet")
    assert len(frag) == 64
    assert 1 <= len(out) < len(frag) / 4
    # even sizing: no output file more than 3x the smallest
    import os

    sizes = sorted(os.path.getsize(p) for p in out)
    assert sizes[-1] <= 3 * sizes[0] + 512 * 1024


def test_file_metadata_reconstructs_partition_values(spark, sf_dir):
    """event_type reconstructed purely from _metadata.file_path must
    reproduce the per-type counts of the source exactly — provenance
    comes from the scan, not from any data column."""
    import pyspark.sql.functions as F

    from mapreducenonequijoin_spark.plans.scans import scan_file_metadata
    from mapreducenonequijoin_spark.sources.io import load_table

    got = {r.event_type: r.n_rows for r in scan_file_metadata(spark, sf_dir).collect()}
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_binary_files_scan_roundtrip(spark, sf_dir):
    """binaryFile ingestion: every sampled doc's blob is listed,
    its file-status length equals the encoded byte count, and the
    decoded stats match a direct in-memory decode."""
    from mapreducenonequijoin_spark.operators.multimodal import decode_ppm, encode_ppm
    from mapreducenonequijoin_spark.plans.scans import scan_binary_files
    from mapreducenonequijoin_spark.sources.io import load_table

    import pyspark.sql.functions as F

    want_ids = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .collect()
    }
    rows = scan_binary_files(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == want_ids
    for r in rows:
        blob = encode_ppm(r.doc_id)
        w, h, arr = decode_ppm(blob)
        assert r.file_len == len(blob)
        assert (r.width, r.height) == (w, h)
        assert r.pixel_sum == int(arr.sum())


def test_nested_json_preserves_every_item(spark, sf_dir):
    """The JSON documents on disk must contain every sampled line item
    exactly once with intact fields (parsed back with plain Python
    json, independent of Spark's reader)."""
    import glob
    import json as pyjson

    import pyspark.sql.functions as F

    from mapreducenonequijoin_spark.plans.scans import (
        _cache_dir,
        scan_json_nested_roundtrip,
    )
    from mapreducenonequijoin_spark.sources.io import load_table

    scan_json_nested_roundtrip(spark, sf_dir).collect()  # materialize files
    want = {}
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 60 == 0)
        .select("l_orderkey", "l_linenumber",
                F.col("l_quantity").cast("long").alias("q"),
                F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
        .collect()
    ):
        want.setdefault(r.l_orderkey, []).append((r.l_linenumber, r.q, r.cents))
    got = {}
    for path in glob.glob(_cache_dir(sf_dir, "orders_nested_json") + "/part-*.json"):
        with open(path) as fh:
            for line in fh:
                d = pyjson.loads(line)
                got[d["order_key"]] = sorted(
                    (it["ln"], it["q"], it["cents"]) for it in d["items"]
                )
    assert got == {k: sorted(v) for k, v in want.items()}


def test_observe_metrics_single_pass(spark, sf_dir):
    """Observed metrics must equal direct aggregates, and the observe
    hook must not add a second scan (exactly one parquet scan in the
    observed plan)."""
    import pyspark.sql.functions as F

    from mapreducenonequijoin_spark.plans.scans import scan_observe_metrics
    from mapreducenonequijoin_spark.sources.io import load_table

    r = scan_observe_metrics(spark, sf_dir).collect()[0]
    want = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.count("*").alias("n"),
            F.count_if(F.col("o_totalprice") > 300000).alias("big"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"),
        )
        .collect()[0]
    )
    assert (r.rows_seen, r.big_orders, r.total_cents) == (want.n, want.big, want.c)
