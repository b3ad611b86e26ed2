

def test_xml_roundtrip_exact(spark, sf_dir):
    """The XML write→read roundtrip must reproduce every nation row."""
    from mapreducenonequijoin_spark.plans.scans import scan_xml_roundtrip
    from mapreducenonequijoin_spark.sources.io import load_table

    want = {
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    rows = scan_xml_roundtrip(spark, sf_dir).collect()
    assert {(r.n_nationkey, r.n_name, r.n_regionkey) for r in rows} == want
    assert all(r.fmt == "xml" for r in rows)
    assert len(rows) == len(want)


def test_recursive_cte_matches_python_walk(spark, sf_dir):
    """Digit ancestor walk replayed in Python per part key."""
    from mapreducenonequijoin_spark.plans import QUERIES
    from mapreducenonequijoin_spark.sources.io import load_table

    keys = [
        r.p_partkey
        for r in load_table(spark, sf_dir, "part").select("p_partkey").collect()
    ]
    agg: dict = {}
    for k in keys:
        node, depth = k, 0
        while True:
            n, s = agg.get(depth, (0, 0))
            agg[depth] = (n + 1, s + node)
            if node <= 0:
                break
            node //= 10
            depth += 1
    got = {
        r.depth: (r.n_parts, r.node_checksum)
        for r in QUERIES["sql_recursive_cte"].fn(spark, sf_dir).collect()
    }
    assert got == agg
