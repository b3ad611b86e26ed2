

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
