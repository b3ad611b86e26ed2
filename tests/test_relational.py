

def test_fn_map_matches_python_recompute(spark, sf_dir):
    """Map keys/values/filter/element_at must match a Python recompute
    per language."""
    from collections import Counter

    from mapreducenonequijoin_spark.plans.relational import fn_map
    from mapreducenonequijoin_spark.sources.io import load_table

    per: Counter = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        per[(r.lang, r.source)] += 1
    langs = {lang for lang, _ in per}
    got = {r.lang: r for r in fn_map(spark, sf_dir).collect()}
    assert set(got) == langs
    for lang in langs:
        items = sorted(
            (s, n) for (lg, s), n in per.items() if lg == lang
        )
        row = got[lang]
        assert row.src_keys == ",".join(s for s, _ in items)
        assert row.doc_counts == ",".join(str(n) for _, n in items)
        assert row.n_big == sum(1 for _, n in items if n >= 5)
        assert row.src0_docs == dict(items).get("src0", 0)
