"""Text-analysis expression builders (SURVEY.md §2.9, north-star).

All pure Column expressions (JVM-side, codegen'd) — no Python UDFs in
the hot path. The shingle/simhash constructions use only functions
with cross-engine-identical semantics (md5, integer bit ops, exact
integer division) so their outputs are oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny function-word list used by quality scoring / lang-id heuristics
STOPWORDS = ["a", "the", "and", "of", "in"]


def words_expr(text_col: str) -> Column:
    """Whitespace tokenization (fixture texts are single-spaced)."""
    return F.split(F.col(text_col), " ")


def shingles_expr(text_col: str, k: int = 3) -> Column:
    """Distinct k-word shingles; short texts fall back to the whole
    text as a single shingle. Word n-grams are order-sensitive, which
    the fixtures require: the vocabulary is so small that word-SET
    Jaccard saturates (unrelated docs reach 1.0) while 3-shingle
    Jaccard separates seeded near-dups (≥0.9) from noise (<0.1)."""
    # Bind the split array ONCE per row via a single-element outer
    # transform: writing split(...) inline at every w[i+j] access makes
    # Catalyst re-split the text per element (measured 3-4x slowdown
    # of the whole shingle build).
    joined = " || ' ' || ".join(f"__w[i + {j}]" for j in range(k))
    inner = (
        f"CASE WHEN size(__w) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size(__w) - {k}), i -> {joined})) "
        f"ELSE array({text_col}) END"
    )
    return F.expr(
        f"element_at(transform(array(split({text_col}, ' ')), __w -> {inner}), 1)"
    )


def duckdb_shingles(text_col: str, k: int = 3) -> str:
    """The DuckDB twin of shingles_expr (1-based list indexing)."""
    w = f"str_split({text_col}, ' ')"
    joined = " || ' ' || ".join(f"{w}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({w}) >= {k} THEN "
        f"list_distinct([{joined} FOR i IN range(1, len({w}) - {k - 2})]) "
        f"ELSE [{text_col}] END"
    )


def _word_hash32() -> Column:
    """32-bit word hash with identical semantics in Spark and DuckDB:
    first 8 hex digits of md5 as an integer (md5 is a specification,
    unlike xxhash64/hash whose impls differ across engines)."""
    return F.expr("CAST(conv(substr(md5(word), 1, 8), 16, 10) AS BIGINT)")


def simhash_frame(df: DataFrame, id_col: str, text_col: str, nbits: int = 32) -> DataFrame:
    """Per-document SimHash fingerprint (Charikar 2002): each word
    votes ±1 on every bit of its 32-bit hash; the fingerprint keeps
    the sign of each bit's tally. Near-identical texts land within a
    small Hamming distance.

    Shuffle shape: explode words → partial+final aggregation on id —
    one shuffle, linear work, no driver materialization.
    """
    wdf = df.select(F.col(id_col), F.explode(words_expr(text_col)).alias("word"))
    h = _word_hash32()
    tallies = wdf.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(nbits)
        ]
    )
    sim = None
    for j in range(nbits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return tallies.select(F.col(id_col), sim.cast("long").alias("simhash"))


def duckdb_simhash_cte(nbits: int = 32) -> str:
    """DuckDB CTE producing (doc_id, simhash) identical to
    simhash_frame over the ``documents`` view."""
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(nbits)
    )
    bits = " + ".join(f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(nbits))
    return f"""
    w AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h FROM w),
    tallies AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
    sims AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM tallies)
    """
