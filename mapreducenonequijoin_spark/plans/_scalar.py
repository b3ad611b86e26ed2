"""Scalar-frame attachment: join a 1-row aggregate frame (corpus
count, min/max stats, ...) onto every row of a fact frame as a
**BroadcastHashJoin**, never a BroadcastNestedLoopJoin.

A naive ``fact.crossJoin(broadcast(one_row))`` plans as BNLJ; a
constant-key equi-join only survives if Catalyst cannot simplify the
key to a literal (``col * 0`` folds to ``0`` whenever ``col`` is
non-nullable — e.g. any count(*) output — and the join then degrades
to BNLJ again). ``pmod(xxhash64(col), 1)`` is always 0 but is never
algebraically simplified regardless of nullability, so the planner
keeps a hash join on both sides for one hash instruction per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _k(col: str):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(1)).cast("int")


def attach_scalar_frame(
    fact: DataFrame, fact_col: str, scalar: DataFrame, scalar_col: str
) -> DataFrame:
    """All fact columns + all columns of the 1-row ``scalar`` frame,
    via broadcast hash equi-join on a constant-but-unfoldable key.
    ``fact_col`` / ``scalar_col`` are any existing columns used only
    to anchor the key expressions."""
    lhs = fact.withColumn("__sk", _k(fact_col))
    rhs = F.broadcast(scalar.withColumn("__sk", _k(scalar_col)))
    return lhs.join(rhs, "__sk").drop("__sk")
