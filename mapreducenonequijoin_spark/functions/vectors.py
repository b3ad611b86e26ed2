"""Vector math over ArrayType(FloatType) embedding columns.

Built-in higher-order functions only (zip_with/aggregate run inside
codegen): no UDF, no Python. The float32→float64 cast + left-to-right
fold is bit-identical to DuckDB's list_dot_product over DOUBLE[]
(verified empirically), which keeps similarity queries hash-exact
against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a, b) -> Column:
    """Σ aᵢ·bᵢ in double precision. Fixtures are L2-normalized
    (‖v‖=1), so this IS cosine similarity."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
