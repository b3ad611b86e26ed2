"""Registry mapping SURVEY.md §2 operator ids → (query fn, oracle SQL).

The driver contract (__spark_entry__.py) wants two dicts:
``queries()[id] -> Callable[(spark, sf_dir)] -> DataFrame`` and
``oracle_sql()[id] -> str`` (DuckDB SQL over the pre-registered fixture
views). A single decorator keeps the pair adjacent in source so the
column aliases can't drift apart (the driver hash-compares by column
NAME — SURVEY.md §5.4 hazard 5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    fn: QueryFn
    oracle: str | None  # None → driver runs a weaker rows-only check


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = QueryDef(fn, oracle)
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {k: v.oracle for k, v in QUERIES.items() if v.oracle is not None}
