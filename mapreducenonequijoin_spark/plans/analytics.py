"""Event-analytics shapes (SURVEY.md §2 extensions, round 5): funnel
conversion and cohort retention over the events fixture — the two
canonical product-analytics queries a warehouse engine is asked for
daily. Both are pure built-in expression plans keyed on user_id, so
every stage reuses one hash partitioning (Exchange reuse at scale);
nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table
from .registry import register


@register(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'view' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 1 AS ord, 'signup' AS stage, count(*) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'view_after_signup', count(*) FROM s2
      UNION ALL
      SELECT 3, 'purchase_after_view', count(*) FROM s3
    ) ORDER BY ord
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then VIEWED strictly after
    signing up, then PURCHASED strictly after that first view. Each
    stage is a per-user min-timestamp aggregate joined to the previous
    stage with an event-time residual — the sequential-pattern query
    (MATCH_RECOGNIZE-lite) expressed as chained aggregates. Every
    aggregate and join keys on user_id, so at scale the whole funnel
    is ONE shuffle partitioning reused across stages; stage frames
    shrink monotonically and ride broadcasts once small."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage_after(prev: DataFrame, etype: str, tcol: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(tcol))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = stage_after(s1, "view", "t1", "t2")
    s3 = stage_after(s2, "purchase", "t2", "t3")
    counts = [
        s1.agg(F.lit(1).alias("ord"), F.lit("signup").alias("stage"),
               F.count("*").alias("n_users")),
        s2.agg(F.lit(2).alias("ord"), F.lit("view_after_signup").alias("stage"),
               F.count("*").alias("n_users")),
        s3.agg(F.lit(3).alias("ord"), F.lit("purchase_after_view").alias("stage"),
               F.count("*").alias("n_users")),
    ]
    out = counts[0].unionByName(counts[1]).unionByName(counts[2])
    return out.orderBy("ord").select("stage", "n_users")


@register(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id
    )
    SELECT
      CAST(floor(datediff('day', DATE '1970-01-01', CAST(t0 AS DATE)) / 7)
           AS BIGINT) AS cohort_week,
      CAST(floor(datediff('day', CAST(t0 AS DATE), CAST(ts AS DATE)) / 7)
           AS BIGINT) AS week_no,
      count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week
    (epoch-day/7 — engine-neutral week arithmetic, no locale-dependent
    date_trunc), counted distinct per (cohort_week, weeks-since-first).
    One user_id aggregate + one user_id join (same partitioning,
    Exchange reuse) + a distinct-count keyed by the tiny
    (cohort, week) pair — the classic retention query, all built-ins."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    days = lambda c: F.datediff(F.to_date(c), F.lit("1970-01-01"))  # noqa: E731
    return (
        ev.join(first_seen, "user_id")
        .withColumn("cohort_week", F.floor(days("t0") / 7).cast("long"))
        .withColumn(
            "week_no",
            F.floor((days("ts") - days("t0")) / 7).cast("long"),
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_no")
    )
