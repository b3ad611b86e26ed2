"""Relational-core queries (SURVEY.md §2.2, §2.4-2.8).

In the reference these capabilities are implicit map/reduce-side code
inside Hadoop jobs [HADOOP-API]: projection/filter/derivation happen in
the Mapper, aggregation in the Reducer with map-side combiners (=
Spark's automatic partial+final HashAggregate), secondary sort ≈ window
ordering, TotalOrderPartitioner ≈ range-partitioned sort. Here each is
a declarative DataFrame plan with a DuckDB oracle.

Float-aggregation policy (SURVEY.md §5.4): every double aggregate is
rounded identically in the Spark plan and the oracle SQL, because the
two engines sum in different orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.io import load_table
from ._scalar import attach_scalar_frame
from .registry import register


# --- §2.2 projection / filter / band predicate -------------------------------


@register(
    "project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           upper(l_returnflag) AS flag
    FROM lineitem
    """,
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection + derivation (map-side in the reference).

    The derived double is left UNROUNDED: identical per-row IEEE-754
    expression order in both engines is bit-exact, while round() at a
    half-way boundary is not (Spark rounds the decimal expansion,
    DuckDB the scaled float — they disagree on ties)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.upper("l_returnflag").alias("flag"),
    )


@register(
    "filter",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def filter_(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row predicate; pushed into the Parquet scan by Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_quantity") > 45)
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber")


@register(
    "filter_band_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE abs(l_tax - l_discount) <= 0.02
    """,
)
def filter_band_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's signature predicate class |a − b| ≤ ε [OR11 §1]
    as a same-row filter (the join form is join_band)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.abs(F.col("l_tax") - F.col("l_discount")) <= 0.02).select(
        "l_orderkey", "l_linenumber"
    )


# --- §2.4 aggregation ---------------------------------------------------------


@register(
    "agg_hash",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(avg(l_quantity), 2)                                   AS avg_qty,
           round(avg(l_extendedprice), 2)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final HashAggregate (the reference's
    map-side combiner + reducer, automatic in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY 1
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
           0 AS err_band_5pct
    FROM lineitem GROUP BY 1
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct — the constant-memory path for
    100 TB cardinalities (exact distinct needs a full shuffle).

    HLL values can't hash-match an oracle (DuckDB's sketch differs),
    so the query asserts the estimate itself: it returns the exact
    count plus the relative error BANDED to 5% steps
    (``floor(|hll − exact| / exact / 0.05)``) — at rsd=0.02 the
    estimate is essentially always inside 5%, so the oracle expects
    band 0, and a future HLL implementation drifting past 5% shows
    WHICH group landed in which band instead of flipping a bare
    boolean."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("__approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            F.floor(
                F.abs(F.col("__approx") - F.col("exact_parts"))
                / F.col("exact_parts")
                / F.lit(0.05)
            ).cast("int").alias("err_band_5pct"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY 1 HAVING count(*) > 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 15)
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)        AS sd_qty,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
    FROM lineitem GROUP BY 1
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statistics that feed [OR11 §5]'s histogram construction:
    spread + exact interpolated percentiles per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
    )


# --- §2.5 window functions ----------------------------------------------------


@register(
    "win_rownum_topk",
    oracle="""
    SELECT o_custkey, o_orderkey FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def win_rownum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer (reference idiom: secondary
    sort within a reduce group [HADOOP-API])."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey")
    )


@register(
    "win_rank",
    oracle="""
    SELECT s_suppkey,
           rank()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk,
           ntile(4)     OVER (PARTITION BY s_nationkey
                              ORDER BY s_acctbal DESC, s_suppkey)               AS quartile
    FROM supplier
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    wt = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return sup.select(
        "s_suppkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(wt).cast("long").alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
           lead(event_type)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gaps per user — lag/lead over an event-time order."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "win_running_frame",
    oracle="""
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def win_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return orders.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT event_id,
           count(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving count over a 1-hour event-time range — the batch analogue
    of a sliding stream window (and of the flagship band join)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select("event_id", F.count("*").over(w).alias("n_last_hour"))


# --- §2.6 sort / top-k / limit --------------------------------------------------


@register(
    "sort_global",
    oracle="""
    SELECT c_custkey,
           row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS pos
    FROM customer
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order (reference: TotalOrderPartitioner [HADOOP-API];
    Spark: range-partitioned sort). The order is made hash-visible by
    encoding each row's global position."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.orderBy(F.desc("c_acctbal"), F.asc("c_custkey")).select(
        "c_custkey", F.row_number().over(w).cast("long").alias("pos")
    )


@register(
    "sort_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planner uses TakeOrderedAndProject (per-partition
    heap + driver merge of k), never a full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    ).limit(100).select("l_orderkey", "l_linenumber", "l_extendedprice")


@register(
    "limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def limit_(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT is only deterministic under ORDER BY; exposed as such."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10).select(
        "o_orderkey", "o_totalprice"
    )


# --- §2.7 set operations --------------------------------------------------------


@register(
    "set_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return a.unionByName(b)


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    EXCEPT ALL
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return a.exceptAll(b)


# --- §2.8 scalar function families ----------------------------------------------


@register(
    "fn_date",
    oracle="""
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           count(*) AS n,
           round(avg(date_diff('day', o_orderdate, l_shipdate)), 2) AS avg_lag_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.datediff("l_shipdate", "o_orderdate")), 2).alias(
                "avg_lag_days"
            ),
        )
    )


@register(
    "fn_math",
    oracle="""
    SELECT p_partkey,
           round(sqrt(p_retailprice), 4)         AS sqrt_price,
           round(pow(p_size, 2), 1)              AS size_sq,
           greatest(p_size, 25)                  AS g,
           least(p_size, 25)                     AS l,
           abs(p_retailprice - 1000.0)           AS dist
    FROM part
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        F.greatest("p_size", F.lit(25)).cast("long").alias("g"),
        F.least("p_size", F.lit(25)).cast("long").alias("l"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist"),
    )


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           length(p_name)                               AS name_len,
           upper(str_split(p_name, ' ')[1])             AS first_word,
           regexp_extract(p_name, '(\\w+)$', 1)         AS last_word,
           levenshtein(str_split(p_name, ' ')[2], 'widget') AS lev_widget,
           concat_ws('|', p_brand, p_type)              AS brand_type
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.length("p_name").cast("long").alias("name_len"),
        F.upper(F.split("p_name", " ").getItem(0)).alias("first_word"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.levenshtein(F.split("p_name", " ").getItem(1), F.lit("widget")).cast("long").alias(
            "lev_widget"
        ),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                   AS dim,
           round(list_sum(embedding), 4)                    AS vec_sum,
           round(CAST(list_dot_product(embedding, embedding) AS DOUBLE), 4) AS sq_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 4)    AS vmax
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over the embedding column: the zip_with dot product is
    the kernel reused by the similarity operators (§2.9)."""
    emb = load_table(spark, sf_dir, "embeddings")
    acc = F.aggregate(
        "embedding", F.lit(0.0), lambda a, x: a + x.cast("double")
    )
    dot = F.aggregate(
        F.zip_with("embedding", "embedding", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(acc, 4).alias("vec_sum"),
        F.round(dot, 4).alias("sq_norm"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("vmax"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
    FROM events GROUP BY 1
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction on events.props ('{"k": <int>}')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.from_json("props", "k INT").getField("k").alias("k"))
        .groupBy("k")
        .count()
        .withColumnRenamed("count", "n")
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests agree across engines (md5/sha256 are
    specifications); engine-internal hashes (xxhash64/hash) are used
    only for derived keys (dedup/salting), never compared raw."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


# --- pivot / conditional / first-last (coverage widening) ---------------------


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (l_linestatus = 'O'), 2) AS O,
           round(sum(l_quantity) FILTER (l_linestatus = 'F'), 2) AS F
    FROM lineitem GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation); explicit pivot values keep the plan a
    single pass (no distinct-values pre-job) — required at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END                       AS tier,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS seg,
           (c_acctbal > 0)                               AS solvent
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression family: CASE/WHEN, nullif, coalesce,
    boolean projection."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("AUTOMOBILE")), F.lit("CAR")).alias(
            "seg"
        ),
        (F.col("c_acctbal") > 0).alias("solvent"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT s_suppkey,
           first_value(s_name) OVER w AS richest,
           last_value(s_name)  OVER w AS poorest
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame (deterministic
    via the full ordering)."""
    sup = load_table(spark, sf_dir, "supplier")
    w = (
        W.partitionBy("s_nationkey")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return sup.select(
        "s_suppkey",
        F.first("s_name").over(w).alias("richest"),
        F.last("s_name").over(w).alias("poorest"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube),
    via Spark SQL on a temp view."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("mrnej_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM mrnej_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --- subqueries (Catalyst decorrelation surface) ------------------------------


def _sql_on_views(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"mrnej_{t}")
    return spark.sql(sql)


@register(
    "sub_scalar",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → planned as a broadcast of the
    single aggregated value, one pass over customer."""
    return _sql_on_views(
        spark, sf_dir, ["customer"],
        """
        SELECT c_custkey FROM mrnej_customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM mrnej_customer)
        """,
    )


@register(
    "sub_in",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'MACHINERY')
    """,
)
def sub_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → rewritten by Catalyst to a left-semi join."""
    return _sql_on_views(
        spark, sf_dir, ["orders", "customer"],
        """
        SELECT o_orderkey FROM mrnej_orders
        WHERE o_custkey IN (SELECT c_custkey FROM mrnej_customer
                            WHERE c_mktsegment = 'MACHINERY')
        """,
    )


@register(
    "sub_correlated",
    oracle="""
    SELECT c_custkey FROM customer c1
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c1.c_nationkey)
    """,
)
def sub_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above nation average) → Catalyst
    decorrelates to an aggregate + join; never per-row re-execution."""
    return _sql_on_views(
        spark, sf_dir, ["customer"],
        """
        SELECT c_custkey FROM mrnej_customer c1
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM mrnej_customer c2
                           WHERE c2.c_nationkey = c1.c_nationkey)
        """,
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 2) AS p25,
           round(quantile_cont(l_quantity, 0.50), 2) AS p50,
           round(quantile_cont(l_quantity, 0.75), 2) AS p75,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (type R-7, the
    definition both Spark's `percentile` and DuckDB's `quantile_cont`
    implement, so values agree bit-for-bit on the integral-valued
    fixture measures).

    Scale note: exact percentiles buffer each group's value multiset —
    fine for bounded-cardinality measures like quantity; for unbounded
    ones the scale path is `approx_percentile` (t-digest, bounded
    memory), same plan shape, which the engine already exercises via
    `agg_approx_distinct`'s HLL pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.25), 2).alias("p25"),
        F.round(F.percentile("l_quantity", 0.50), 2).alias("p50"),
        F.round(F.percentile("l_quantity", 0.75), 2).alias("p75"),
        F.count("*").alias("n"),
    )


@register(
    "win_dist_funcs",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER w AS quartile,
           CASE WHEN cnt = 1 THEN 0
                ELSE (rn - 1) * 1000000 // (cnt - 1) END AS pct_rank_micro,
           rn * 1000000 // cnt AS cume_micro
    FROM (
      SELECT c_custkey, c_nationkey,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY c_nationkey) AS cnt
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    )
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY rn)
    """,
)
def win_dist_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank /
    cume_dist) per nation over account balance — the §2.5 completeness
    trio. Same single hash-partition + sort as every other window op;
    the c_custkey tie-break makes ranks deterministic (and the
    ordering TOTAL, so percent_rank ≡ (rn−1)/(n−1) and cume_dist ≡
    rn/n).

    HISTORY (r14): the ratios were emitted as round(x, 6) doubles —
    green at sf0.01 for 9 rounds, then the sf0.1 cross-scale sweep hit
    a value that lands EXACTLY on the 6-dp boundary (2331/4480 =
    0.5203125), where Spark's HALF_UP and DuckDB's float rounding
    split (…13 vs …12). Exact-rational window ratios never needed
    floats at all: both are now integer micros via the FLOOR-DIV
    rank arithmetic (the agg_percentile_disc discipline), which no
    scale can put on a boundary."""
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wn = W.partitionBy("c_nationkey")
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.count("*").over(wn).cast("long").alias("cnt"),
        )
        .select(
            "c_custkey",
            "c_nationkey",
            "quartile",
            F.when(F.col("cnt") == 1, F.lit(0).cast("long"))
            .otherwise(
                F.expr("(rn - 1) * 1000000 div (cnt - 1)")
            )
            .cast("long")
            .alias("pct_rank_micro"),
            F.expr("rn * 1000000 div cnt").cast("long").alias("cume_micro"),
        )
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2
    )
    SELECT event_type, user_id AS modal_user, n AS n_events
    FROM (
      SELECT event_type, user_id, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, user_id) AS rn
      FROM c
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode / argmax aggregation: the most frequent user per event
    type (deterministic lowest-id tiebreak). Two-level shape — a
    distributed (type, user) count, then a per-type argmax window
    over the ALREADY-AGGREGATED frame — so the window input is the
    distinct-key count, never the raw events; at 100 TB the first
    groupBy partial-aggregates map-side and the argmax never sees a
    row it didn't need. (Spark's native mode() aggregate has
    engine-defined tie behavior — the explicit window pins it.)"""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    c = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("user_id").alias("modal_user"), F.col("n").alias("n_events"))
    )


@register(
    "agg_percentile_approx",
    oracle="""
    SELECT round(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 2)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
           0 AS band50, 0 AS band90, 0 AS band99
    FROM orders
    """,
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via the KLL/GK-style sketch behind
    ``percentile_approx`` — the constant-memory path for 100 TB
    (exact percentile sorts or holds per-group value lists). Same
    oracle trick as agg_approx_distinct: sketches can't hash-match
    across engines, so the query emits the EXACT interpolated
    quantiles (bit-portable — pinned by agg_percentile_exact) plus
    the approximate estimate's relative error BANDED to 5 % steps;
    accuracy=10000 bounds rank error at 1e-4·n, so every band is 0
    and a future sketch regression shows WHICH quantile drifted."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.expr(
            "percentile(o_totalprice, array(0.5D, 0.9D, 0.99D))"
        ).alias("ex"),
        F.expr(
            "percentile_approx(o_totalprice, array(0.5D, 0.9D, 0.99D), 10000)"
        ).alias("ap"),
    )
    def band(i: int):
        ex = F.element_at("ex", i)
        ap = F.element_at("ap", i)
        return F.floor(F.abs(ap - ex) / ex / F.lit(0.05)).cast("int")
    return agg.select(
        F.round(F.element_at("ex", 1), 2).alias("p50"),
        F.round(F.element_at("ex", 2), 2).alias("p90"),
        F.round(F.element_at("ex", 3), 2).alias("p99"),
        band(1).alias("band50"),
        band(2).alias("band90"),
        band(3).alias("band99"),
    )


@register(
    "agg_corr_regr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6)       AS corr_price_qty,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS covar_price_qty,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
    FROM lineitem GROUP BY 1
    """,
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics family — Pearson correlation, sample
    covariance, and the OLS slope/intercept (regr_*) per group: the
    aggregates a feature-analysis pass runs before model training.
    All four are single-pass co-moment aggregates (numerically stable
    updating form in both engines), so one shuffle on the group key
    computes everything map-side-combined; rounded because co-moment
    accumulation order differs across engines at the ulp level."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
            "covar_price_qty"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
    )


@register(
    "win_ntile_grouped",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority, o_totalprice,
             CAST(ntile(10) OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS INT)
               AS decile
      FROM orders
    )
    SELECT o_orderpriority, decile, count(*) AS n,
           round(min(o_totalprice), 2) AS lo
    FROM d GROUP BY 1, 2
    """,
)
def win_ntile_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP ntile (equal-count deciles of order value within each
    priority class) + per-decile stats. Unlike a global ntile — whose
    single-partition window is the scale anti-pattern
    feature_bucketize exists to avoid — the PARTITION BY keeps every
    window inside one group's shuffle partition, so the plan is one
    hash partitioning on the group key at any scale. The (value, key)
    order makes bucket boundaries deterministic; ntile's
    remainder-to-early-buckets rule is engine-portable given the same
    total order."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("decile", F.ntile(10).over(w).cast("int"))
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
        )
    )


@register(
    "agg_sketch_mergeable_rollup",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             count(DISTINCT o_custkey) AS nd
      FROM orders GROUP BY 1
    ), monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             count(DISTINCT o_custkey) AS exact_custs
      FROM orders GROUP BY 1
    )
    SELECT strftime(m, '%Y-%m') AS month, exact_custs,
           0 AS err_band_5pct
    FROM monthly
    """,
)
def agg_sketch_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH MERGEABILITY — the property that makes approximate
    aggregation work at 100 TB: per-DAY HyperLogLog sketches
    (hll_sketch_agg) are UNIONED up to months (hll_union_agg) without
    touching raw rows again, exactly how a warehouse maintains
    distinct-count rollups incrementally (pre-aggregate each new
    partition once, merge sketches forever; a count(DISTINCT) rollup
    would have to re-scan every day). The oracle carries the exact
    monthly distinct count and the query reports the banded relative
    error of the merged estimate (same 5 %-band trick as
    agg_approx_distinct; Datasketches HLL at default lgK=12 sits well
    inside it), so the MERGED path's accuracy — not just the direct
    sketch's — is what the driver hash-checks."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"), "o_custkey"
    )
    daily = orders.groupBy("d").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
    )
    month_of = lambda c: F.date_format(F.date_trunc("month", F.col(c)), "yyyy-MM")  # noqa: E731
    monthly = daily.groupBy(month_of("d").alias("month")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = orders.groupBy(month_of("d").alias("e_month")).agg(
        F.count_distinct("o_custkey").alias("exact_custs")
    )
    return (
        monthly.join(exact, monthly.month == exact.e_month)
        .select(
            "month",
            "exact_custs",
            F.floor(
                F.abs(F.col("est") - F.col("exact_custs"))
                / F.col("exact_custs")
                / F.lit(0.05)
            )
            .cast("int")
            .alias("err_band_5pct"),
        )
    )


@register(
    "win_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour
    FROM events
    """,
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-TIME range frame: per user, how many of their events fell
    in the trailing hour (including this one) — the rolling-window
    rate metric behind throttles and anomaly baselines. A RANGE frame
    over epoch-µs integers, so the frame boundary is value-based (all
    rows within 1h, however many), not row-count-based — and
    bit-exact across engines, where an interval-typed frame would
    drag in calendar semantics. One user_id hash partitioning, the
    same Exchange every other per-user window here reuses."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_last_hour"),
    )


@register(
    "sub_exists",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F'
                        AND o.o_totalprice < 1000)
    """,
)
def sub_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — the remaining subquery
    surface beside IN (sub_in) and the correlated scalar
    (sub_correlated): customers with at least one large order and no
    cheap fallen-through order. Catalyst decorrelates both predicates
    into a left-semi and a left-anti join on the correlation key —
    i.e. the same physical shapes as join_semi/join_anti, chosen by
    the optimizer rather than spelled by the user, which is exactly
    the declarative contract worth pinning."""
    return _sql_on_views(
        spark, sf_dir, ["customer", "orders"],
        """
        SELECT c_custkey, c_acctbal FROM mrnej_customer c
        WHERE EXISTS (SELECT 1 FROM mrnej_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM mrnej_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'
                            AND o.o_totalprice < 1000)
        """,
    )


@register(
    "agg_max_by_min_by",
    oracle="""
    SELECT c_nationkey AS nationkey,
           arg_max(c_name,
                   lpad(CAST(CAST(round(c_acctbal * 100) AS BIGINT) + 1000000
                             AS VARCHAR), 8, '0') || '|' || c_name)
             AS richest,
           arg_min(c_name,
                   lpad(CAST(CAST(round(c_acctbal * 100) AS BIGINT) + 1000000
                             AS VARCHAR), 8, '0') || '|' || c_name)
             AS poorest,
           round(max(c_acctbal) - min(c_acctbal), 2) AS spread
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (SQL:2023 any_value-family ordered-arg
    aggregates): per nation, which customer holds the largest and
    smallest account balance. The comparand is a SORTABLE STRING —
    integer cents offset into non-negatives, zero-padded, with the
    name appended as tiebreak — because (a) float comparands would
    re-open the cross-engine rounding door and (b) ties would
    otherwise make arg_max nondeterministic (both engines pick an
    arbitrary winner; the embedded tiebreak makes the winner unique,
    the property a reproducible pipeline needs). One hash aggregate,
    map-side partials carry a single (key, candidate) pair per group
    — the whole point of max_by over the rank-window equivalent,
    which would shuffle every row to sort it."""
    cents = F.round(F.col("c_acctbal") * 100).cast("long") + 1_000_000
    key = F.concat(
        F.lpad(cents.cast("string"), 8, "0"), F.lit("|"), F.col("c_name")
    )
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_name"),
            F.col("c_acctbal"),
            key.alias("ordkey"),
        )
        .groupBy("nationkey")
        .agg(
            F.max_by("c_name", "ordkey").alias("richest"),
            F.min_by("c_name", "ordkey").alias("poorest"),
            F.round(F.max("c_acctbal") - F.min("c_acctbal"), 2).alias("spread"),
        )
    )


@register(
    "win_sliding_median",
    oracle="""
    SELECT event_id, user_id,
           median(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS med3
    FROM events
    """,
)
def win_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sliding median (trailing 3 rows) per user — the robust
    smoother dashboards ask for that approx-percentile windows can't
    answer exactly. Spark has no median window function, so the frame
    is materialized with collect_list over a bounded ROWS frame,
    array_sort'ed, and the median read positionally — the even case
    averages the two middle values with one IEEE division, which is
    correctly rounded and therefore engine-identical. The frame bound
    (3) caps per-row state, so the plan stays one window over the
    user_id hash partitioning — same Exchange class as lag/lead; an
    UNBOUNDED frame would instead need the two-heap streaming median,
    which is what rules collect_list out beyond small fixed frames."""
    frame = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    vals = F.array_sort(F.collect_list("value").over(frame))
    n = F.size(vals)
    med = (
        F.when(
            n % 2 == 1, F.element_at(vals, ((n + 1) / 2).cast("int"))
        ).otherwise(
            (
                F.element_at(vals, (n / 2).cast("int"))
                + F.element_at(vals, (n / 2).cast("int") + 1)
            )
            / 2.0
        )
    )
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .select("event_id", "user_id", med.alias("med3"))
    )


@register(
    "agg_string_agg_ordered",
    oracle="""
    SELECT c_nationkey AS nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
             AS segments,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG / string_agg — the report-formatting aggregate
    (SQL:2016 LISTAGG ... WITHIN GROUP). Unordered collect is
    nondeterministic under parallelism, so the plan sorts the
    COLLECTED SET before concatenation: collect_set → array_sort →
    concat_ws, all inside one hash aggregate; the distinct set is
    bounded by the segment alphabet, so partial aggregation keeps the
    shuffle at one small array per (nation, partition) rather than a
    row per customer."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias(
                "segments"
            ),
            F.count_distinct("c_mktsegment").alias("n_segments"),
        )
    )


@register(
    "sub_not_in",
    oracle="""
    WITH sub AS (
      SELECT CASE WHEN o_orderkey % 1000 = 7 THEN NULL
                  ELSE o_custkey END AS k
      FROM orders WHERE o_totalprice > 150000
    )
    SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n_rows
    FROM customer WHERE c_custkey NOT IN (SELECT k FROM sub)
    UNION ALL
    SELECT 'not_exists', CAST(count(*) AS BIGINT)
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey)
    """,
)
def sub_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS under NULLs — the three-valued-logic trap
    every SQL engine must honor: one NULL in the subquery makes
    ``x NOT IN (...)`` UNKNOWN for every non-matching x, so the
    NOT IN count collapses to 0 while NOT EXISTS (which never yields
    UNKNOWN) still counts the true anti-join. The DataFrame rewrite
    keeps it fully distributed: NOT EXISTS is a left_anti join on the
    key; NOT IN is the SAME anti-join count gated by a 1-row
    null-indicator aggregate carried on the broadcast scalar frame
    (CASE WHEN any_null THEN 0) — no collect, no cross join, and the
    null probe is a count aggregate that map-side-combines to one
    row. The two variants differing (2 rows, different counts) is
    exactly what the oracle hash certifies."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    sub = orders.filter(F.col("o_totalprice") > 150000).select(
        F.when(F.col("o_orderkey") % 1000 == 7, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("k")
    )
    anti_n = (
        customer.join(sub, customer.c_custkey == sub.k, "left_anti")
        .agg(F.count("*").alias("n_anti"))
    )
    nulls = sub.agg(
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_null")
    )
    both = attach_scalar_frame(anti_n, "n_anti", nulls, "n_null")
    not_in = both.select(
        F.lit("not_in").alias("variant"),
        F.when(F.col("n_null") > 0, F.lit(0).cast("long"))
        .otherwise(F.col("n_anti"))
        .alias("n_rows"),
    )
    not_exists = both.select(
        F.lit("not_exists").alias("variant"),
        F.col("n_anti").cast("long").alias("n_rows"),
    )
    return not_in.unionByName(not_exists)


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap partials (the Databricks /
    ClickHouse bitmap-rollup recipe): keys are bucketed into 32k-bit
    segments, each (group, bucket) OR-combines positions into one
    bitmap with bitmap_construct_agg, and the group total is the sum
    of per-bucket popcounts. Unlike count(DISTINCT) — which must
    shuffle every distinct (group, key) pair — the bitmap partial is
    a fixed-width OR-mergeable value, so map-side combine compresses
    arbitrarily many keys per bucket into 4 KB before the shuffle,
    and the SAME bitmaps are reusable for any later union/rollup of
    groups (OR is associative-commutative-idempotent). That
    mergeability is what count(DISTINCT) can never give an
    incremental pipeline; the oracle certifies exactness against the
    naive form."""
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("priority"),
            # bitmap_bit_position is 1-based ((v-1) % 32768): shift the
            # 0-based custkey to v = key+1 and bucket by (v-1) DIV 32768
            F.expr("o_custkey DIV 32768").alias("bucket"),
            F.expr("bitmap_bit_position(o_custkey + 1)").alias("pos"),
        )
        .groupBy("priority", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("priority")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_customers"))
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ), c AS (
      SELECT l_returnflag, cents, wt,
             sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents
                           RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum,
             sum(wt) OVER (PARTITION BY l_returnflag) AS total
      FROM w
    )
    SELECT l_returnflag,
           min(cents) / 100.0 AS weighted_median,
           CAST(min(total) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cum >= total GROUP BY 1
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median — percentile where every row counts with its
    weight (here: price weighted by quantity, the unit-economics
    median a pricing team actually wants). Not expressible with
    percentile_approx (no weights) nor a plain sort-and-middle. The
    cumulative weight runs over a RANGE frame keyed on the value, so
    tied values accumulate as one block and the crossing row is
    deterministic without any tiebreak column; all weights and money
    are int64 until the final display division. Plan: one hash
    Exchange on the group key, one sort within partitions — the same
    cost envelope as percentile_exact, and the window never sees more
    than one group's rows."""
    w = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    win_cum = (
        W.partitionBy("l_returnflag")
        .orderBy("cents")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    win_all = W.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "cents",
        F.sum("wt").over(win_cum).alias("cum"),
        F.sum("wt").over(win_all).alias("total"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            (F.min("cents") / 100.0).alias("weighted_median"),
            F.min("total").alias("total_weight"),
        )
    )


@register(
    "agg_mad_outliers",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), med AS (
      SELECT event_type, median(cents) AS med FROM e GROUP BY 1
    ), dev AS (
      SELECT e.event_type, e.cents, m.med, abs(e.cents - m.med) AS adev
      FROM e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           min(d.med) / 100.0 AS median_value,
           min(m.mad) / 100.0 AS mad_value,
           CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           count(*) AS n_events
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by Median Absolute Deviation — the
    z-score's breakdown-resistant sibling (anomaly_zscore's mean/σ
    are themselves dragged by the outliers they hunt; MAD's 50%
    breakdown point is not). Two exact-median passes: group median,
    then median of absolute deviations, flagging |x−med| >
    3·1.4826·MAD (the Gaussian-consistency constant, a FIXED literal
    on both engines). All medians run over int64 cents, so the
    even-count midpoint is a .5-exact double on both engines (ints
    below 2⁵³: interpolation formulas agree bit-for-bit); the per-
    group medians broadcast back — two shuffles on the group key
    total, and the second pass streams against broadcast scalars at
    any scale."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    med = e.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            (F.min("med") / 100.0).alias("median_value"),
            (F.min("mad") / 100.0).alias("mad_value"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & o_custkey AS b_and,
           o_orderkey | o_custkey AS b_or,
           xor(o_orderkey, o_custkey) AS b_xor,
           ~o_orderkey AS b_not,
           o_orderkey << 3 AS b_shl,
           o_orderkey >> 2 AS b_shr,
           CAST(bit_count(o_orderkey) AS BIGINT) AS b_popcount
    FROM orders WHERE o_orderkey % 37 = 0
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface: AND/OR/XOR/NOT, shifts, popcount —
    the primitives bitmap indexes, bloom filters and the
    agg_bitmap_distinct rollup are built from. Pure JVM codegen'd
    int64 ops; engine-neutral by construction (two's-complement int64
    everywhere). Shift semantics pinned: Spark's shiftleft wraps at
    64 like DuckDB's << for in-range shifts; popcount of a negative
    value counts the two's-complement bits on both engines."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & o_custkey").alias("b_and"),
        F.expr("o_orderkey | o_custkey").alias("b_or"),
        F.expr("o_orderkey ^ o_custkey").alias("b_xor"),
        F.expr("~o_orderkey").alias("b_not"),
        F.expr("shiftleft(o_orderkey, 3)").alias("b_shl"),
        F.expr("shiftright(o_orderkey, 2)").alias("b_shr"),
        F.expr("bit_count(o_orderkey)").cast("long").alias("b_popcount"),
    )


@register(
    "agg_boolean_aggs",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE value > 50) AS n_high,
           CAST(CASE WHEN bool_and(value >= 0) THEN 1 ELSE 0 END AS BIGINT)
             AS all_nonneg,
           CAST(CASE WHEN bool_or(value > 95) THEN 1 ELSE 0 END AS BIGINT)
             AS any_extreme,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def agg_boolean_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface — count_if / bool_and (EVERY) /
    bool_or (ANY), the predicates-as-aggregates every SQL dialect
    grew: 'how many high-value events, are all values sane, did any
    cross the alarm line'. All three fold in the partial aggregate
    (a boolean and a count per group in flight), so the shuffle
    carries O(groups) bytes; emitted as 0/1 BIGINT because engines
    disagree on boolean column binary encodings more than on
    integers."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("count_if(value > 50)").alias("n_high"),
        F.when(F.expr("bool_and(value >= 0)"), 1).otherwise(0)
        .cast("long")
        .alias("all_nonneg"),
        F.when(F.expr("bool_or(value > 95)"), 1).otherwise(0)
        .cast("long")
        .alias("any_extreme"),
        F.count("*").alias("n"),
    )


_URL_SYNTH_SQL = """
      SELECT doc_id,
             CASE WHEN doc_id % 11 < 6 THEN 'https://' ELSE 'http://' END
             || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
             || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
             || '.example.com/docs/' || CAST(doc_id % 400 AS VARCHAR)
             || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
             || CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed&utm_medium=rss'
                     ELSE '' END AS raw_url
      FROM documents
"""


@register(
    "fn_url_parse",
    oracle=f"""
    WITH u AS ({_URL_SYNTH_SQL})
    SELECT doc_id,
           regexp_extract(raw_url, '^(https?)://', 1) AS protocol,
           regexp_extract(raw_url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(raw_url, '^https?://[^/]+([^?]*)', 1) AS path,
           nullif(regexp_extract(raw_url, '\\?(.*)$', 1), '') AS query,
           nullif(regexp_extract(raw_url, '[?&]utm_source=([^&]*)', 1), '')
             AS utm_source
    FROM u
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-component extraction surface: `parse_url` (protocol, host,
    path, query, and a single query parameter) over the same
    deterministic raw-URL synthesis dedup_url_canonical collapses —
    the structured first step of referrer analytics, domain-level
    crawl budgeting, and UTM attribution.

    The engine side is the real JVM `parse_url` expression (one narrow
    projection, codegen'd, zero shuffle, missing parts are NULL); the
    oracle reproduces each component with anchored regexps, which
    doubles as a spec of what parse_url returns on these URLs (query
    without '?', host without path, parameter value only). At any
    scale this is a map-only pass."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.when(F.col("doc_id") % 11 < 6, F.lit("https://")).otherwise("http://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(""),
        F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 400).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(""),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("?utm_source=feed&utm_medium=rss"),
        ).otherwise(""),
    )
    u = docs.select("doc_id", raw.alias("raw_url"))
    return u.select(
        "doc_id",
        F.parse_url("raw_url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("raw_url", F.lit("HOST")).alias("host"),
        F.parse_url("raw_url", F.lit("PATH")).alias("path"),
        F.parse_url("raw_url", F.lit("QUERY")).alias("query"),
        F.parse_url("raw_url", F.lit("QUERY"), F.lit("utm_source")).alias(
            "utm_source"
        ),
    )


def _pareto_cum_cents(per_key: DataFrame, key_col: str) -> DataFrame:
    """Distributed Pareto running sum over a (key, cents) frame ordered
    by (cents DESC, key): the classic TWO-LEVEL prefix sum with NO
    partition-less window anywhere — 256 value-range chunks of cents
    (monotone along the sort order, so chunk-then-key order IS the
    global order), per-chunk PARTITIONED cumsum windows, and chunk
    offsets from a bounded broadcast triangle join over the 256-row
    chunk-total ladder. Adds ``cum_cents`` (exact int64,
    chunking-invariant: any monotone chunk rule yields the same value)
    and ``total`` (1-row scalar attach). Shared by win_cumulative_share
    and pipeline_revenue_abc_report; skew caveat and the quantile-
    boundary production fix are documented at win_cumulative_share."""
    tot = per_key.agg(F.sum("cents").cast("long").alias("total"))
    rng = per_key.agg(
        F.max("cents").cast("long").alias("_cmax"),
        F.min("cents").cast("long").alias("_cmin"),
    )
    chunked = attach_scalar_frame(per_key, key_col, rng, "_cmax").withColumn(
        "_chunk",
        F.expr("CAST((_cmax - cents) * 256 DIV (_cmax - _cmin + 1) AS INT)"),
    )
    w = W.partitionBy("_chunk").orderBy(F.col("cents").desc(), key_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    local = chunked.withColumn("_cum_in", F.sum("cents").over(w).cast("long"))
    totals = chunked.groupBy("_chunk").agg(F.sum("cents").alias("_csum"))
    prior = totals.select(
        F.col("_chunk").alias("_pc"), F.col("_csum").alias("_ps")
    )
    offsets = (
        totals.join(F.broadcast(prior), F.col("_pc") < F.col("_chunk"), "left")
        .groupBy("_chunk")
        .agg(F.coalesce(F.sum("_ps"), F.lit(0)).cast("long").alias("_offset"))
    )
    ranked = local.join(F.broadcast(offsets), "_chunk").withColumn(
        "cum_cents", (F.col("_offset") + F.col("_cum_in")).cast("long")
    )
    return attach_scalar_frame(ranked, key_col, tot, "total")


@register(
    "win_cumulative_share",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cents) AS BIGINT) AS total FROM per_part
    ), ranked AS (
      SELECT l_partkey, cents,
             CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey) AS BIGINT)
               AS cum_cents
      FROM per_part
    )
    SELECT l_partkey, cents, cum_cents,
           round(CAST(cum_cents AS DOUBLE) / t.total, 6) AS cum_share,
           CASE WHEN round(CAST(cum_cents AS DOUBLE) / t.total, 6) <= 0.8
                  THEN 'A'
                WHEN round(CAST(cum_cents AS DOUBLE) / t.total, 6) <= 0.95
                  THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked, tot t
    WHERE l_partkey % 50 = 0
    """,
)
def win_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis: parts ranked by revenue with running
    cumulative share, classified A (first 80 % of revenue), B (to
    95 %), C (tail) — the inventory-policy and "which 20 % of SKUs
    carry the business" readout.

    The fact table collapses to ONE int64-cents row per part BEFORE
    any ordering, and the Pareto running sum is the classic TWO-LEVEL
    distributed prefix sum (r11: this retired the plan's former
    |parts|-frame global window from the GLOBALWIN whitelist — the
    part dimension is catalog-sized, which grows): each part is
    assigned one of 256 value-range chunks of cents (chunk =
    (cmax−cents)·256 DIV (cmax−cmin+1), monotone along the
    (cents DESC, partkey) order, so chunk-then-key order IS the
    global order; min/max come from a 1-row scalar attach), each
    chunk cumsums under its own PARTITIONED window, and chunk offsets
    are the exclusive prefix of the 256-row chunk-total ladder via a
    bounded broadcast triangle join (the sample_weighted_systematic
    idiom). Skew caveat: value-range chunking degrades to one chunk
    only if all parts earn identical revenue (quantile boundaries are
    the production fix; revenue sums are diffuse). Cumulative cents
    stay exact int64 and are chunking-invariant — ANY monotone chunk
    rule yields the same cum_cents, so the oracle is unchanged. The
    share is ONE rounded division, and the A/B/C cut compares the
    ROUNDED share so the class boundary cannot straddle a ulp. Ties
    rank by (cents DESC, partkey) in both engines; the emitted sample
    is every 50th part (the frame is corpus-wide)."""
    per_part = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("pc").cast("long").alias("cents"))
    )
    ranked = _pareto_cum_cents(per_part, "l_partkey")
    share = F.round(F.col("cum_cents").cast("double") / F.col("total"), 6)
    return ranked.filter(F.col("l_partkey") % 50 == 0).select(
        "l_partkey",
        "cents",
        "cum_cents",
        share.alias("cum_share"),
        F.when(share <= 0.8, F.lit("A"))
        .when(share <= 0.95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


@register(
    "pipeline_revenue_abc_report",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cents) AS BIGINT) AS total FROM per_part
    ), ranked AS (
      SELECT l_partkey, cents,
             CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey) AS BIGINT)
               AS cum_cents
      FROM per_part
    ), classed AS (
      SELECT l_partkey, cents,
             CASE WHEN round(CAST(cum_cents AS DOUBLE) / t.total, 6) <= 0.8
                    THEN 'A'
                  WHEN round(CAST(cum_cents AS DOUBLE) / t.total, 6) <= 0.95
                    THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked, tot t
    )
    SELECT abc_class, p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM classed JOIN part ON l_partkey = p_partkey
    GROUP BY abc_class, p_brand
    """,
)
def pipeline_revenue_abc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED warehouse pipeline (VERDICT r10 item 8's third row,
    next to pipeline_corpus_curate / pipeline_user_journey): revenue
    rollup -> distributed Pareto classify -> dimension enrichment ->
    ABC x brand report, ONE Catalyst plan with an end-to-end oracle.

    Stages and the existing operators they fuse: `agg_hash`'s per-part
    int64-cents rollup; `win_cumulative_share`'s two-level Pareto
    cumsum (the SHARED _pareto_cum_cents helper — no partition-less
    window); `join_broadcast`'s dimension enrichment, applied at the
    ROLLED-UP grain (|parts| rows join the part dim, never the fact
    stream — the naive chain enriches facts first and pays a
    fact-sized join); a bounded (3 x |brands|)-cell report aggregate.

    FUSION ECONOMICS (asserted in tests/test_relational.py): the fact
    table feeds ONE rollup partitioning reused by the whole classify
    chain; enrichment is a BroadcastHashJoin against the part dim; the
    composed plan's exchange count is strictly below the sum of the
    standalone plans it fuses. The oracle states the IDENTICAL Pareto
    semantics with DuckDB's plain global window - cum_cents is
    chunking-invariant, so both plans agree bit-for-bit."""
    per_part = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("pc").cast("long").alias("cents"))
    )
    ranked = _pareto_cum_cents(per_part, "l_partkey")
    share = F.round(F.col("cum_cents").cast("double") / F.col("total"), 6)
    classed = ranked.select(
        "l_partkey",
        "cents",
        F.when(share <= 0.8, F.lit("A"))
        .when(share <= 0.95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    brand = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    return (
        classed.join(brand, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("abc_class", "p_brand")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


@register(
    "win_ratio_to_report",
    oracle="""
    WITH per AS (
      SELECT n_name,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    )
    SELECT n_name, cents,
           round(CAST(cents AS DOUBLE)
                 / sum(cents) OVER (), 6) AS share,
           round(CAST(cents AS DOUBLE)
                 / max(cents) OVER (), 6) AS vs_top
    FROM per
    """,
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT (Oracle/Redshift's report-share analytic): each
    nation's revenue as a share of the grand total and relative to
    the leader — the % -of-total column every report ends with.

    The facts fold to ONE int64-cents row per nation FIRST; the
    report scalars (grand total, leader) are then a 1-row aggregate
    of that bounded frame attached back via the unfoldable-scalar-key
    broadcast join — NO window at all, partition-parallel end to end
    (r11: this retired the plan's former empty-frame sum/max OVER ()
    from the GLOBALWIN whitelist; running those over raw orders was
    never on the table, but even the dimension-sized single-partition
    WindowExec is unnecessary when the frame folds to one row).
    Shares are single rounded divisions of exact int64s."""
    per = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name", F.round(F.col("o_totalprice") * 100).cast("long").alias("pc")
        )
        .groupBy("n_name")
        .agg(F.sum("pc").cast("long").alias("cents"))
    )
    scalars = per.agg(
        F.sum("cents").cast("long").alias("_tot"),
        F.max("cents").cast("long").alias("_top"),
    )
    return attach_scalar_frame(per, "n_name", scalars, "_tot").select(
        "n_name",
        "cents",
        F.round(F.col("cents").cast("double") / F.col("_tot"), 6).alias("share"),
        F.round(F.col("cents").cast("double") / F.col("_top"), 6).alias("vs_top"),
    )


@register(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE round(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                           AS DOUBLE) / (l_linenumber - 1) / 100, 6) END
             AS price_per_prev_line,
           CASE WHEN CAST(l_quantity AS BIGINT) = 0 THEN NULL
                ELSE CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     // CAST(l_quantity AS BIGINT) END AS cents_per_unit,
           try_cast(CASE WHEN l_orderkey % 3 = 0
                         THEN 'not-a-number'
                         ELSE CAST(l_orderkey AS VARCHAR) END AS BIGINT)
             AS parsed_key
    FROM lineitem WHERE l_orderkey % 31 = 0
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: `try_divide` / `try_cast` (and
    the DIV-by-zero guard) — the functions that keep a 100 TB batch
    job from dying at row 3 trillion on one malformed record. Under
    ANSI mode (Spark 4's default) plain division by zero and bad
    casts THROW; the try_* forms return NULL instead, which is the
    production posture for dirty data: quarantine by predicate, don't
    crash the stage. The oracle spells the same semantics with
    explicit CASE guards (DuckDB's `/` returns inf rather than
    throwing — a genuine cross-engine semantic gap the try_* wrapper
    normalizes away). Map-only projection, zero shuffles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 31 == 0
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(cents.cast("double"), F.col("l_linenumber") - 1) / 100, 6
        ).alias("price_per_prev_line"),
        F.when(
            F.col("l_quantity").cast("long") != 0,
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT)"
                " DIV CAST(l_quantity AS BIGINT)"
            ),
        ).alias("cents_per_unit"),
        F.try_to_number(
            F.when(
                F.col("l_orderkey") % 3 == 0, F.lit("not-a-number")
            ).otherwise(F.col("l_orderkey").cast("string")),
            F.lit("999999999999"),
        ).cast("long").alias("parsed_key"),
    )


@register(
    "agg_product_compound",
    oracle="""
    WITH pct AS (
      SELECT l_orderkey, l_linenumber,
             CAST(100 - CAST(round(l_discount * 100) AS BIGINT) AS DOUBLE)
               / CAST(100.0 AS DOUBLE) AS keep_frac
      FROM lineitem WHERE l_orderkey % 40 = 0
    ), per_order AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             list_reduce(list(keep_frac ORDER BY l_linenumber, keep_frac),
                         (a, b) -> a * b) AS prod
      FROM pct GROUP BY 1
    )
    SELECT l_orderkey, n_lines,
           round(prod, 6) AS keep_fraction,
           round(1.0 - prod, 6) AS effective_discount
    FROM per_order
    """,
)
def agg_product_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT aggregate — the one arithmetic fold SQL never
    standardized, needed whenever factors COMPOUND: stacked discounts
    (this demo: per order, the surviving fraction Π(1−dᵢ)), chained
    FX conversions, sequential survival/retention probabilities.

    Spark has no product aggregate, and the textbook exp(Σ ln)
    rewrite is DOUBLY nondeterministic: ln/exp carry a cross-engine
    ulp AND the hash-agg sum folds in partition order. Both engines
    instead fold the factors with an ORDERED left-to-right multiply:
    collect per order, sort by (line number, factor) — the fixture's
    line numbers REPEAT, and an ambiguous tie order re-associates the
    fold by 1 ulp in ~10% of groups (caught live); never raw collect
    order —
    then a·x step by step — every step is one correctly-rounded IEEE
    multiply executed in the same sequence in Spark's `aggregate`
    lambda and DuckDB's `list_reduce`, so the raw doubles are
    bit-identical with NO tolerance needed (the factors 0.90..1.00
    enter exactly as int/100.0, one rounded division each). Shuffle
    carries one small value per line; the fold is O(lines per group)
    — the generic recipe for any bounded-group product at 100 TB
    (unbounded groups: log-sum with a documented tolerance instead)."""
    pct = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 40 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                (100 - F.round(F.col("l_discount") * 100).cast("long")) / 100.0
            ).alias("keep_frac"),
        )
    )
    per_order = pct.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("l_linenumber", "keep_frac"))
                ),
                lambda s: s.keep_frac,
            ),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ).alias("prod"),
    )
    return per_order.select(
        "l_orderkey",
        "n_lines",
        F.round("prod", 6).alias("keep_fraction"),
        F.round(1.0 - F.col("prod"), 6).alias("effective_discount"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS flag,
           coalesce(l_linestatus, '<all>') AS status,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() / GROUPING_ID() — the disambiguation surface every
    CUBE/ROLLUP consumer needs: without it, a NULL in the output
    cannot be told apart as "this column was aggregated away" vs
    "the data value was NULL". gid encodes the aggregation mask
    (bit per column), and the display labels coalesce through it.

    Plan-wise this is agg_cube's Expand + hash agg (each input row
    fans to 4 grouping sets map-side, partials combine before the
    shuffle); the gid is computed from the Expand's grouping bits —
    zero extra cost over the cube itself. Both engines emit the same
    bit order (left column = high bit, the SQL standard's
    GROUPING_ID definition)."""
    li = load_table(spark, sf_dir, "lineitem")
    gid = (
        F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
    ).cast("long")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(gid.alias("gid"), F.count("*").cast("long").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("status"),
            "gid",
            "n",
        )
    )


@register(
    "agg_table_checksum",
    oracle="""
    WITH h AS (
      SELECT CAST(concat('0x', substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' || o_orderpriority || '|'
               || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
             ), 1, 11)) AS BIGINT) AS h13
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(h13) AS BIGINT) AS checksum,
           CAST(min(h13) AS BIGINT) AS h_min,
           CAST(max(h13) AS BIGINT) AS h_max
    FROM h
    """,
)
def agg_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orderless whole-table checksum — the migration/replication
    parity handshake ("does the copy match the source?") run after
    every engine swap, backfill, or CDC resync: each row folds its
    business columns into a canonical string, hashes, and the SUM of
    hashes (order-independent, partition-independent) plus count and
    min/max fingerprint the table in one number each.

    Everything is exact integer math: a 44-bit md5 prefix per row,
    so the int64 sum holds to ~10⁵ rows headroom-free here and a
    100 TB deployment upgrades the sum to decimal(38) (needs
    log2(n)+44 bits ≈ 84 at 10¹² rows — still exact, but see the
    128-bit→double conversion caveat on feature_standardize: compare
    checksums as DECIMAL STRINGS, never cast to double). Money is canonicalized to cents
    BEFORE hashing — hashing a float's string is the classic false
    mismatch. ONE scan, ONE 4-value aggregate, map-side combined."""
    o = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderpriority"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
    )
    h13 = F.conv(F.substring(F.md5(canon), 1, 11), 16, 10).cast("long")
    return o.select(h13.alias("h13")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("h13").cast("long").alias("checksum"),
        F.min("h13").cast("long").alias("h_min"),
        F.max("h13").cast("long").alias("h_max"),
    )


@register(
    "fn_variant_json",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"meta": {"type": "' || event_type || '", "uid": '
             || CAST(user_id AS VARCHAR) || '}, "vals": ['
             || json_extract(props, '$.k') || ', '
             || CAST(CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS VARCHAR)
             || '], "flag": '
             || CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END || '}'
               AS doc
      FROM events WHERE event_id % 17 = 0
    )
    SELECT event_id,
           json_extract_string(doc, '$.meta.type') AS vtype,
           CAST(json_extract(doc, '$.meta.uid') AS BIGINT) AS uid,
           CAST(json_extract(doc, '$.vals[1]') AS BIGINT) AS v2,
           CAST(json_extract(doc, '$.flag') AS BOOLEAN) AS flag
    FROM j
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT semi-structured type (Spark 4's headline ingestion
    feature, the open-source twin of Snowflake/Databricks VARIANT):
    `parse_json` turns a JSON document into a typed binary VARIANT
    once at ingest, and `try_variant_get` extracts typed paths WITHOUT
    re-parsing the string per access — the schema-on-read answer for
    payloads whose shape drifts too fast for a struct schema.

    The fixture synthesizes a nested document (object + array + bool)
    per event from fixture columns — identically in the oracle, which
    walks the SAME string with DuckDB's JSON path functions, so every
    typed extraction (string, int, array index, boolean) is checked
    against an independent JSON implementation. Map-only projection,
    zero shuffles; at scale VARIANT's win is decode-once columnar
    storage (shredded access instead of per-query string parsing)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    k = F.get_json_object("props", "$.k").cast("long")
    doc = F.concat(
        F.lit('{"meta": {"type": "'),
        F.col("event_type"),
        F.lit('", "uid": '),
        F.col("user_id").cast("string"),
        F.lit('}, "vals": ['),
        k.cast("string"),
        F.lit(", "),
        (k * 2).cast("string"),
        F.lit('], "flag": '),
        F.when(F.col("event_id") % 2 == 0, F.lit("true")).otherwise("false"),
        F.lit("}"),
    )
    v = ev.select("event_id", F.parse_json(doc).alias("v"))
    return v.select(
        "event_id",
        F.try_variant_get("v", "$.meta.type", "string").alias("vtype"),
        F.try_variant_get("v", "$.meta.uid", "long").alias("uid"),
        F.try_variant_get("v", "$.vals[1]", "long").alias("v2"),
        F.try_variant_get("v", "$.flag", "boolean").alias("flag"),
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (`|>`, Spark 4.0 / the ZetaSQL-GoogleSQL
    pipeline form): the query reads top-to-bottom as a chain of
    table-to-table stages — the SQL surface converging on what the
    DataFrame API always was, and increasingly the dialect analysts
    paste in. Same Catalyst plan as the classic form (the parser
    desugars stages before analysis — zero runtime cost, verified by
    the oracle being the classic-syntax twin); this entry pins that
    the engine's SQL front-end accepts the dialect."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "pipe_lineitem"
    )
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |> AGGREGATE count(*) AS n,
                     sum(CAST(l_quantity AS BIGINT)) AS total_qty
           GROUP BY l_returnflag
        |> SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                  CAST(total_qty AS BIGINT) AS total_qty
        """
    )


@register(
    "fn_string_collation",
    oracle="""
    WITH mixed AS (
      SELECT c_nationkey,
             CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer
    )
    SELECT c_nationkey,
           CAST(count(DISTINCT seg) AS BIGINT) AS n_binary,
           CAST(count(DISTINCT lower(seg)) AS BIGINT) AS n_ci
    FROM mixed GROUP BY 1
    """,
)
def fn_string_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): comparison/grouping under
    UNICODE_CI treats 'BUILDING' and 'building' as ONE value at the
    ENGINE level — no lower() normalization sprinkled through every
    predicate, and unlike lower() it is locale-correct for the
    full Unicode case-folding table. The fixture mixes case by key
    parity; the case-sensitive (UTF8_BINARY) distinct count then
    reads 2× the collated one wherever both casings occur — the gap
    IS the feature. Oracle approximates CI with lower(), identical on
    this ASCII fixture (the divergence cases — ß/SS, dotted İ — are
    exactly why the engine-level collation exists). Plain hash-agg
    shuffle on the nation key."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
        ).otherwise(F.lower("c_mktsegment")).alias("seg"),
    )
    return c.groupBy("c_nationkey").agg(
        F.count_distinct("seg").cast("long").alias("n_binary"),
        F.count_distinct(F.collate("seg", "UNICODE_CI")).cast("long").alias(
            "n_ci"
        ),
    )


@register(
    "win_nth_value",
    oracle="""
    SELECT o_custkey, n_orders, second_cents, third_cents FROM (
      SELECT o_custkey,
             CAST(count(*) OVER w AS BIGINT) AS n_orders,
             nth_value(cents, 2) OVER w AS second_cents,
             nth_value(cents, 3) OVER w AS third_cents,
             row_number() OVER w AS rn
      FROM (
        SELECT o_custkey, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_custkey % 50 = 0
      )
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY cents DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
    ) WHERE rn = 1
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value — the window function the first/last pair can't
    fake: "the customer's SECOND- and THIRD-largest order" (runner-up
    analysis, second-bid auction pricing, medalists). Needs the FULL
    partition frame (unbounded both ways): under the default
    running frame nth_value silently returns NULL until row n has
    been seen — the classic nth_value bug, dodged explicitly here.
    One row emitted per customer via rn=1 over the SAME window
    (Exchange and sort shared across all four functions); int-cents
    money, ties ordered by (cents DESC, orderkey) — a total key.
    NULLs where the customer has fewer than n orders are the
    semantics, not an error."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 50 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("cents").desc(), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w_rn = W.partitionBy("o_custkey").orderBy(F.col("cents").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            F.count("*").over(w).cast("long").alias("n_orders"),
            F.nth_value("cents", 2).over(w).alias("second_cents"),
            F.nth_value("cents", 3).over(w).alias("third_cents"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "agg_percentile_weighted",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ), c AS (
      SELECT l_returnflag, cents, wt,
             sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents
                           RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum,
             sum(wt) OVER (PARTITION BY l_returnflag) AS total
      FROM w
    )
    SELECT l_returnflag,
           min(CASE WHEN 4 * cum >= total THEN cents END) / 100.0 AS wp25,
           min(CASE WHEN 2 * cum >= total THEN cents END) / 100.0 AS wp50,
           min(CASE WHEN 4 * cum >= 3 * total THEN cents END) / 100.0 AS wp75,
           CAST(min(total) AS BIGINT) AS total_weight
    FROM c GROUP BY 1
    """,
)
def agg_percentile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles at arbitrary p (here the quartile trio) —
    the full generalization of agg_weighted_median, what
    percentile_approx cannot weight: each value counts with its
    quantity, so a 1000-unit line moves the quartile 1000× more than
    a 1-unit line (the demand-curve / token-weighted-length readout).

    Same exact machinery as the median: ONE RANGE-framed cumulative
    weight per group (the value-keyed frame folds ties into one
    block, so no tiebreak column exists to disagree on), then ALL
    three crossings read from the SAME pass as conditional minima —
    p enters only through the integer inequality 4·cum ≥ p·4·total
    (no float p, no interpolation; lower-crossing convention
    documented). Adding a percentile adds one CASE, never a
    shuffle."""
    w = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    win = (
        W.partitionBy("l_returnflag")
        .orderBy("cents")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    c = w.select(
        "l_returnflag",
        "cents",
        F.sum("wt").over(win).alias("cum"),
        F.sum("wt").over(W.partitionBy("l_returnflag")).alias("total"),
    )
    return c.groupBy("l_returnflag").agg(
        (
            F.min(F.when(4 * F.col("cum") >= F.col("total"), F.col("cents")))
            / 100.0
        ).alias("wp25"),
        (
            F.min(F.when(2 * F.col("cum") >= F.col("total"), F.col("cents")))
            / 100.0
        ).alias("wp50"),
        (
            F.min(
                F.when(4 * F.col("cum") >= 3 * F.col("total"), F.col("cents"))
            )
            / 100.0
        ).alias("wp75"),
        F.min("total").cast("long").alias("total_weight"),
    )


# --- MAP-type function surface --------------------------------------------------


@register(
    "fn_map",
    oracle="""
    WITH per AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    )
    SELECT lang,
           string_agg(source, ',' ORDER BY source) AS src_keys,
           string_agg(CAST(n AS VARCHAR), ',' ORDER BY source) AS doc_counts,
           CAST(count(*) FILTER (n >= 5) AS BIGINT) AS n_big,
           CAST(coalesce(max(CASE WHEN source = 'src0' THEN n END), 0)
                AS BIGINT) AS src0_docs
    FROM per GROUP BY lang
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type function surface (§2.4 completeness — array/json/
    variant/struct all have rows; the map column type didn't):
    builds a source→doc-count map per language with
    `map_from_entries` over a SORTED entry list (determinism: map
    iteration order is construction order in Spark, so the entries
    are totally ordered first), then exercises `map_keys`,
    `map_values`, `map_filter` (HOF over maps), and `element_at`
    (missing-key → NULL → coalesce 0).

    Keys/values emit as comma-JOINED STRINGS, not arrays: the
    hash-compare layer stringifies object columns, and numpy's array
    repr ≠ a Python list repr — a false mismatch the joined form
    designs away (same reason the oracle uses ORDER BY'd string_agg,
    DuckDB's construction-order map equivalent).

    Scale: one (lang, source) map-side-combined agg, then a ≤|langs|
    row map build — the map is bounded by the source dimension, never
    by corpus volume."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n")
    )
    m = per.groupBy("lang").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("source", "n")))
        ).alias("m")
    )
    return m.select(
        "lang",
        F.array_join(F.map_keys("m"), ",").alias("src_keys"),
        F.array_join(
            F.transform(F.map_values("m"), lambda v: v.cast("string")), ","
        ).alias("doc_counts"),
        F.size(F.map_filter("m", lambda k, v: v >= 5)).cast("long").alias("n_big"),
        F.coalesce(F.element_at("m", F.lit("src0")), F.lit(0))
        .cast("long")
        .alias("src0_docs"),
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (each key kept
    min(multiplicity-left, multiplicity-right) times), the bag
    semantics SQL mandates and `intersect()` silently discards. On a
    duplicate-rich key (o_custkey appears once per order) the ALL/
    DISTINCT difference is observable, which is the point of the row.

    Scale: Spark plans intersectAll as one aggregate per side plus a
    join on (value, count) with a generate to re-expand — one shuffle
    per side on the intersect key, no pairwise term."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return a.intersectAll(b)


@register(
    "agg_hll_sketch_gate",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           CAST(1 AS BIGINT) AS within_2pct,
           CAST(1 AS BIGINT) AS merged_within_2pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_hll_sketch_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL surface (Spark 3.5+ `hll_sketch_agg` /
    `hll_union_agg`) with its accuracy claim as a hash-checked gate —
    the same promotion move as sim_knn_recall_gate: the sketch
    ESTIMATE itself is emitted only through two integer booleans, so
    the DuckDB oracle (exact distinct + literal 1s) red-flags any
    drift. Gates per group: (a) |est − exact|·50 ≤ exact (within 2 %;
    lgK=12 gives ~1.6 % RSE) and (b) the estimate of the UNION of
    per-month partial sketches is within the same 2 % of exact — the
    MERGEABILITY property that makes sketch rollups work (partial
    aggregation at 100 TB: month shards sketch independently, the
    union is metadata-sized; union estimates may differ from the
    direct sketch by a few values, so the gate is accuracy, not
    bit-equality).

    Scale: two hash aggs (direct + per-month partials, both map-side
    combined to sketch bytes), one O(groups×months) union rollup;
    the exact countDistinct is the gate's truth term and costs one
    Expand shuffle at fixture scale (at 100 TB you'd gate offline on
    a sample; the sketch path alone is the production query)."""
    orders = load_table(spark, sf_dir, "orders")
    direct = orders.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey"))
        .cast("long")
        .alias("est_direct"),
        F.countDistinct("o_custkey").cast("long").alias("n_exact"),
    )
    merged = (
        orders.groupBy(
            "o_orderstatus", F.month("o_orderdate").alias("__m")
        )
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .groupBy("o_orderstatus")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("est_merged")
        )
    )
    return (
        direct.join(merged, "o_orderstatus")
        .select(
            "o_orderstatus",
            "n_exact",
            F.when(
                F.abs(F.col("est_direct") - F.col("n_exact")) * 50
                <= F.col("n_exact"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("within_2pct"),
            F.when(
                F.abs(F.col("est_merged") - F.col("n_exact")) * 50
                <= F.col("n_exact"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("merged_within_2pct"),
        )
    )


# --- quantified comparisons (ANY / ALL) ------------------------------------------


@register(
    "sub_any_all",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
    ), s AS (
      SELECT s_nationkey, CAST(round(s_acctbal * 100) AS BIGINT) AS sb
      FROM supplier
    )
    SELECT c_custkey, c_name, c_nationkey AS nationkey, bal_cents,
           bal_cents > ANY (SELECT sb FROM s
                            WHERE s.s_nationkey = c.c_nationkey) AS gt_any
    FROM c
    WHERE bal_cents > ALL (SELECT sb FROM s
                           WHERE s.s_nationkey = c.c_nationkey)
    """,
)
def sub_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries — `x > ALL (...)` / `x > ANY
    (...)` (SQL:1992 §8.7), correlated per nation: customers whose
    balance beats EVERY same-nation supplier's, annotated with the
    ANY flag. Spark SQL has no quantified-predicate syntax, so this
    row IS the documented rewrite a Spark migration applies:
    x > ALL(S) ⟺ x > max(S) with the vacuous-truth case (S = ∅ →
    TRUE), x > ANY(S) ⟺ x > min(S) with (S = ∅ → FALSE) — one
    groupwise (max, min, count) aggregate LEFT-joined back, instead
    of the per-row re-scan a naive correlated evaluation implies. The
    DuckDB oracle runs the REAL `> ALL` / `> ANY` syntax, so the row
    proves the rewrite equivalent, empty groups included. Money
    compared in int64 cents (both engines quantize before any
    comparison — never compare raw doubles across engines).

    Scale: the subquery side collapses to ONE ≤|nations|-row
    aggregate broadcast to the probe — the rewrite turns a correlated
    O(rows·|S|) scan into a broadcast hash join; fact rows never
    shuffle."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").alias("nationkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .select(
            F.col("s_nationkey").alias("nationkey"),
            F.round(F.col("s_acctbal") * 100).cast("long").alias("sb"),
        )
        .groupBy("nationkey")
        .agg(
            F.max("sb").alias("mx"),
            F.min("sb").alias("mn"),
            F.count("*").cast("long").alias("cnt"),
        )
    )
    j = cust.join(F.broadcast(sup), "nationkey", "left")
    return (
        j.filter(F.col("mx").isNull() | (F.col("bal_cents") > F.col("mx")))
        .select(
            "c_custkey",
            "c_name",
            "nationkey",
            "bal_cents",
            (
                F.col("cnt").isNotNull()
                & (F.col("bal_cents") > F.col("mn"))
            ).alias("gt_any"),
        )
    )


# --- interval coalescing (merge overlapping ranges) ---------------------------------


@register(
    "win_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts)
               + ((CAST(round(value * 100) AS BIGINT) % 120) + 1)
                 * 60000000 AS e
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775808)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), isl AS (
      SELECT user_id, s, e,
             CAST(sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
      FROM flagged
    )
    SELECT user_id, island,
           CAST(min(s) AS BIGINT) AS start_us,
           CAST(max(e) AS BIGINT) AS end_us,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM isl GROUP BY user_id, island
    """,
)
def win_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval COALESCE — merge overlapping/touching ranges per key
    into maximal islands (the packed-interval problem: SQL folklore
    as "gaps and islands over ranges", Itzik Ben-Gan's classic): each
    event opens a validity interval [ts, ts + (1..120 min)] and the
    op emits one row per maximal merged span with its member count —
    the range analogue of win_gaps_and_islands (which handles
    SEQUENCES) and the inverse of join_interval_overlap (which FINDS
    overlaps; this REMOVES them).

    The two-window rewrite is the scalable classic: a running
    max(end) over rows strictly before the current one flags island
    starts (strict s > cummax ⇒ touching intervals merge), a running
    sum over the flags numbers the islands, one hash agg closes them.
    ALL INTEGER: epoch-µs bounds, interval length derived from cents
    (both engines derive the identical series); BOTH windows order by
    the same (s, event_id) TOTAL order — numbering the islands by a
    merely-per-(s,e) order would let a tied flagged/unflagged row
    pair swap across engines and shift an island id. The -2⁶³ literal
    seeds the first row's coalesce in both engines identically.

    Scale: two window passes + one agg over the SAME user_id hash
    partitioning — the Exchange is planned once (sort-only second
    pass); no self-join, no explosion: O(rows) regardless of overlap
    structure, which is exactly why the window form beats the
    interval-self-join formulation at 100 TB."""
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + (
                F.pmod(F.round(F.col("value") * 100).cast("long"), F.lit(120))
                + 1
            )
            * 60_000_000
        ).alias("e"),
    )
    prev_end = F.max("e").over(
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(
            F.col("s")
            > F.coalesce(prev_end, F.lit(-9223372036854775808)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    isl = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island")
        .over(
            W.partitionBy("user_id")
            .orderBy("s", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("island"),
    )
    return isl.groupBy("user_id", "island").agg(
        F.min("s").cast("long").alias("start_us"),
        F.max("e").cast("long").alias("end_us"),
        F.count("*").cast("long").alias("n_intervals"),
    )


# --- 2-D skyline (Pareto front) ------------------------------------------------------


@register(
    "win_skyline_pareto",
    oracle="""
    WITH p AS (
      SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT)
               AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part
    ), w AS (
      SELECT p_partkey, price_cents, size,
             max(size) OVER (ORDER BY price_cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS mx_cheaper,
             max(size) OVER (ORDER BY price_cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS mx_le
      FROM p
    )
    SELECT p_partkey, price_cents, size
    FROM w
    WHERE NOT (mx_le > size)
      AND (mx_cheaper IS NULL OR mx_cheaper < size)
    """,
)
def win_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE / Pareto front (Börzsönyi, Kossmann & Stocker,
    ICDE'01): parts not dominated on (price ↓, size ↑) — "no other
    part is both cheaper-or-equal and larger, with one strict" — the
    multi-criteria shortlist operator (SQL:202x SKYLINE OF proposals)
    that a naive implementation writes as an O(n²) NOT EXISTS
    self-join.

    The sort-based rewrite is two RANGE windows over the price order:
    max(size) over strictly-cheaper rows (RANGE ... 1 PRECEDING —
    range, not rows, so price TIES are excluded from "cheaper") and
    max(size) over price-≤ rows; dominated ⟺ mx_cheaper ≥ size OR
    mx_le > size (the latter catches a same-price strictly-larger
    twin; exact duplicates survive together, the standard skyline
    convention). ALL INTEGER cents/sizes — the dominance booleans can
    never sit on a float boundary.

    Scale: the window is partition-less but DIMENSION-SIZED (parts —
    whitelisted); for a fact-sized input the same plan pre-aggregates
    max(size) per distinct price first (value-domain frame) and runs
    the running max over THAT — the rewrite stays one sort, never the
    O(n²) self-join."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    w_cheaper = (
        W.orderBy("price_cents").rangeBetween(W.unboundedPreceding, -1)
    )
    w_le = W.orderBy("price_cents").rangeBetween(W.unboundedPreceding, 0)
    w = p.select(
        "p_partkey",
        "price_cents",
        "size",
        F.max("size").over(w_cheaper).alias("mx_cheaper"),
        F.max("size").over(w_le).alias("mx_le"),
    )
    return w.filter(
        ~(F.col("mx_le") > F.col("size"))
        & (F.col("mx_cheaper").isNull() | (F.col("mx_cheaper") < F.col("size")))
    ).select("p_partkey", "price_cents", "size")


@register(
    "fn_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           len(list_filter(embedding, x -> abs(x) > 2)) > 0 AS has_big,
           len(list_filter(embedding, x -> NOT (x < 3))) = 0 AS all_lt3,
           round(list_sum(list_transform(
             list_slice(list_sort(embedding, 'DESC'), 1, 3),
             x -> CAST(x AS DOUBLE))), 4) AS top3_sum
    FROM embeddings
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (§2.6 completeness beside fn_array's
    aggregate/zip_with): `filter`, `exists`, `forall`, and a
    sort-desc/slice/fold chain — the Catalyst HOF surface that keeps
    per-row array work JVM-side where a naive port would reach for a
    Python UDF. All four run inside whole-stage codegen; DuckDB's
    list_* lambdas are the oracle twins. The top-3 fold casts each
    element to double and left-folds in the sorted order, identical
    in both engines; one round for display."""
    emb = load_table(spark, sf_dir, "embeddings")
    desc3 = F.slice(F.sort_array("embedding", asc=False), 1, 3)
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias(
            "n_pos"
        ),
        F.exists("embedding", lambda x: F.abs(x) > 2).alias("has_big"),
        F.forall("embedding", lambda x: x < 3).alias("all_lt3"),
        F.round(
            F.aggregate(
                desc3, F.lit(0.0), lambda a, x: a + x.cast("double")
            ),
            4,
        ).alias("top3_sum"),
    )


def hll_intersection_estimate(
    spark: SparkSession, sf_dir: str, exact_truth: bool = False
) -> DataFrame:
    """Sketch-based set-INTERSECTION estimate via inclusion–exclusion —
    |A∩B| ≈ est(A) + est(B) − est(A∪B) from three HLL sketches, the
    standard audience-overlap / cross-segment query when both sides
    are too large to intersect exactly. HLL supports union natively
    (lossless merge) but NOT intersection; inclusion–exclusion is the
    textbook workaround. This is the PRODUCTION form: by default it
    returns (est_a, est_b, est_u, est_inter) from the two map-side
    sketches alone — sketch bytes shuffle, never custkeys, so the
    exchange is metadata-sized at any data scale.

    exact_truth=True (the basket_cap opt-in pattern, VERDICT r12
    item 7) additionally computes the exact n_a / n_b / n_inter —
    TWO distinct-shuffles plus an equi-join, linear in |keys| — and
    the within-10%-of-union gate boolean. That arm exists for the
    registered gate row's fixture-scale truth terms; a 100 TB caller
    leaves it off."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    sk = (
        a.select(F.hll_sketch_agg("o_custkey").alias("sk_a"))
        .crossJoin(b.select(F.hll_sketch_agg("o_custkey").alias("sk_b")))
        .select(
            F.hll_sketch_estimate("sk_a").cast("long").alias("est_a"),
            F.hll_sketch_estimate("sk_b").cast("long").alias("est_b"),
            F.hll_sketch_estimate(
                F.hll_union("sk_a", "sk_b")
            )
            .cast("long")
            .alias("est_u"),
        )
    )
    if not exact_truth:
        return sk.select(
            "est_a",
            "est_b",
            "est_u",
            (F.col("est_a") + F.col("est_b") - F.col("est_u")).alias(
                "est_inter"
            ),
        )
    exact = (
        a.distinct()
        .join(b.distinct(), "o_custkey", "inner")
        .agg(F.count("*").cast("long").alias("n_inter_exact"))
        .crossJoin(a.agg(F.countDistinct("o_custkey").cast("long").alias("n_a")))
        .crossJoin(b.agg(F.countDistinct("o_custkey").cast("long").alias("n_b")))
    )
    return exact.crossJoin(sk).select(
        "n_a",
        "n_b",
        "n_inter_exact",
        F.when(
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_u"))
                - F.col("n_inter_exact")
            )
            * 10
            <= F.col("est_u"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("inter_within_10pct_of_union"),
    )


@register(
    "agg_hll_intersection_gate",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderstatus = 'O'),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderstatus = 'F')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
           CAST((SELECT count(*) FROM a JOIN b USING (o_custkey)) AS BIGINT)
             AS n_inter_exact,
           CAST(1 AS BIGINT) AS inter_within_10pct_of_union
    """,
)
def agg_hll_intersection_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for hll_intersection_estimate: runs the production
    sketch path WITH its opt-in exact-truth arm (exact_truth=True) so
    the estimate's error claim is hash-checkable — the
    inclusion–exclusion estimate lands within 10 % of |A∪B| of the
    exact intersection (lgK=12 → ~1.6 % RSE per term, ~3σ headroom on
    three terms). The exact n_a/n_b/n_inter are the hash-checked
    truth terms; the claim is one integer-cross-multiplied boolean so
    no estimate value ever reaches the hash.

    Scale: the two per-side sketches build map-side (sketch bytes
    shuffle, never custkeys); the union merges the SAME two sketches
    (no third scan). The exact intersection is the GATE's truth term
    at fixture scale only — production callers use the default
    sketch-only form (SCALE.md row: metadata-sized shuffle)."""
    return hll_intersection_estimate(spark, sf_dir, exact_truth=True)


@register(
    "agg_percentile_disc",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_quantity, 0) AS BIGINT) AS qty,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY round(l_quantity, 0)) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ), p AS (SELECT unnest([25, 50, 75, 95]) AS pct)
    SELECT grp, CAST(pct AS BIGINT) AS pct, CAST(qty AS BIGINT) AS value_disc
    FROM v JOIN p ON v.rn = (v.n * p.pct + 99) // 100
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard PERCENTILE_DISC (discrete — returns an ACTUAL data
    value, the element at rank ceil(p·n), never an interpolation) per
    group at p ∈ {.25, .5, .75, .95} — the inventory/PII-safe
    counterpart of agg_percentile_exact's continuous R-7 quantiles
    (a discrete percentile of, say, transaction amounts is guaranteed
    to be a real observed amount). Both engines select via the SAME
    rank arithmetic — rn = ceil(p·n) as pure integers
    ((n·pct + 99) DIV 100) over one partition-sorted window — so the
    definition cannot drift between quantile_disc dialects. One
    window sort per group; the 4 percent levels ride an IN-ROW
    explode+filter (whole-stage-codegen, no join node — a broadcast
    spine here would plan as a BNLJ, which the census gate rejects);
    output O(groups × 4)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round("l_quantity", 0).cast("long").alias("qty"),
    )
    w = W.partitionBy("grp").orderBy("qty")
    v = li.select(
        "grp",
        "qty",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("grp")).alias("n"),
    )
    return (
        v.withColumn(
            "pct",
            F.explode(F.array(*[F.lit(x) for x in (25, 50, 75, 95)])),
        )
        .filter(F.expr("rn = (n * pct + 99) div 100"))
        .select(
            "grp",
            F.col("pct").cast("long").alias("pct"),
            F.col("qty").alias("value_disc"),
        )
    )


# --- count-min sketch (round 13) -----------------------------------------------

# engine-neutral CMS geometry: depth 4 hash rows x width 1024 counters.
# h_i(k) = ((k * A_i + B_i) mod P) mod W with P prime and A_i < 1e9 so
# k*A_i stays far inside int64 through sf100 custkeys (~1.5e8 * 1e9 =
# 1.5e17 < 2^63) — both engines evaluate the identical integer chain,
# so the SKETCH ITSELF is bit-reproducible, not merely gated
_CMS_W = 1024
_CMS_P = 1_000_000_007
_CMS_A = [387_420_489, 362_880_007, 268_435_459, 129_140_163]
_CMS_B = [97, 5_741, 314_159, 2_718_281]
_CMS_TOPK = 10


@register(
    "agg_count_min_sketch",
    oracle=f"""
    WITH keys AS (SELECT o_custkey AS k FROM orders),
    counters AS (
      SELECT d.d,
             ((k * ({_CMS_A!r}::BIGINT[])[d.d + 1]
               + ({_CMS_B!r}::BIGINT[])[d.d + 1]) % {_CMS_P}) % {_CMS_W}
               AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM keys, (SELECT unnest(range(0, 4)) AS d) d
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_exact
      FROM keys GROUP BY k
      ORDER BY n_exact DESC, k LIMIT {_CMS_TOPK}
    )
    SELECT e.k AS custkey, e.n_exact,
           CAST(min(c.c) AS BIGINT) AS n_cms,
           CAST(min(c.c) - e.n_exact AS BIGINT) AS overestimate
    FROM exact e
    JOIN counters c
      ON c.bucket = ((e.k * ({_CMS_A!r}::BIGINT[])[c.d + 1]
                      + ({_CMS_B!r}::BIGINT[])[c.d + 1])
                     % {_CMS_P}) % {_CMS_W}
    GROUP BY e.k, e.n_exact
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J.Alg'05) — the
    mergeable frequency sketch beside the HLL cardinality family:
    a depth×width counter matrix where est(k) = min_d counter[d][h_d(k)],
    always an OVERestimate with error ≤ εN at probability 1−δ
    (w=1024 → ε≈2.7e-3, d=4 → δ≈1.8e-2). Unlike library sketches the
    hash rows here are plain integer affine maps evaluated identically
    in both engines, so the sketch, the estimates, and the per-key
    overestimate are all EXACT-hash-checked, not tolerance-gated —
    the same discipline as the minhash/simhash kernels.

    Plan: the counter build is one explode(4 depths) + groupBy(depth,
    bucket) — map-side combined into ≤ 4,096 counter rows no matter
    the input (the mergeable-rollup property: counters ADD across
    partitions/segments). The top-k probe arm recomputes exact counts
    (linear, the gate's truth term — production keeps only the 4,096
    counters) and looks its keys up via a broadcast join against the
    counters. Output: per heavy key, exact count, CMS estimate, and
    the non-negative overestimate."""
    keys = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("k")
    )
    a_arr = F.array(*[F.lit(a) for a in _CMS_A])
    b_arr = F.array(*[F.lit(b) for b in _CMS_B])
    bucket_of = lambda kcol, dcol: (  # noqa: E731 — shared hash chain
        (
            kcol * F.element_at(a_arr, dcol + 1)
            + F.element_at(b_arr, dcol + 1)
        )
        % _CMS_P
    ) % _CMS_W
    counters = (
        keys.withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(3))))
        .groupBy("d", bucket_of(F.col("k"), F.col("d")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    exact = (
        keys.groupBy("k")
        .agg(F.count("*").cast("long").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "k")
        .limit(_CMS_TOPK)
    )
    probes = exact.withColumn(
        "d", F.explode(F.sequence(F.lit(0), F.lit(3)))
    ).withColumn("bucket", bucket_of(F.col("k"), F.col("d")))
    return (
        probes.join(counters, ["d", "bucket"])
        .groupBy("k", "n_exact")
        .agg(F.min("c").cast("long").alias("n_cms"))
        .select(
            F.col("k").alias("custkey"),
            "n_exact",
            "n_cms",
            (F.col("n_cms") - F.col("n_exact")).cast("long").alias(
                "overestimate"
            ),
        )
    )
