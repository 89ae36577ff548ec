"""Relational operator surface of the reference, as DataFrame programs.

Each function takes (spark, sf_dir) and returns a DataFrame; every one has a
DuckDB oracle twin in __spark_entry__.py. The reference never calls a join
engine — its joins are positional pandas index tricks (SURVEY §2.3) — so the
Spark expression IS the semantics statement, cited per operator.

Float discipline: monetary aggregates are quantized (round(x*100)::bigint) in
both engines so value-hash comparison never touches raw doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation (SURVEY A1-A6 analog; TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity") * 100).cast("long").alias("sum_qty_q"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
            .cast("long")
            .alias("revenue_q"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def q_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi-join + grouped agg + top-k (J2/J4 + W3; TPC-H Q3 shape).

    customer is broadcast (small dim); orders-lineitem is the real shuffle
    join — at scale both sides bucket on the order key.
    """
    li, orders, cust = (
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
            .cast("long")
            .alias("revenue_q"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue_q"))
        .limit(3)
    )


def q_rollup_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group metrics + grand total — the reference's per-kb eval loop with
    an 'Across_all_kb' row (eval.py:66-129) is exactly rollup() (SURVEY A4)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice") * 100).cast("long").alias("total_q"),
        )
        .withColumn("o_orderstatus", F.coalesce("o_orderstatus", F.lit("ALL")))
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window — the make_query argsort (models.py:132-133, SURVEY W1):
    top-3 events per user by value, ties broken by event_id asc."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", F.round(F.col("value") * 100).cast("long").alias("value_q"), "rnk")
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window: running per-user event-value sum ordered by time
    (beyond the reference — needed by the querylog/metrics tables)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w) * 100).cast("long").alias("running_q"),
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the reference's set-overlap scoring
    (data_preprocessing.py:142-144, SURVEY J7/U2): customers that have at
    least one high-priority order."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — hard-negative mining make_closewrong
    (data_preprocessing.py:160-166, SURVEY J6): customers with no urgent
    order (non-empty at every sf, unlike no-orders-at-all)."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_dense_rank_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence unique indexing (kb_handler.py:15-26 unique_indexing,
    SURVEY J1/W5): assign dense ids to distinct part types by name order.
    Uses the scale-safe two-phase numbering (no global single-partition
    window) shared with the kb build."""
    from goldenretriever_spark.sources.kb import unique_ids

    part = _t(spark, sf_dir, "part")
    return unique_ids(part, "p_type", "type_id", start=1).select(
        "p_type", F.col("type_id").cast("long").alias("type_id")
    )


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of kbs (finetune/main.py:104, SURVEY U1) + dedup (P3): nation
    keys appearing as either customer or supplier nations."""
    cust, supp = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .union(supp.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


def q_filter_project_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project/rename/filter/default-fill pipeline (kb_handler.py:141-153,
    SURVEY P1/P2/P4/P7): events with null-safe props concat'd to type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isNotNull() & (F.col("value") > 0))
        .select(
            F.col("event_id"),
            F.when(
                F.col("props").isNull() | (F.col("props") == ""), F.col("event_type")
            )
            .otherwise(F.concat(F.col("event_type"), F.lit(" "), F.col("props")))
            .alias("processed_string"),
        )
    )


def q_grouping_sets_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rollup through a dim chain (region<-nation<-customer)."""
    cust, nation, region = (
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.avg("c_acctbal") * 100).cast("long").alias("avg_bal_q"),
        )
        .withColumn("r_name", F.coalesce("r_name", F.lit("ALL")))
        .withColumn("n_name", F.coalesce("n_name", F.lit("ALL")))
    )
