"""Driver contract for the merchant_classification_spark engine.

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2 (plus the
beyond-reference training-data ops); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible query.

Column-name contract: every computed column is aliased identically in the
Spark code and the oracle SQL (the driver sorts columns by name before
hashing values).

Float determinism contract: any column that is AGGREGATED is made
integer-valued first (e.g. money → cents via round(x*100)) so sums are
exact in IEEE double regardless of aggregation order; divisions happen
after aggregation (deterministic given exact inputs). This keeps
Spark-vs-DuckDB value hashes bit-identical without rounding fudge.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from merchant_classification_spark.operators.relational import (
    accuracy_report,
    class_histogram,
    group_topk,
    histogram_bins,
    percentiles,
)
from merchant_classification_spark.sources import load_table

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# flagship: accuracy-style report (scan → project → filter → conditional →
# hash agg → ratio → sort), the reference's end-of-pipeline query shape
# (reference 02_merchcat_ml.py:522-530)
# ---------------------------------------------------------------------------


def q_flagship_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    pred = F.when(F.col("o_totalprice") > 200000.0, F.lit("F")).otherwise(F.lit("O"))
    df = orders.where(F.col("o_orderstatus") != "P").withColumn("pr_status", pred)
    return accuracy_report(df, "o_orderstatus", "pr_status", "o_orderpriority")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001 (driver smoke check: runs, ≥0 rows)."""
    return q_flagship_accuracy(spark, SF0001)


# ---------------------------------------------------------------------------
# relational operator queries (SURVEY.md §2.2-2.8)
# ---------------------------------------------------------------------------


def q_class_histogram(spark, sf_dir):
    # A1/O1: group-count + global sort
    return class_histogram(_t(spark, sf_dir, "orders"), "o_orderpriority")


def q_filter_project(spark, sf_dir):
    # P1/P2/P3: projection + null predicate + range predicate
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .filter(F.col("o_orderstatus").isNotNull())
        .where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0))
    )


def q_group_sum_avg(spark, sf_dir):
    # A1/A2/A3: multi-agg with exact-integer money (cents) for fp determinism
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.withColumn("price_cents", cents)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum("price_cents").alias("sum_price_cents"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_join_left_counts(spark, sf_dir):
    # J1: aggregate-to-fact left equi-join (counts ⋈ dim), reference shape
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("order_cnt"))
    return (
        counts.join(customer, counts.o_custkey == customer.c_custkey, "left")
        .select("o_custkey", "order_cnt", "c_mktsegment")
        .orderBy("o_custkey")
    )


def q_join_dim_chain(spark, sf_dir):
    # J2 scaled up: fact ⋈ broadcast dim chain, revenue per nation
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return (
        li.withColumn("rev_cents", cents)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


def q_window_percent_rank(spark, sf_dir):
    # W1 (deterministic order variant): per-class percentile
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
    )


def q_topk_per_group(spark, sf_dir):
    # W2/O3/P5: top-5 line items per return flag
    li = _t(spark, sf_dir, "lineitem")
    out = group_topk(
        li,
        ["l_returnflag"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        5,
        keep_rank=True,
    )
    return out.select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rank"
    )


def q_sort_limit(spark, sf_dir):
    # O2/O4: global sort + limit with a total order
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q_case_when_bands(spark, sf_dir):
    # E10/E13: CASE WHEN banding + count
    orders = _t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000.0, "low")
        .when(F.col("o_totalprice") < 200000.0, "mid")
        .otherwise("high")
    )
    return (
        orders.withColumn("band", band)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("band")
    )


def q_percentiles_quantity(spark, sf_dir):
    # A4: exact global quantiles over an integer-valued measure
    li = _t(spark, sf_dir, "lineitem")
    return percentiles(li, "l_quantity", [0.05, 0.25, 0.5, 0.75, 0.95], exact=True)


def q_histogram_bins(spark, sf_dir):
    # A5: engine-side histogram
    return histogram_bins(_t(spark, sf_dir, "orders"), "o_totalprice", 50000.0)


def q_set_ops(spark, sf_dir):
    # beyond-reference set ops: intersect/except/union over nation-key sets
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 7500.0)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 7500.0)
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cust.intersect(supp).withColumn("op", F.lit("both"))
    cust_only = cust.exceptAll(supp).withColumn("op", F.lit("cust_only"))
    return both.unionByName(cust_only).orderBy("op", "nationkey")


def q_json_extract(spark, sf_dir):
    # extended surface: JSON prop extraction + agg over events
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("event_type")
    )


def q_clean_narrative(spark, sf_dir):
    # E1-E7 basic-steps subset on documents (full date kernel is golden-
    # tested in pytest; DuckDB's RE2 can't run the backref date pattern)
    docs = _t(spark, sf_dir, "documents")
    basic = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "), r"\s+", " "
        )
    )
    return docs.select(
        "doc_id",
        F.md5(basic).alias("clean_md5"),
        F.length(basic).alias("clean_len"),
    ).orderBy("doc_id")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "flagship_accuracy": q_flagship_accuracy,
    "class_histogram": q_class_histogram,
    "filter_project": q_filter_project,
    "group_sum_avg": q_group_sum_avg,
    "join_left_counts": q_join_left_counts,
    "join_dim_chain": q_join_dim_chain,
    "window_percent_rank": q_window_percent_rank,
    "topk_per_group": q_topk_per_group,
    "sort_limit": q_sort_limit,
    "case_when_bands": q_case_when_bands,
    "percentiles_quantity": q_percentiles_quantity,
    "histogram_bins": q_histogram_bins,
    "set_ops": q_set_ops,
    "json_extract": q_json_extract,
    "clean_narrative": q_clean_narrative,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


ORACLES: dict[str, str] = {
    "flagship_accuracy": """
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN pr_status = o_orderstatus THEN 1 ELSE 0 END) AS BIGINT) AS predicted,
               count(*) AS total,
               CAST(sum(CASE WHEN pr_status = o_orderstatus THEN 1 ELSE 0 END) AS BIGINT)
                   / count(*) AS accuracy
        FROM (
            SELECT o_orderpriority, o_orderstatus,
                   CASE WHEN o_totalprice > 200000.0 THEN 'F' ELSE 'O' END AS pr_status
            FROM orders WHERE o_orderstatus <> 'P'
        )
        GROUP BY o_orderpriority
    """,
    "class_histogram": """
        SELECT o_orderpriority, count(*) AS count
        FROM orders GROUP BY o_orderpriority
    """,
    "filter_project": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders
        WHERE o_orderstatus IS NOT NULL
          AND o_orderstatus = 'F' AND o_totalprice > 100000.0
    """,
    "group_sum_avg": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               count(*) AS cnt,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) / count(*) AS avg_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "join_left_counts": """
        SELECT o_custkey, order_cnt, c_mktsegment
        FROM (SELECT o_custkey, count(*) AS order_cnt FROM orders GROUP BY o_custkey) t
        LEFT JOIN customer ON t.o_custkey = customer.c_custkey
    """,
    "join_dim_chain": """
        SELECT n_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "window_percent_rank": """
        SELECT o_orderkey, o_orderpriority,
               percent_rank() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS pct_rank
        FROM orders
    """,
    "topk_per_group": """
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               CAST(rank AS INTEGER) AS rank
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
            FROM lineitem
        ) WHERE rank <= 5
    """,
    "sort_limit": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "case_when_bands": """
        SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
                    WHEN o_totalprice < 200000.0 THEN 'mid'
                    ELSE 'high' END AS band,
               count(*) AS cnt
        FROM orders GROUP BY 1
    """,
    "percentiles_quantity": """
        SELECT quantile_cont(l_quantity, 0.05) AS q_005,
               quantile_cont(l_quantity, 0.25) AS q_025,
               quantile_cont(l_quantity, 0.5)  AS q_05,
               quantile_cont(l_quantity, 0.75) AS q_075,
               quantile_cont(l_quantity, 0.95) AS q_095
        FROM lineitem
    """,
    "histogram_bins": """
        SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin, count(*) AS count
        FROM orders GROUP BY 1
    """,
    "set_ops": """
        WITH cust AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 7500.0),
             supp AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 7500.0)
        SELECT nationkey, 'both' AS op FROM (SELECT nationkey FROM cust INTERSECT SELECT nationkey FROM supp)
        UNION ALL
        SELECT nationkey, 'cust_only' AS op FROM (SELECT nationkey FROM cust EXCEPT ALL SELECT nationkey FROM supp)
    """,
    "json_extract": """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(*) AS cnt
        FROM events GROUP BY event_type
    """,
    "clean_narrative": """
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                                       '\\s+', ' ', 'g'))) AS clean_md5,
               CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                                               '\\s+', ' ', 'g'))) AS INTEGER) AS clean_len
        FROM documents
    """,
}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
