"""Core relational surface (SURVEY §2.B rows: scans, projection/
filter expressions, joins of every type, aggregation, grouping sets,
having/filter-clause, sort/limit/offset, set ops, subqueries, CTEs,
scalar functions, distinct, UDF).

Spark side is idiomatic DataFrame API (Catalyst plans: pushdown,
partial aggs, broadcast dims). Oracle side is DuckDB SQL over the same
parquet. Engine-parity rules applied throughout:

- integer SUM → ``CAST(... AS BIGINT)`` in DuckDB (it returns HUGEINT);
- ``ceil``/``floor`` → cast to DOUBLE (Spark returns BIGINT, DuckDB DOUBLE);
- window ranking funcs → cast to BIGINT (Spark INT vs DuckDB BIGINT);
- no double→int casts (Spark truncates, DuckDB rounds);
- LIMIT queries carry a unique tie-break key.

Scale notes are in each docstring: the declared plans broadcast
dimension tables (region/nation/supplier stay tiny at any SF), push
filters into the parquet scan, and aggregate partially before shuffle
— verified via .explain in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from igloo_spark.queries.registry import register, table


# --------------------------------------------------------------------------
# Aggregation (TPC-H Q1 style) — reference surface: GROUP BY + 8 aggs
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    "TPC-H Q1: full-scan filter + groupBy(2) + 8 aggregates (partial+final agg, pushdown filter)",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity) AS avg_qty,
           avg(l_extendedprice) AS avg_price,
           avg(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregation", "tpch"),
    bench=True,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Projection/filter expression language
# --------------------------------------------------------------------------
@register(
    "q02_filter_expressions",
    "expression surface: BETWEEN, IN, LIKE, CASE WHEN, COALESCE, NULLIF, IS NULL, CAST",
    """
    SELECT p_partkey,
           CASE WHEN p_size < 15 THEN 'small' WHEN p_size < 35 THEN 'medium' ELSE 'large' END AS size_class,
           coalesce(nullif(p_brand, 'Brand#11'), 'OTHER') AS brand_adj,
           CAST(p_size AS DOUBLE) * 2.5 AS scaled_size,
           (p_retailprice IS NOT NULL) AS has_price
    FROM part
    WHERE p_size BETWEEN 10 AND 40
      AND p_type LIKE '%A%'
      AND p_brand IN ('Brand#11','Brand#12','Brand#13','Brand#21','Brand#22','Brand#23')
      AND NOT (p_retailprice < 0)
    """,
    tags=("expressions",),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_size").between(10, 40)
            & F.col("p_type").like("%A%")
            & F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13", "Brand#21", "Brand#22", "Brand#23")
            & ~(F.col("p_retailprice") < 0)
        )
        .select(
            "p_partkey",
            F.when(F.col("p_size") < 15, "small")
            .when(F.col("p_size") < 35, "medium")
            .otherwise("large")
            .alias("size_class"),
            F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#11")), F.lit("OTHER")).alias("brand_adj"),
            (F.col("p_size").cast("double") * 2.5).alias("scaled_size"),
            F.col("p_retailprice").isNotNull().alias("has_price"),
        )
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    "TPC-H Q3: 3-way join + agg + top-10 (broadcast dim, TakeOrderedAndProject)",
    """
    SELECT l_orderkey,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("join", "tpch"),
    bench=True,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    "TPC-H Q5: 6-way join through region→nation→{customer,supplier}→orders→lineitem",
    """
    SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "tpch"),
    bench=True,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q06_revenue_change",
    "TPC-H Q6: tight scan-filter-agg, fully pushed to parquet",
    """
    SELECT sum(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("aggregation", "tpch"),
    bench=True,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q07_outer_join_counts",
    "LEFT OUTER join with null-side aggregation (customers without orders)",
    """
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customers_no_orders
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join",),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).cast("bigint").alias(
                "n_customers_no_orders"
            ),
        )
    )


@register(
    "q08_right_full_outer",
    "RIGHT and FULL OUTER join coverage via union of both shapes",
    """
    WITH r AS (
      SELECT 'right' AS join_kind, count(*) AS n,
             CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_left
      FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
    ), f AS (
      SELECT 'full' AS join_kind, count(*) AS n,
             CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_left
      FROM supplier FULL OUTER JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT * FROM r UNION ALL SELECT * FROM f
    """,
    tags=("join",),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")

    def side(kind: str) -> DataFrame:
        j = s.join(n, s.s_nationkey == n.n_nationkey, kind)
        return j.agg(
            F.lit(kind.split("_")[0]).alias("join_kind"),
            F.count("*").alias("n"),
            F.sum(F.when(F.col("s_suppkey").isNull(), 1).otherwise(0)).cast("bigint").alias("n_null_left"),
        ).select("join_kind", "n", "n_null_left")

    return side("right_outer").unionAll(side("full_outer"))


@register(
    "q09_semi_join",
    "LEFT SEMI join (EXISTS): orders having a high-quantity lineitem",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    tags=("join", "subquery"),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q10_anti_join",
    "LEFT ANTI join (NOT EXISTS): customers with no orders, by segment",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("join", "subquery"),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "q11_theta_join",
    "equi + non-equi (theta) join: suppliers richer than same-nation customers",
    """
    SELECT n_name, count(*) AS n_pairs
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
    tags=("join",),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "q12_cross_join",
    "CROSS JOIN: region × orderstatus grid with per-cell aggregate",
    """
    SELECT r_name, o_orderstatus, count(*) AS n
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    JOIN orders USING (o_orderstatus)
    GROUP BY r_name, o_orderstatus
    """,
    tags=("join",),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    o = table(spark, sf_dir, "orders")
    statuses = o.select("o_orderstatus").distinct()
    return (
        r.crossJoin(statuses)
        .join(o, "o_orderstatus")
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Advanced aggregation
# --------------------------------------------------------------------------
@register(
    "q13_stat_aggregates",
    "statistical aggs: stddev/var/corr/covar + count distinct",
    """
    SELECT n_nationkey AS nation,
           count(*) AS n,
           count(DISTINCT c_mktsegment) AS n_segments,
           avg(c_acctbal) AS avg_bal,
           stddev_samp(c_acctbal) AS sd_bal,
           var_samp(c_acctbal) AS var_bal,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal,
           corr(c_acctbal, CAST(c_custkey AS DOUBLE)) AS corr_bal_key,
           covar_samp(c_acctbal, CAST(c_custkey AS DOUBLE)) AS covar_bal_key
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    tags=("aggregation",),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    key_d = F.col("c_custkey").cast("double")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_nationkey").alias("nation"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.avg("c_acctbal").alias("avg_bal"),
            F.stddev_samp("c_acctbal").alias("sd_bal"),
            F.var_samp("c_acctbal").alias("var_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.corr(F.col("c_acctbal"), key_d).alias("corr_bal_key"),
            F.covar_samp(F.col("c_acctbal"), key_d).alias("covar_bal_key"),
        )
    )


@register(
    "q14_rollup_grouping",
    "ROLLUP with grouping() marker",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregation",),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.sum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q15_cube_grouping_sets",
    "CUBE aggregation (all grouping-set combinations)",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n, avg(o_totalprice) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregation",),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.avg("o_totalprice").alias("avg_price")
    )


@register(
    "q16_having_filter_clause",
    "HAVING + FILTER (WHERE ...) conditional aggregates",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           sum(o_totalprice) FILTER (WHERE o_totalprice > 100000) AS big_total
    FROM orders
    GROUP BY o_orderpriority
    HAVING count(*) > 10
    """,
    tags=("aggregation",),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.sum(F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))).alias("big_total"),
        )
        .filter(F.col("n") > 10)
    )


# --------------------------------------------------------------------------
# Sort / limit / offset, set ops, distinct
# --------------------------------------------------------------------------
@register(
    "q17_sort_limit_offset",
    "multi-key ORDER BY with NULLS LAST + LIMIT/OFFSET (unique tie-break)",
    """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part
    ORDER BY p_brand ASC NULLS LAST, p_retailprice DESC NULLS LAST, p_partkey ASC
    LIMIT 20 OFFSET 5
    """,
    tags=("sort",),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_brand", "p_retailprice")
        .orderBy(
            F.col("p_brand").asc_nulls_last(),
            F.col("p_retailprice").desc_nulls_last(),
            F.col("p_partkey").asc(),
        )
        .offset(5)
        .limit(20)
    )


@register(
    "q18_set_operations",
    "UNION ALL / INTERSECT / EXCEPT composition",
    """
    SELECT 'building_with_big_orders' AS src, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_totalprice > 150000
    )
    UNION ALL
    SELECT 'machinery_no_cheap_orders' AS src, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice < 50000
    )
    """,
    tags=("setops",),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    a = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .intersect(o.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("c_custkey")))
        .select(F.lit("building_with_big_orders").alias("src"), "c_custkey")
    )
    b = (
        c.filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey")
        .subtract(o.filter(F.col("o_totalprice") < 50000).select(F.col("o_custkey").alias("c_custkey")))
        .select(F.lit("machinery_no_cheap_orders").alias("src"), "c_custkey")
    )
    return a.unionAll(b)


@register(
    "q19_intersect_except_all",
    "INTERSECT ALL / EXCEPT ALL (bag semantics)",
    """
    SELECT 'ia' AS op, count(*) AS n FROM (
        SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
        INTERSECT ALL
        SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    )
    UNION ALL
    SELECT 'ea' AS op, count(*) AS n FROM (
        SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    )
    """,
    tags=("setops",),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    hi_q = li.filter(F.col("l_quantity") > 25).select("l_orderkey")
    hi_d = li.filter(F.col("l_discount") > 0.05).select("l_orderkey")
    ia = hi_q.intersectAll(hi_d).agg(F.lit("ia").alias("op"), F.count("*").alias("n")).select("op", "n")
    ea = hi_q.exceptAll(hi_d).agg(F.lit("ea").alias("op"), F.count("*").alias("n")).select("op", "n")
    return ia.unionAll(ea)


@register(
    "q20_distinct_dedup",
    "DISTINCT / dropDuplicates on a projection",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority, CAST(extract(year FROM o_orderdate) AS BIGINT) AS order_year
    FROM orders
    """,
    tags=("setops", "dedup"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderstatus",
        "o_orderpriority",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
    ).dropDuplicates()


# --------------------------------------------------------------------------
# Subqueries & CTEs
# --------------------------------------------------------------------------
@register(
    "q21_subqueries",
    "scalar subquery + IN subquery + correlated EXISTS together",
    """
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice >
                          (SELECT avg(o_totalprice) FROM orders))
      AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
    """,
    tags=("subquery",),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.queries.registry import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
          AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice >
                              (SELECT avg(o_totalprice) FROM orders))
          AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
        """
    )


@register(
    "q22_cte_top_supplier",
    "CTE (WITH) + scalar subquery over the CTE (TPC-H Q15 shape)",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN (
        SELECT supplier_no, total_revenue,
               rank() OVER (ORDER BY total_revenue DESC) AS rk
        FROM revenue
    ) r ON s_suppkey = supplier_no
    WHERE rk = 1
    """,
    tags=("subquery", "tpch"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.queries.registry import register_views

    register_views(spark, sf_dir, ["lineitem", "supplier"])
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN (
            SELECT supplier_no, total_revenue,
                   rank() OVER (ORDER BY total_revenue DESC) AS rk
            FROM revenue
        ) r ON s_suppkey = supplier_no
        WHERE rk = 1
        """
    )


# --------------------------------------------------------------------------
# Scalar functions
# --------------------------------------------------------------------------
@register(
    "q23_string_functions",
    "string function surface over documents",
    """
    SELECT doc_id,
           upper(lang) AS lang_up,
           lower(source) AS source_lo,
           trim(substring(text, 1, 20)) AS head20,
           concat_ws('|', lang, source) AS lang_source,
           replace(lang, 'e', 'E') AS lang_repl,
           length(text) AS text_len,
           lpad(lang, 5, '_') AS lang_pad,
           CAST(position('a' IN text) AS BIGINT) AS first_a,
           md5(lang) AS lang_md5,
           (text LIKE 'the%') AS starts_the,
           regexp_replace(lang, '[aeiou]', '*') AS lang_novowel
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("functions",),
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.lower("source").alias("source_lo"),
        F.trim(F.substring("text", 1, 20)).alias("head20"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.replace(F.col("lang"), F.lit("e"), F.lit("E")).alias("lang_repl"),
        F.length("text").cast("bigint").alias("text_len"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.instr(F.col("text"), "a").cast("bigint").alias("first_a"),
        F.md5("lang").alias("lang_md5"),
        F.col("text").like("the%").alias("starts_the"),
        F.regexp_replace("lang", "[aeiou]", "*").alias("lang_novowel"),
    )


@register(
    "q24_math_functions",
    "math function surface (cast ceil/floor to DOUBLE for parity)",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000.0) AS abs_diff,
           CAST(ceil(l_extendedprice) AS DOUBLE) AS price_ceil,
           CAST(floor(l_extendedprice) AS DOUBLE) AS price_floor,
           exp(l_discount) AS disc_exp,
           ln(l_extendedprice + 1.0) AS price_ln,
           log10(l_extendedprice + 1.0) AS price_log10,
           power(l_quantity, 2.0) AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS price_sign,
           sin(l_discount) AS disc_sin,
           cos(l_discount) AS disc_cos,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
    FROM lineitem
    WHERE l_orderkey < 500
    """,
    tags=("functions",),
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.filter(F.col("l_orderkey") < 500).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 1000.0).alias("abs_diff"),
        F.ceil(price).cast("double").alias("price_ceil"),
        F.floor(price).cast("double").alias("price_floor"),
        F.exp("l_discount").alias("disc_exp"),
        F.log(price + 1.0).alias("price_ln"),
        F.log10(price + 1.0).alias("price_log10"),
        F.pow(F.col("l_quantity"), 2.0).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.signum(price - 30000.0).cast("double").alias("price_sign"),
        F.sin("l_discount").alias("disc_sin"),
        F.cos("l_discount").alias("disc_cos"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@register(
    "q25_datetime_functions",
    "date/time surface: date_trunc, extract, last_day, datediff",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(extract(month FROM o_orderdate) AS BIGINT) AS mon,
           CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders
    WHERE o_orderkey < 1000
    """,
    tags=("functions",),
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mon"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp_ntz").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


@register(
    "q26_conditional_functions",
    "greatest/least/coalesce/nullif/CASE over two tables",
    """
    SELECT s_suppkey,
           greatest(s_acctbal, 0.0) AS bal_floor0,
           least(s_acctbal, 5000.0) AS bal_cap5k,
           coalesce(nullif(s_name, ''), 'unknown') AS name_clean,
           CASE WHEN s_acctbal < 0 THEN 'debt'
                WHEN s_acctbal < 1000 THEN 'low'
                ELSE 'high' END AS bal_band
    FROM supplier
    """,
    tags=("functions",),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("s_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias("name_clean"),
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("bal_band"),
    )


@register(
    "q27_capitalize_udf",
    "the reference's one registered UDF (crates/engine/src/lib.rs:64-144) over real data",
    """
    SELECT upper(lang) AS lang_cap, count(*) AS n
    FROM documents GROUP BY upper(lang)
    """,
    tags=("udf",),
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.functions import register_all_udfs

    register_all_udfs(spark)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("SELECT capitalize(lang) AS lang_cap, count(*) AS n FROM documents GROUP BY capitalize(lang)")


@register(
    "q28_exact_percentiles",
    "exact percentile_cont (approx variants are engine-specific, see q29)",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("aggregation",),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
    )


@register(
    "q29_approx_aggregates",
    "approx_count_distinct + approx percentile, hash-gated as "
    "within-error-bound booleans vs exact values (sketch internals are "
    "engine-specific; the bounds are the checkable surface)",
    """
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           quantile_cont(l_extendedprice, 0.5) AS exact_median_price,
           TRUE AS approx_orders_ok,
           TRUE AS approx_parts_ok,
           TRUE AS approx_median_ok
    FROM lineitem
    """,
    tags=("aggregation", "approx"),
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++/KLL sketch binaries differ per engine, so raw estimates
    can't hash-match an oracle. The hard driver signal instead: emit
    the EXACT values (oracle-reproducible) plus booleans asserting the
    sketch estimates land inside their documented error bounds (rsd
    2% → 5% gate on distinct counts; 1% on the median, accuracy
    10000). A drifting sketch flips a boolean → hash mismatch → red.
    Bounds match tests/test_properties.py::
    test_approx_sketches_within_error_bounds."""
    li = table(spark, sf_dir, "lineitem")
    both = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a_med"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median_price"),
    )
    return both.select(
        "exact_orders",
        "exact_parts",
        "exact_median_price",
        (F.abs(F.col("a_orders") - F.col("exact_orders")) / F.col("exact_orders") < 0.05)
        .alias("approx_orders_ok"),
        (F.abs(F.col("a_parts") - F.col("exact_parts")) / F.col("exact_parts") < 0.05)
        .alias("approx_parts_ok"),
        (
            F.abs(F.col("a_med") - F.col("exact_median_price"))
            / F.col("exact_median_price")
            < 0.01
        ).alias("approx_median_ok"),
    )


@register(
    "q72_returned_items",
    "TPC-H Q10 shape: revenue lost to returned items per customer/nation (top 20)",
    """
    SELECT c_custkey, c_name, n_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           any_value(c_acctbal) AS c_acctbal
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=("joins", "aggregation", "tpch"),
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join shuffles on the order key; customer and nation
    broadcast; the returnflag + date filters prune at the scans."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.any_value("c_acctbal").alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q73_customer_distribution",
    "TPC-H Q13 shape: distribution of customers by order count (incl. zero)",
    """
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    tags=("joins", "aggregation", "tpch"),
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeps order-less customers (count 0); two aggregation
    levels — the second groups on a tiny domain, so its shuffle carries
    one row per distinct count."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q74_large_volume_customers",
    "TPC-H Q18 shape: customers whose single order exceeds 150 total quantity",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    """,
    tags=("joins", "subqueries", "tpch"),
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING subquery is a semi-join on the order key — it reuses
    the same hash partitioning as the main lineitem join, so AQE plans
    one co-partitioned exchange, not two."""
    from igloo_spark.queries.registry import register_views

    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               sum(l_quantity) AS total_qty
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        """
    )


@register(
    "q75_global_sales_opportunity",
    "TPC-H Q22 shape: high-balance customers with no orders, by nation",
    """
    SELECT c_nationkey,
           count(*) AS numcust,
           sum(c_acctbal) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("subqueries", "aggregation", "tpch"),
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (broadcast single row) + anti join; the anti
    join's build side is just order keys — column-pruned to 8 bytes/row
    before the exchange."""
    from igloo_spark.queries.registry import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_nationkey,
               count(*) AS numcust,
               sum(c_acctbal) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
        """
    )


@register(
    "q04_order_priority",
    "TPC-H Q4 shape: correlated EXISTS semi join → priority counts",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    tags=("subqueries", "join", "tpch"),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted to the testdata schema (no commit/receipt
    dates, so the EXISTS probes large-quantity lines instead —
    reference test corpus has no Q4 either, cf. igloo-io/igloo
    crates/engine/tests). LeftSemi keeps orders un-duplicated; the
    probe side is column-pruned to the join key before the exchange.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp_ntz"))
        )
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
    )
