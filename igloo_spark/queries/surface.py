"""Long-tail SQL-surface coverage (SURVEY §2.B rows not yet exercised
by core/analytics): ILIKE, IS [NOT] DISTINCT FROM, NATURAL JOIN,
explicit GROUPING SETS, ARRAY_AGG, map construction, hash/hex
functions, split_part, epoch↔timestamp conversion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from igloo_spark.queries.registry import register, register_views, table


@register(
    "q51_ilike_distinct_from",
    "ILIKE + IS DISTINCT FROM / IS NOT DISTINCT FROM (null-safe compare)",
    """
    SELECT p_partkey,
           (p_type ILIKE '%steel%') AS is_steel,
           (p_brand IS DISTINCT FROM 'Brand#11') AS not_brand11,
           (nullif(p_brand, 'Brand#11') IS NOT DISTINCT FROM NULL) AS is_brand11_nullsafe
    FROM part
    WHERE p_partkey < 300
    """,
    tags=("expressions",),
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.col("p_type").ilike("%steel%").alias("is_steel"),
        F.expr("p_brand IS DISTINCT FROM 'Brand#11'").alias("not_brand11"),
        F.expr("nullif(p_brand, 'Brand#11') IS NOT DISTINCT FROM NULL").alias("is_brand11_nullsafe"),
    )


@register(
    "q52_grouping_sets",
    "explicit GROUPING SETS with mixed set shapes",
    """
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("aggregation",),
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "q53_array_agg",
    "ARRAY_AGG with deterministic (sorted) element order",
    """
    SELECT n_nationkey, list_sort(array_agg(s_suppkey)) AS supp_keys,
           count(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    tags=("aggregation", "arrays"),
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.sort_array(F.collect_list("s_suppkey")).alias("supp_keys"),
            F.count("*").alias("n_suppliers"),
        )
    )


@register(
    "q54_natural_using_join",
    "NATURAL JOIN + USING join resolution",
    """
    SELECT n_name, r_name FROM
        (SELECT n_regionkey AS regionkey, n_name FROM nation) n
        NATURAL JOIN
        (SELECT r_regionkey AS regionkey, r_name FROM region) r
    """,
    tags=("join",),
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["nation", "region"])
    return spark.sql(
        """
        SELECT n_name, r_name FROM
            (SELECT n_regionkey AS regionkey, n_name FROM nation) n
            NATURAL JOIN
            (SELECT r_regionkey AS regionkey, r_name FROM region) r
        """
    )


@register(
    "q55_map_construction",
    "map type construction + key access",
    """
    SELECT r_regionkey,
           map {'name': r_name}['name'][1] AS name_from_map
    FROM region
    """,
    tags=("arrays",),
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.create_map(F.lit("name"), F.col("r_name"))[F.lit("name")].alias("name_from_map"),
    )


@register(
    "q56_hash_hex_functions",
    "md5 / sha256 / hex digest surface",
    """
    SELECT r_regionkey,
           md5(r_name) AS name_md5,
           sha256(r_name) AS name_sha256,
           lower(to_hex(r_regionkey)) AS key_hex
    FROM region
    """,
    tags=("functions",),
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.md5("r_name").alias("name_md5"),
        F.sha2(F.col("r_name"), 256).alias("name_sha256"),
        F.lower(F.hex(F.col("r_regionkey"))).alias("key_hex"),
    )


@register(
    "q57_split_part_translate",
    "split_part / translate / reverse / repeat string ops",
    """
    SELECT doc_id,
           split_part(text, ' ', 2) AS second_word,
           translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
           reverse(lang) AS lang_rev,
           repeat(lang, 2) AS lang_x2
    FROM documents WHERE doc_id < 100
    """,
    tags=("functions",),
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_tr"),
        F.reverse("lang").alias("lang_rev"),
        F.repeat(F.col("lang"), 2).alias("lang_x2"),
    )


@register(
    "q58_epoch_roundtrip",
    "epoch seconds ↔ timestamp conversion (UTC-pinned)",
    """
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS ts_roundtrip
    FROM events WHERE event_id < 100
    """,
    tags=("functions", "events"),
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    epoch_s = F.col("ts").cast("long")
    return e.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        F.timestamp_seconds(epoch_s).cast("timestamp_ntz").alias("ts_roundtrip"),
    )
