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
    SELECT n_nationkey,
           array_to_string(list_sort(array_agg(s_suppkey)), ',') AS supp_keys,
           count(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    tags=("aggregation", "arrays"),
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The aggregate itself is ARRAY_AGG; the final projection serializes
    # the array deterministically (sorted, comma-joined) so the driver's
    # canonicalizer — which cannot sort raw list columns — can hash it.
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            # sort numerically FIRST, then stringify — lexicographic
            # sort of "10" < "2" would diverge from the oracle
            F.sort_array(F.collect_list("s_suppkey")).alias("_keys"),
            F.count("*").alias("n_suppliers"),
        )
        .select(
            "n_nationkey",
            F.array_join(F.col("_keys").cast("array<string>"), ",").alias("supp_keys"),
            "n_suppliers",
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
    "q59_higher_order_lambdas",
    "higher-order array functions: transform/filter/exists/forall/aggregate/zip_with",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           len(list_filter(embedding, x -> x > 2.5)) > 0 AS any_large,
           len(list_filter(embedding, x -> NOT (abs(x) < 100))) = 0 AS all_small,
           list_sum(CAST(embedding AS DOUBLE[])) AS vec_sum,
           list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS self_dot
    FROM embeddings WHERE vec_id < 200
    """,
    tags=("arrays", "lambdas"),
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's lambda expression surface (SURVEY §2.B array/struct row).

    All five run JVM-side inside whole-stage codegen — no Python UDF;
    at 100 TB this is the difference between a scan-bound job and a
    serialization-bound one.
    """
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.exists("embedding", lambda x: x > 2.5).alias("any_large"),
        F.forall("embedding", lambda x: F.abs(x) < 100).alias("all_small"),
        F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
        F.aggregate(F.zip_with(dbl, dbl, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x).alias(
            "self_dot"
        ),
    )


@register(
    "q60_posexplode",
    "posexplode: tokens with positions (explode with ordinality)",
    """
    WITH toks AS (
        SELECT doc_id, string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' ') AS ws
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(generate_subscripts(ws, 1) - 1 AS INT) AS pos,
           unnest(ws) AS word
    FROM toks
    """,
    tags=("arrays",),
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.split(F.regexp_replace(F.trim(F.col("text")), " +", " "), " ")
    return d.select("doc_id", F.posexplode(words).alias("pos", "word"))


@register(
    "q61_unpivot",
    "UNPIVOT / stack: wide metric columns to long (metric, value) rows",
    """
    SELECT l_orderkey, l_linenumber, metric, value FROM (
        UNPIVOT (
            SELECT l_orderkey, l_linenumber,
                   CAST(l_quantity AS DOUBLE) AS quantity,
                   CAST(l_extendedprice AS DOUBLE) AS extendedprice,
                   CAST(l_discount AS DOUBLE) AS discount,
                   CAST(l_tax AS DOUBLE) AS tax
            FROM lineitem WHERE l_orderkey < 100
        ) ON quantity, extendedprice, discount, tax INTO NAME metric VALUE value
    )
    """,
    tags=("reshape",),
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount", "tax"],
        "metric",
        "value",
    )


@register(
    "q62_try_arithmetic",
    "TRY_CAST / null-safe division (try_divide semantics)",
    """
    SELECT p_partkey,
           try_cast(p_brand AS INTEGER) AS brand_as_int,
           try_cast(substring(p_brand, 7, 2) AS INTEGER) AS brand_num,
           p_retailprice / nullif(p_size - p_size, 0) AS div_by_zero,
           p_retailprice / nullif(p_size, 0) AS per_size
    FROM part WHERE p_partkey < 200
    """,
    tags=("expressions",),
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.col("p_brand").try_cast("int").alias("brand_as_int"),
        F.substring("p_brand", 7, 2).try_cast("int").alias("brand_num"),
        F.try_divide(F.col("p_retailprice"), F.col("p_size") - F.col("p_size")).alias("div_by_zero"),
        F.try_divide(F.col("p_retailprice"), F.col("p_size")).alias("per_size"),
    )


@register(
    "q63_sequence_array_setops",
    "sequence generation + array_intersect/union/except (canonical sorted order)",
    """
    -- coalesce: DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
    SELECT p_partkey,
           coalesce(array_to_string(range(1, least(p_size, 8) + 1), ','), '') AS seq,
           coalesce(array_to_string(list_sort(list_intersect(range(1, least(p_size, 8) + 1), [2,3,5,8])), ','), '') AS inter,
           coalesce(array_to_string(list_sort(list_distinct(list_concat(range(1, least(p_size, 8) + 1), [2,3,5,8]))), ','), '') AS uni,
           coalesce(array_to_string(list_sort(list_filter(list_distinct(range(1, least(p_size, 8) + 1)),
                                 x -> NOT list_contains([2,3,5,8], x))), ','), '') AS diff
    FROM part WHERE p_partkey < 200
    """,
    tags=("arrays",),
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Set ops run on real arrays; the final projection serializes each
    # (numerically sorted, comma-joined) so the driver canonicalizer can
    # hash the result — see VERDICT r02 "What's wrong" #2.
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    seq = F.sequence(F.lit(1), F.least(F.col("p_size"), F.lit(8)))
    ref = F.array(*[F.lit(x) for x in (2, 3, 5, 8)])

    def _ser(arr):
        return F.array_join(arr.cast("array<string>"), ",")

    return p.select(
        "p_partkey",
        _ser(seq).alias("seq"),
        _ser(F.array_sort(F.array_intersect(seq, ref))).alias("inter"),
        _ser(F.array_sort(F.array_union(seq, ref))).alias("uni"),
        _ser(F.array_sort(F.array_except(seq, ref))).alias("diff"),
    )


@register(
    "q64_lateral_subquery",
    "correlated LATERAL subquery (per-customer aggregate applied lateral)",
    """
    SELECT c_custkey, o.n_orders, o.max_price
    FROM customer, LATERAL (
        SELECT count(*) AS n_orders, max(o_totalprice) AS max_price
        FROM orders WHERE o_custkey = c_custkey
    ) o
    WHERE c_custkey < 200
    """,
    tags=("join", "subquery"),
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, o.n_orders, o.max_price
        FROM customer, LATERAL (
            SELECT count(*) AS n_orders, max(o_totalprice) AS max_price
            FROM orders WHERE o_custkey = c_custkey
        ) o
        WHERE c_custkey < 200
        """
    )


@register(
    "q65_str_to_map",
    "str_to_map parsing + key extraction from encoded kv strings",
    """
    WITH enc AS (
        SELECT p_partkey, concat('brand:', p_brand, ',type:', p_type) AS kv
        FROM part WHERE p_partkey < 200
    )
    SELECT p_partkey, kv,
           string_split(list_filter(string_split(kv, ','), p -> starts_with(p, 'brand:'))[1], ':')[2] AS brand_val,
           string_split(list_filter(string_split(kv, ','), p -> starts_with(p, 'type:'))[1], ':')[2] AS type_val
    FROM enc
    """,
    tags=("functions",),
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    kv = F.concat(F.lit("brand:"), F.col("p_brand"), F.lit(",type:"), F.col("p_type"))
    m = F.str_to_map(kv, F.lit(","), F.lit(":"))
    return p.select(
        "p_partkey",
        kv.alias("kv"),
        m[F.lit("brand")].alias("brand_val"),
        m[F.lit("type")].alias("type_val"),
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
    # NTZ-safe: TIMESTAMP_NTZ→timestamp→long works for both flavors
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    return e.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        F.timestamp_seconds(epoch_s).cast("timestamp_ntz").alias("ts_roundtrip"),
    )


@register(
    "q68_pivot",
    "PIVOT: return-flag × line-status quantity matrix (df.groupBy().pivot())",
    """
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o,
           sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END) AS price_f,
           sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END) AS price_o
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregation",),
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational pivot. Explicit pivot values keep the plan static
    (no extra distinct-values job) — at 100 TB an implicit pivot first
    scans the fact table just to enumerate columns."""
    li = table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity").alias("qty"), F.sum("l_extendedprice").alias("price"))
    )
    return piv.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
        F.col("F_price").alias("price_f"),
        F.col("O_price").alias("price_o"),
    )


@register(
    "q69_recursive_cte",
    "WITH RECURSIVE month spine (0..35) left-joined to per-month order counts",
    """
    WITH RECURSIVE months(m) AS (
        SELECT 0 UNION ALL SELECT m + 1 FROM months WHERE m < 35
    )
    SELECT CAST(m AS BIGINT) AS month_offset,
           TIMESTAMP '1996-01-01 00:00:00' + INTERVAL (m) MONTH AS month_start,
           count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders
      ON date_trunc('month', o_orderdate) = TIMESTAMP '1996-01-01 00:00:00' + INTERVAL (m) MONTH
    GROUP BY m
    """,
    tags=("subqueries",),
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 UnionLoop). The recursion itself is a
    36-row driver-side spine — the fact table joins against it
    broadcast, so recursion depth never touches the big-data path."""
    from igloo_spark.queries.registry import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT 0 UNION ALL SELECT m + 1 FROM months WHERE m < 35
        )
        SELECT CAST(m AS BIGINT) AS month_offset,
               CAST(TIMESTAMP '1996-01-01 00:00:00' AS TIMESTAMP_NTZ) + make_interval(0, m) AS month_start,
               count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON date_trunc('MONTH', o_orderdate) = CAST(TIMESTAMP '1996-01-01 00:00:00' AS TIMESTAMP_NTZ) + make_interval(0, m)
        GROUP BY m
        """
    )


@register(
    "q70_edit_distance",
    "fuzzy matching: levenshtein over region-blocked nation-name pairs",
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 10
    """,
    tags=("functions", "text"),
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching, blocked on an equi-key so the pair
    space is bounded — the same blocked-self-join shape every fuzzy
    dedup uses at scale (block → pairwise distance → threshold)."""
    n = table(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            dist.cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= 10)
    )


@register(
    "q71_group_by_all",
    "GROUP BY ALL / ORDER BY ALL resolution sugar",
    """
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
    FROM lineitem GROUP BY ALL ORDER BY ALL
    """,
    tags=("aggregation",),
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    from igloo_spark.queries.registry import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY ALL ORDER BY ALL
        """
    )


@register(
    "q77_union_by_name",
    "schema-evolution union: unionByName with missing columns (old/new file generations)",
    """
    SELECT * FROM (
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 7 = 1
    )
    """,
    tags=("setops",),
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lakehouse schema-evolution union: a newer file generation
    has an extra column, the older one null-fills it. Positional union
    would silently misalign; by-name union is the correct primitive."""
    o = table(spark, sf_dir, "orders")
    new_gen = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    old_gen = o.filter(F.col("o_orderkey") % 7 == 1).select("o_orderkey", "o_totalprice")
    return new_gen.unionByName(old_gen, allowMissingColumns=True)


@register(
    "q78_regexp_extract_all",
    "regexp_extract_all: every number token from priority+date text → joined string + count",
    """
    SELECT o_orderkey,
           array_to_string(regexp_extract_all(o_orderpriority || ' ' || CAST(o_orderdate AS VARCHAR), '[0-9]+'), ',') AS nums,
           CAST(len(regexp_extract_all(o_orderpriority || ' ' || CAST(o_orderdate AS VARCHAR), '[0-9]+')) AS BIGINT) AS n_nums
    FROM orders
    WHERE o_orderkey < 2000
    """,
    tags=("string",),
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match order is deterministic on both engines, so the array is
    serialized with array_join/array_to_string (no sort needed) — the
    driver's pandas canonicalizer cannot sort raw list columns (same
    constraint documented at q53 above); n_nums keeps the structural
    check."""
    o = table(spark, sf_dir, "orders")
    text = F.concat_ws(" ", F.col("o_orderpriority"), F.col("o_orderdate").cast("string"))
    nums = F.regexp_extract_all(text, F.lit("[0-9]+"), F.lit(0))
    return (
        o.filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.array_join(nums, ",").alias("nums"),
            F.size(nums).cast("bigint").alias("n_nums"),
        )
    )


@register(
    "q79_bitwise_aggregates",
    "bitwise aggregate surface: bit_and/bit_or/bit_xor + shifts per group",
    """
    SELECT l_linestatus,
           CAST(bit_and(l_linenumber) AS BIGINT) AS all_bits,
           CAST(bit_or(l_linenumber) AS BIGINT) AS any_bits,
           CAST(bit_xor(l_linenumber) AS BIGINT) AS parity_bits,
           CAST(sum(l_linenumber << 2) AS BIGINT) AS shifted_sum
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("aggregation", "math"),
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.bit_and("l_linenumber").cast("bigint").alias("all_bits"),
        F.bit_or("l_linenumber").cast("bigint").alias("any_bits"),
        F.bit_xor("l_linenumber").cast("bigint").alias("parity_bits"),
        F.sum(F.shiftleft(F.col("l_linenumber"), 2)).cast("bigint").alias("shifted_sum"),
    )


@register(
    "q80_merge_upsert",
    "MERGE INTO semantics: delta upserted into base with per-row action tags",
    """
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderkey % 3 <> 0
    ),
    delta AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 10.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT coalesce(d.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_custkey
                ELSE b.o_custkey END AS o_custkey,
           CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN d.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                     THEN 'update'
                WHEN b.o_orderkey IS NULL THEN 'insert'
                ELSE 'keep' END AS merge_action
    FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
    """,
    tags=("join", "dml"),
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DML face of the engine: upsert as one relational plan (see
    sources/versioned.py:merge_upsert; pairs with write_versioned for
    copy-on-write MERGE INTO a snapshot table)."""
    from igloo_spark.sources.versioned import merge_upsert

    o = table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    delta = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
    )
    return merge_upsert(base, delta, ["o_orderkey"])


@register(
    "q81_time_range_frame",
    "RANGE frame over a time interval: rolling 1-hour event count/sum per user",
    """
    SELECT user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           sum(value) OVER w AS v_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "events", "timeseries"),
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frames (q32 covers numeric ranges): the
    rolling-window primitive behind rate limiting / anomaly scoring.
    One user-keyed exchange; the frame scan is sorted-run local."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
               sum(value) OVER w AS v_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "q82_string_agg_ordered",
    "ordered string aggregation (LISTAGG / string_agg with ORDER BY)",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           CAST(count(*) AS BIGINT) AS n
    FROM nation GROUP BY n_regionkey
    """,
    tags=("aggregation", "string"),
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LISTAGG: explicit element order makes the
    concatenation reproducible across engines and partitionings —
    the only safe form at any scale."""
    register_views(spark, sf_dir, ["nation"])
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names,
               CAST(count(*) AS BIGINT) AS n
        FROM nation GROUP BY n_regionkey
        """
    )


@register(
    "q83_correlated_scalar_select",
    "correlated scalar subquery in the SELECT list",
    """
    SELECT c_custkey, c_acctbal,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders,
           (SELECT max(o_totalprice) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_order
    FROM customer c
    WHERE c_custkey < 200
    """,
    tags=("subqueries",),
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT-list correlated scalars (q21 covers WHERE-position):
    Catalyst de-correlates both into one left outer aggregate join —
    no per-row re-execution at any scale."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT max(o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer c
        WHERE c_custkey < 200
        """
    )


@register(
    "q84_variant_json",
    "VARIANT semi-structured path: parse_json once, typed variant_get extraction",
    """
    SELECT event_type,
           CAST(count(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                           THEN 1 END) AS BIGINT) AS n_high,
           avg(CAST(json_extract(props, '$.k') AS BIGINT)) AS avg_k
    FROM events GROUP BY event_type
    """,
    tags=("json", "events"),
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT (q35 covers string-path get_json_object): parse
    once into the binary variant encoding, then typed variant_get —
    the open-format answer to a JSON column scanned by many paths; at
    100 TB parse-once beats re-tokenizing the string per path."""
    e = table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("k") > 50, 1)).cast("bigint").alias("n_high"),
            F.avg("k").alias("avg_k"),
        )
    )


@register(
    "q85_grouping_id",
    "CUBE with grouping_id(): distinguish which dimensions each super-aggregate row collapses",
    """
    SELECT coalesce(l_returnflag, '<all>') AS rf,
           coalesce(l_linestatus, '<all>') AS ls,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregation",),
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id() disambiguation over CUBE (q15 covers the CUBE
    rows themselves): the bitmask says which NULLs mean 'all' vs data
    NULLs — required by any BI layer reading super-aggregates.
    DuckDB spells the mask GROUPING(a)*2+GROUPING(b)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "gid",
            "sum_qty",
            "n",
        )
    )


@register(
    "q86_width_bucket",
    "width_bucket histogram of order totals (fixed-width bins, out-of-range buckets 0/n+1)",
    """
    WITH b AS (
        SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                         WHEN o_totalprice >= 500000 THEN 11
                         ELSE floor(o_totalprice / 50000) + 1 END AS BIGINT) AS bucket
        FROM orders
    )
    SELECT bucket, count(*) AS n FROM b GROUP BY bucket
    """,
    tags=("functions", "aggregation"),
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard width_bucket(v, lo, hi, n): values below lo land
    in bucket 0, above-or-at hi in n+1. The oracle spells out the
    same arithmetic (DuckDB lacks the function); a histogram over a
    codegen'd expression — one scan + tiny-key rollup at any scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(10))
            .cast("bigint")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q87_interval_arithmetic",
    "timestamp ± INTERVAL arithmetic: shipping deadline windows",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 45 DAY AS due_date,
           o_orderdate + INTERVAL 3 MONTH AS quarter_end,
           CAST(o_orderdate - INTERVAL 1 HOUR < o_orderdate AS BOOLEAN) AS sanity
    FROM orders WHERE o_orderkey < 500
    """,
    tags=("functions", "datetime"),
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL literal arithmetic on timestamps (q25 covers named
    date functions): day and month intervals shift differently
    (months are calendar-aware), both engines agree on the NTZ
    wall-clock. The day count deliberately avoids 90: DuckDB compares
    INTERVAL 90 DAY equal to INTERVAL 3 MONTH (30-day canonical
    months) and its subexpression dedup then conflates the two
    column additions."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")).alias("due_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("quarter_end"),
        (F.col("o_orderdate") - F.expr("INTERVAL 1 HOUR") < F.col("o_orderdate")).alias(
            "sanity"
        ),
    )


@register(
    "q88_map_zip_filter",
    "higher-order map functions: zip two maps, filter entries, explode to rows",
    """
    WITH pairs AS (
        SELECT p_partkey,
               length(p_name) AS a_name,
               length(p_type) AS a_type,
               p_size AS b_name,
               p_retailprice AS b_type
        FROM part WHERE p_partkey < 100
    )
    SELECT p_partkey, k, v FROM (
        SELECT p_partkey, 'name' AS k,
               CAST(a_name + b_name AS DOUBLE) AS v FROM pairs
        UNION ALL
        SELECT p_partkey, 'type', CAST(a_type + b_type AS DOUBLE) FROM pairs
    ) WHERE v > 20
    """,
    tags=("functions", "complex-types"),
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_zip_with + map_filter + explode (q55/q65 cover map
    construction): two maps on the same keys are zipped value-wise,
    small entries dropped, and the map exploded back to rows. The
    oracle computes the same per-key arithmetic via UNION ALL —
    DuckDB's map surface lacks the higher-order forms."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    m1 = F.create_map(
        F.lit("name"), F.length("p_name").cast("double"),
        F.lit("type"), F.length("p_type").cast("double"),
    )
    m2 = F.create_map(
        F.lit("name"), F.col("p_size").cast("double"),
        F.lit("type"), F.col("p_retailprice"),
    )
    zipped = F.map_zip_with(m1, m2, lambda k, a, b: a + b)
    kept = F.map_filter(zipped, lambda k, v: v > 20)
    return (
        p.select("p_partkey", F.explode(kept).alias("k", "v"))
        .select("p_partkey", "k", F.col("v").cast("double").alias("v"))
    )


@register(
    "q89_stack_rows",
    "stack() generator: widen one supplier row into (metric, value) rows",
    """
    SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value
    FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nation', CAST(s_nationkey AS DOUBLE) FROM supplier
    UNION ALL
    SELECT s_suppkey, 'name_len', CAST(length(s_name) AS DOUBLE) FROM supplier
    """,
    tags=("functions", "generator"),
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(n, k1, v1, ...) row generator — the inline UNPIVOT
    (q61 covers the UNPIVOT clause): one scan emits three rows per
    input row; the oracle is the equivalent UNION ALL which scans
    three times — the generator is the 100 TB-friendly form."""
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.expr(
            "stack(3, 'acctbal', s_acctbal,"
            " 'nation', CAST(s_nationkey AS DOUBLE),"
            " 'name_len', CAST(length(s_name) AS DOUBLE))"
        ).alias("metric", "value"),
    )


@register(
    "q90_regexp_count_like",
    "regexp_count + rlike filters over part names",
    """
    SELECT p_partkey, p_name,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
           CAST(len(regexp_extract_all(p_name, '(^| )s')) AS BIGINT) AS n_s_words
    FROM part
    WHERE regexp_matches(p_name, 'o[a-z]*e')
    """,
    tags=("functions", "string"),
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count + rlike (q23/q78 cover extract/replace): count
    and filter by pattern inside codegen. DuckDB spells count as
    len(regexp_extract_all) and rlike as regexp_matches."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("o[a-z]*e")).select(
        "p_partkey",
        "p_name",
        F.regexp_count("p_name", F.lit("[aeiou]")).cast("bigint").alias("n_vowels"),
        F.regexp_count("p_name", F.lit("(^| )s")).cast("bigint").alias("n_s_words"),
    )


@register(
    "q91_try_to_timestamp",
    "tolerant timestamp parsing: valid rows parse, garbage yields NULL not errors",
    """
    WITH raw AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0
                    THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                    ELSE 'not-a-date-' || CAST(o_orderkey AS VARCHAR) END AS s
        FROM orders WHERE o_orderkey < 300
    )
    SELECT o_orderkey, s,
           TRY_CAST(s AS TIMESTAMP) AS parsed,
           CAST(TRY_CAST(s AS TIMESTAMP) IS NOT NULL AS BOOLEAN) AS ok
    FROM raw
    """,
    tags=("functions", "datetime"),
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_to_timestamp (q62 covers try arithmetic): ELT pipelines
    parse dirty date strings without failing the job; mixed
    valid/garbage input, NULL for the garbage. Cast to NTZ so both
    engines compare wall-clock."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    s = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
    ).otherwise(F.concat(F.lit("not-a-date-"), F.col("o_orderkey").cast("string")))
    raw = o.select("o_orderkey", s.alias("s"))
    parsed = F.try_to_timestamp(F.col("s"), F.lit("yyyy-MM-dd HH:mm:ss")).cast(
        "timestamp_ntz"
    )
    return raw.select(
        "o_orderkey", "s", parsed.alias("parsed"), parsed.isNotNull().alias("ok")
    )


@register(
    "q92_bitmap_distinct",
    "bitmap aggregates: exact distinct via bitmap_construct_agg vs plain count(DISTINCT)",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregation", "sketch"),
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 3.5 bitmap aggregates (q29 covers approx sketches): an
    exact distinct count as a mergeable bitmap — count(DISTINCT)
    needs a key+value shuffle, the bitmap path ships fixed-size
    buckets and ORs them, the re-aggregatable form a rollup cube
    stores. The oracle is the semantically-equal count(DISTINCT)."""
    li = table(spark, sf_dir, "lineitem")

    def bitmap_distinct(col: str, out: str):
        # partial: one bitmap per (group, 32k-bucket); final: OR-merge
        # counts — the mergeable two-level shape a rollup store keeps
        return (
            li.groupBy(
                "l_returnflag", F.expr(f"bitmap_bucket_number({col})").alias("_b")
            )
            .agg(
                F.expr(f"bitmap_construct_agg(bitmap_bit_position({col}))").alias("bm")
            )
            .groupBy("l_returnflag")
            .agg(F.sum(F.expr("bitmap_count(bm)")).alias(out))
        )

    return bitmap_distinct("l_suppkey", "n_supp").join(
        bitmap_distinct("l_partkey", "n_part"), "l_returnflag"
    )


@register(
    "q94_explode_outer",
    "explode_outer: generator preserving rows whose array is empty",
    """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(string_split(regexp_replace(trim(text), '[ ]+', ' ', 'g'), ' '),
                           t -> length(t) >= 10) AS longtoks
        FROM documents WHERE doc_id < 300
    )
    SELECT a.doc_id, u.tok
    FROM arrs a LEFT JOIN (
        SELECT doc_id, unnest(longtoks) AS tok FROM arrs
    ) u USING (doc_id)
    """,
    tags=("generator", "complex-types"),
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer (q37/q60 cover plain explode): documents with NO
    long token survive as a (doc_id, NULL) row — the outer-generator
    semantic a filter-then-flatten pipeline needs to avoid silently
    dropping rows. The oracle spells it LEFT JOIN unnest."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    arr = F.filter(
        F.split(F.regexp_replace(F.trim("text"), "[ ]+", " "), " "),
        lambda t: F.length(t) >= 10,
    )
    return d.select("doc_id", F.explode_outer(arr).alias("tok"))


@register(
    "q95_forward_fill",
    "IGNORE NULLS window: forward-fill the last non-null reading per user",
    """
    SELECT user_id, event_id, ts, v,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events WHERE user_id < 50
    )
    """,
    tags=("window", "events"),
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value(... IGNORE NULLS) — the gap-filling idiom for sensor
    / telemetry streams (error readings nulled, then forward-filled
    from the same user's history in one window pass)."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    src = e.select("user_id", "event_id", "ts", v.alias("v"))
    return src.select(
        "user_id",
        "event_id",
        "ts",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@register(
    "q96_regression_aggregates",
    "linear-regression aggregates: regr_slope/intercept/r2 + corr/covar per group",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_s,
           round(covar_pop(l_quantity, l_extendedprice), 6) AS covar_p,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregation", "statistics"),
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI linear-regression aggregate family (regr_*), plus the
    corr/covar pair q13 doesn't cover — one partial-aggregable pass,
    so at 100 TB the exchange carries |groups| rows of sufficient
    statistics (sums and cross-products), not data."""
    li = table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.corr(x, y), 6).alias("corr_qp"),
        F.round(F.covar_samp(x, y), 6).alias("covar_s"),
        F.round(F.covar_pop(x, y), 6).alias("covar_p"),
        F.count("*").cast("bigint").alias("n"),
    )


@register(
    "q97_conditional_aggregates",
    "count_if / bool_and / bool_or / max_by / min_by per market segment",
    """
    SELECT c_mktsegment,
           CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_positive,
           bool_and(c_acctbal > -999.99) AS all_above_floor,
           bool_or(c_acctbal > 9000) AS any_high,
           max_by(c_name, c_custkey) AS latest_name,
           min_by(c_name, c_custkey) AS earliest_name
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("aggregation",),
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conditional/selection aggregate family: count_if,
    bool_and/bool_or (ANSI every/any), and max_by/min_by keyed on the
    unique custkey so the selected row is deterministic in both
    engines. All partial-aggregable — the 100 TB exchange carries one
    row per segment."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count_if(F.col("c_acctbal") > 0).cast("bigint").alias("n_positive"),
        F.bool_and(F.col("c_acctbal") > -999.99).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_high"),
        F.max_by("c_name", "c_custkey").alias("latest_name"),
        F.min_by("c_name", "c_custkey").alias("earliest_name"),
    )


@register(
    "q98_fuzzy_name_match",
    "blocked levenshtein fuzzy matching over the distinct part-name vocabulary",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    t AS (
        SELECT p_name, regexp_extract(p_name, '([^ ]+)$', 1) AS blk FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM t a JOIN t b ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    tags=("string", "dedup"),
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution-style fuzzy matching: edit distance over the
    DISTINCT name vocabulary (vocab-sized, orders of magnitude smaller
    than the row count at 100 TB), candidate pairs blocked by the
    name's last token so the join is an equi-join on the block key —
    levenshtein only ever runs inside a block, never all-pairs."""
    p = table(spark, sf_dir, "part")
    t = (
        p.select("p_name")
        .distinct()
        .select(
            "p_name", F.regexp_extract("p_name", r"([^ ]+)$", 1).alias("blk")
        )
    )
    a = t.select(F.col("p_name").alias("name_a"), "blk")
    b = t.select(F.col("p_name").alias("name_b"), "blk")
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(dist <= 2)
        .select("name_a", "name_b", dist.cast("bigint").alias("dist"))
    )
