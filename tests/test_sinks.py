"""Write-path tests: parquet (partitioned + pruned), CSV, JSON,
iceberg-dir roundtrip, CTAS, append, bucketed tables.

The reference has no sinks (igloo-io/igloo ``crates/api/src/lib.rs:
151-156`` — ``do_put`` unimplemented); these tests cover the write
surface our engine adds on top of reference parity.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from igloo_spark import sinks
from igloo_spark.sources import load_testdata_table, read_iceberg_dir

from conftest import SF_SMOKE


@pytest.fixture()
def nation(spark):
    return load_testdata_table(spark, SF_SMOKE, "nation")


def test_parquet_roundtrip_partitioned(spark, nation, tmp_path):
    path = str(tmp_path / "nation_part")
    sinks.write_parquet(nation, path, partition_by="n_regionkey")
    back = spark.read.parquet(path)
    assert back.count() == nation.count()
    # Hive-style layout → one directory per region key
    dirs = [d for d in os.listdir(path) if d.startswith("n_regionkey=")]
    assert len(dirs) == nation.select("n_regionkey").distinct().count()
    # partition pruning: a filter on the partition col reaches the scan
    pruned = back.filter(F.col("n_regionkey") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "n_regionkey" in plan.split("PartitionFilters")[1][:200]
    assert pruned.count() == nation.filter("n_regionkey = 0").count()


def test_parquet_single_file_per_partition(spark, nation, tmp_path):
    path = str(tmp_path / "nation_onefile")
    sinks.write_parquet(nation, path, partition_by="n_regionkey")
    for d in os.listdir(path):
        if d.startswith("n_regionkey="):
            files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
            assert len(files) == 1


def test_csv_json_roundtrip(spark, nation, tmp_path):
    csv_path, json_path = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    sinks.write_csv(nation, csv_path)
    sinks.write_json(nation, json_path)
    csv_back = spark.read.option("header", True).option("inferSchema", True).csv(csv_path)
    json_back = spark.read.json(json_path)
    assert csv_back.count() == nation.count()
    assert json_back.count() == nation.count()
    assert set(csv_back.columns) == set(nation.columns)


def test_orc_roundtrip_with_pushdown(spark, nation, tmp_path):
    from igloo_spark.sources import read_orc

    path = str(tmp_path / "nation_orc")
    sinks.write_orc(nation, path, partition_by="n_regionkey")
    back = read_orc(spark, path)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    pruned = back.filter(F.col("n_nationkey") == 7).select("n_name")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_nationkey" in plan.split("PushedFilters")[1][:200]
    assert pruned.count() == 1


def test_text_and_binary_file_sources(spark, tmp_path):
    from igloo_spark.sources import read_binary_files, read_text

    (tmp_path / "a.txt").write_text("hello\nworld\n")
    (tmp_path / "b.bin").write_bytes(b"\x00\x01\x02\x03")
    lines = read_text(spark, str(tmp_path / "a.txt"))
    assert [r.value for r in lines.orderBy("value").collect()] == ["hello", "world"]
    blobs = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = blobs.select("path", "length", "content").collect()
    assert len(rows) == 1
    assert rows[0].length == 4 and bytes(rows[0].content) == b"\x00\x01\x02\x03"
    assert dict(blobs.dtypes)["content"] == "binary"


def test_iceberg_dir_roundtrip(spark, nation, tmp_path):
    table_path = str(tmp_path / "nation_iceberg")
    sinks.write_iceberg_dir(nation, table_path)
    back = read_iceberg_dir(spark, table_path)
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in nation.collect()
    )


def test_ctas_path_backed(spark, tmp_path):
    load_testdata_table(spark, SF_SMOKE, "region").createOrReplaceTempView("region")
    path = str(tmp_path / "ctas_region")
    out = sinks.ctas(
        spark, "region_named", "SELECT r_regionkey, upper(r_name) AS r_name FROM region", path=path
    )
    assert out.count() == 5
    assert spark.table("region_named").filter("r_name = 'ASIA'").count() == 1


def test_insert_into_appends(spark, nation, tmp_path):
    path = str(tmp_path / "nation_append")
    sinks.write_parquet(nation, path)
    sinks.insert_into(nation.limit(3), path)
    assert spark.read.parquet(path).count() == nation.count() + 3


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Both sides bucketed on the join key → SortMergeJoin without
    Exchange. This is the write-time pre-shuffle that makes recurring
    100 TB fact joins cheap."""
    warehouse_cleanup = []
    orders = load_testdata_table(spark, SF_SMOKE, "orders")
    lineitem = load_testdata_table(spark, SF_SMOKE, "lineitem")
    sinks.write_bucketed_table(orders, "orders_b", "o_orderkey", 4, sort_by="o_orderkey")
    sinks.write_bucketed_table(
        lineitem.select("l_orderkey", "l_quantity"), "lineitem_b", "l_orderkey", 4, sort_by="l_orderkey"
    )
    warehouse_cleanup += ["orders_b", "lineitem_b"]
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (at sf0.001 everything broadcasts,
        # which hides the property under test: co-located buckets)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "Bucketed: true" in plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        for t in warehouse_cleanup:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cli_output_flag(tmp_path):
    from igloo_spark.cli import main

    out = str(tmp_path / "cli_out")
    rc = main(["--sql", "SELECT 42 AS answer", "--output", out, "--output-format", "json"])
    assert rc == 0
    assert os.path.isdir(out)


def test_cli_query_and_list_flags(tmp_path):
    import subprocess

    out = subprocess.run(
        ["python", "-m", "igloo_spark.cli", "--list-queries"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0
    assert "q01_pricing_summary" in out.stdout and len(out.stdout.splitlines()) >= 80

    run = subprocess.run(
        ["python", "-m", "igloo_spark.cli", "--data-dir", "/root/testdata/sf0.001",
         "--query", "q06_revenue_change"],
        capture_output=True, text=True, timeout=300,
    )
    assert run.returncode == 0
    assert "revenue" in run.stdout

    bad = subprocess.run(
        ["python", "-m", "igloo_spark.cli", "--data-dir", "/root/testdata/sf0.001",
         "--query", "nope"],
        capture_output=True, text=True, timeout=300,
    )
    assert bad.returncode == 1 and "unknown query" in bad.stderr


def test_cli_flag_combinations(tmp_path):
    """--explain must work with --query, and conflicting modes must
    error loudly instead of silently ignoring a flag."""
    import subprocess

    run = subprocess.run(
        ["python", "-m", "igloo_spark.cli", "--data-dir", "/root/testdata/sf0.001",
         "--query", "q06_revenue_change", "--explain"],
        capture_output=True, text=True, timeout=300,
    )
    assert run.returncode == 0
    assert "Physical Plan" in run.stdout  # the plan actually printed

    from igloo_spark.cli import main

    for argv in (
        ["--serve", "0", "--sql", "SELECT 1"],
        ["--serve", "0", "--query", "q01_pricing_summary", "--data-dir", "/tmp"],
        ["--sql", "SELECT 1", "--query", "q01_pricing_summary", "--data-dir", "/tmp"],
    ):
        with pytest.raises(SystemExit) as exc:
            main(argv)
        assert exc.value.code == 2, argv


def test_cli_audit_flags(tmp_path):
    import subprocess

    run = subprocess.run(
        ["python", "-m", "igloo_spark.cli", "--data-dir", "/root/testdata/sf0.001",
         "--query", "q01_pricing_summary", "--audit", "--audit-runtime"],
        capture_output=True, text=True, timeout=300,
    )
    assert run.returncode == 0
    assert "shuffles=" in run.stdout  # static audit
    assert "numOutputRows" in run.stdout  # runtime metrics


def test_sorted_layout_enables_data_skipping(spark, tmp_path):
    """The same selective range filter must read far fewer rows from a
    range-sorted layout (tight per-file min/max -> row groups pruned)
    than from a random layout (every file's min/max matches)."""
    from igloo_spark import sinks
    from igloo_spark.plans import runtime_metrics

    li = load_testdata_table(spark, SF_SMOKE, "lineitem")
    sorted_path = str(tmp_path / "li_sorted")
    random_path = str(tmp_path / "li_random")
    sinks.write_sorted(li, sorted_path, "l_orderkey", n_files=8)
    li.repartition(8).write.parquet(random_path)  # random distribution

    pred = "l_orderkey BETWEEN 100 AND 200"

    def scan_rows(path: str) -> int:
        df = spark.read.parquet(path).filter(pred).select("l_orderkey")
        total = 0
        for _, name, metrics in runtime_metrics(df):
            if name.startswith("Scan parquet"):
                total += metrics.get("numOutputRows", 0)
        return total

    sorted_rows = scan_rows(sorted_path)
    random_rows = scan_rows(random_path)
    full = li.count()
    # row-group pruning: the filter range straddles at most 2 of the 8
    # range-partitioned files; random layout decodes everything
    assert sorted_rows <= full / 3, (sorted_rows, full)
    assert random_rows >= full * 0.9, (random_rows, full)
    # identical results either way
    a = spark.read.parquet(sorted_path).filter(pred).count()
    b = spark.read.parquet(random_path).filter(pred).count()
    assert a == b


def test_analyze_table_feeds_cbo(igloo):
    """analyze_table must leave row-count stats the optimizer can see."""
    from igloo_spark import sinks

    igloo.spark.sql("DROP TABLE IF EXISTS stats_t")
    load_testdata_table(igloo.spark, SF_SMOKE, "nation").write.saveAsTable("stats_t")
    try:
        sinks.analyze_table(igloo.spark, "stats_t", ["n_nationkey", "n_name"])
        desc = {
            r.col_name: r.data_type
            for r in igloo.spark.sql("DESCRIBE TABLE EXTENDED stats_t").collect()
        }
        assert "Statistics" in desc and "25 rows" in desc["Statistics"]
    finally:
        igloo.spark.sql("DROP TABLE IF EXISTS stats_t")


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """Z-order clustering must prune decoded rows for selective
    filters on EITHER clustered column, where a linear sort prunes
    only its leading column; results stay identical to the linear
    layout's."""
    from igloo_spark import sinks
    from igloo_spark.plans import runtime_metrics

    li = load_testdata_table(spark, SF_SMOKE, "lineitem")
    z_path = str(tmp_path / "li_zorder")
    lin_path = str(tmp_path / "li_linear")
    sinks.write_zordered(li, z_path, ["l_partkey", "l_orderkey"], n_files=16)
    sinks.write_sorted(li, lin_path, "l_partkey", n_files=16)

    # ~10% of each column's domain (l_partkey 0-199, l_orderkey 0-~1500)
    preds = {"l_partkey": "l_partkey BETWEEN 0 AND 19",
             "l_orderkey": "l_orderkey BETWEEN 0 AND 150"}

    def scan_rows(path: str, col: str) -> int:
        df = spark.read.parquet(path).filter(preds[col]).select(col)
        return sum(
            m.get("numOutputRows", 0)
            for _, name, m in runtime_metrics(df)
            if name.startswith("Scan parquet")
        )

    full = li.count()
    # leading-column pruning: both layouts good on l_partkey
    assert scan_rows(z_path, "l_partkey") <= full * 0.6
    assert scan_rows(lin_path, "l_partkey") <= full * 0.3
    # second-column pruning: only the z-order layout helps
    z_second = scan_rows(z_path, "l_orderkey")
    lin_second = scan_rows(lin_path, "l_orderkey")
    assert z_second <= full * 0.6, (z_second, full)
    assert lin_second >= full * 0.9, (lin_second, full)
    # same query answers from both layouts
    for col in ("l_partkey", "l_orderkey"):
        a = spark.read.parquet(z_path).filter(preds[col]).count()
        b = spark.read.parquet(lin_path).filter(preds[col]).count()
        assert a == b


def test_zorder_value_interleaves_bits(spark):
    """Known 2-bit fixture: z(b1=3, b2=0) interleaves to 0b0101 = 5."""
    from pyspark.sql import functions as F

    from igloo_spark.sinks import zorder_value

    # x in [0,3] buckets to itself with bits=2 over min=0 max=3;
    # width_bucket maps max to the top bucket via the least() clamp
    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3)], "x int, y int")
    z = zorder_value(df, ["x", "y"], bits=2)
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", z).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b0101  # x bits at even positions
    assert got[(0, 3)] == 0b1010  # y bits at odd positions
    assert got[(3, 3)] == 0b1111

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        zorder_value(df, [])


def test_bloom_filter_prunes_point_lookups(spark, tmp_path):
    """An equality probe on a high-cardinality unsorted column must
    decode far fewer rows when the file carries a bloom filter for it
    (min/max stats are useless on a random layout)."""
    from pyspark.sql import functions as F

    from igloo_spark import sinks
    from igloo_spark.plans import runtime_metrics

    df = spark.range(0, 200000).select(
        (F.xxhash64("id") % 1000000007).alias("k"), F.col("id").alias("v")
    )
    bloom = str(tmp_path / "bloom")
    plain = str(tmp_path / "plain")
    opts = dict(max_records_per_file=None)
    sinks.write_parquet(
        df.repartition(4), bloom, bloom_filter_cols=["k"],
        **{"parquet.block.size": 262144}, **opts,
    )
    sinks.write_parquet(
        df.repartition(4), plain, **{"parquet.block.size": 262144}, **opts
    )
    target = df.filter(F.col("v") == 4242).select("k").first()["k"]

    def decoded(path: str) -> int:
        q = spark.read.parquet(path).filter(F.col("k") == target)
        assert q.count() >= 1
        return sum(
            m.get("numOutputRows", 0)
            for _, n, m in runtime_metrics(q)
            if n.startswith("Scan parquet")
        )

    total = df.count()
    assert decoded(bloom) <= total * 0.25
    assert decoded(plain) >= total * 0.9
