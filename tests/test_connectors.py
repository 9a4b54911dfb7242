"""Connector tests beyond parquet/CSV/JSON: live JDBC federation
(embedded Derby — Spark bundles the driver), Avro, and the real
Iceberg catalog path. Avro/Iceberg skip cleanly when their jars are
absent (this container has no network to fetch them); the wiring is
exercised the moment a jar appears on the classpath.
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.001"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_jdbc_derby_predicate_pushdown(spark):
    """Live JDBC federation against an in-process Derby database —
    supersedes the reference's empty Postgres/MySQL stubs
    (crates/connectors/postgres/src/lib.rs:1). The filter must reach
    the remote scan (PushedFilters on the JDBC relation), i.e. the
    WHERE clause executes in the database, not in Spark."""
    from igloo_spark.sources import read_jdbc

    jvm = spark._jvm
    url = "jdbc:derby:memory:igloo_fed;create=true"
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        with contextlib.suppress(Exception):  # leftover from a prior run
            st.executeUpdate("DROP TABLE people")
        st.executeUpdate("CREATE TABLE people (id INT, name VARCHAR(50), age INT)")
        for row in ("(1,'alice',25)", "(2,'bob',35)", "(3,'carol',41)", "(4,'dan',17)"):
            st.executeUpdate(f"INSERT INTO people VALUES {row}")
        st.close()
    finally:
        conn.close()

    df = read_jdbc(
        spark, url, "people", driver="org.apache.derby.jdbc.EmbeddedDriver"
    )
    q = df.filter("age > 30").select("NAME")
    plan = _explain(q)
    assert "JDBCRelation" in plan or "jdbc" in plan.lower()
    assert "GreaterThan(AGE,30)" in plan, f"filter not pushed to the database:\n{plan}"
    assert sorted(r.NAME for r in q.collect()) == ["bob", "carol"]


def test_jdbc_derby_partitioned_read(spark):
    """Partition-column parallel JDBC read: numPartitions range splits
    become independent remote queries (the 100 TB ingestion shape)."""
    from igloo_spark.sources import read_jdbc

    jvm = spark._jvm
    url = "jdbc:derby:memory:igloo_fed2;create=true"
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        with contextlib.suppress(Exception):
            st.executeUpdate("DROP TABLE nums")
        st.executeUpdate("CREATE TABLE nums (id INT, v INT)")
        for i in range(40):
            st.executeUpdate(f"INSERT INTO nums VALUES ({i}, {i * i})")
        st.close()
    finally:
        conn.close()

    df = read_jdbc(
        spark,
        url,
        "nums",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        partition_column="id",
        lower_bound=0,
        upper_bound=40,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 40
    assert df.agg({"v": "sum"}).collect()[0][0] == sum(i * i for i in range(40))


def test_avro_roundtrip_or_skip(spark, tmp_path):
    """Avro read-back equality — runs only when the spark-avro
    datasource jar is present; read_avro raises a clear error
    otherwise (asserted in the skip branch so the gate itself is
    always tested)."""
    from igloo_spark.sources import has_avro_datasource, read_avro

    if not has_avro_datasource(spark):
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_avro(spark, str(tmp_path / "nope.avro"))
        pytest.skip("spark-avro datasource jar not on classpath")

    src = spark.read.parquet(f"{SF}/nation.parquet")
    path = str(tmp_path / "nation_avro")
    src.write.format("avro").save(path)
    back = read_avro(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_iceberg_catalog_or_skip(tmp_path):
    """REAL Iceberg path (metadata-aware, snapshot reads, time travel)
    — strictly superior to the reference's directory walk
    (crates/connectors/iceberg/src/lib.rs:42-76), which
    read_iceberg_dir reproduces for parity. Skips when the runtime jar
    is absent; the catalog conf itself is validated either way."""
    from pyspark.sql import SparkSession

    from igloo_spark.sources import has_iceberg_runtime, iceberg_catalog_conf

    conf = iceberg_catalog_conf("ice", str(tmp_path / "warehouse"))
    assert conf["spark.sql.catalog.ice"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.ice.warehouse"].endswith("warehouse")

    active = SparkSession.getActiveSession()
    if active is None or not has_iceberg_runtime(active):
        pytest.skip("iceberg-spark-runtime jar not on classpath")

    # live path (executes only with the jar present): snapshot commit,
    # metadata-aware read, time travel to the first snapshot
    spark = active
    for k, v in conf.items():
        spark.conf.set(k, v)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.db")
    spark.range(5).writeTo("ice.db.t").createOrReplace()
    assert spark.table("ice.db.t").count() == 5
    spark.range(5, 8).writeTo("ice.db.t").append()
    assert spark.table("ice.db.t").count() == 8
    snaps = spark.sql("SELECT snapshot_id FROM ice.db.t.snapshots ORDER BY committed_at").collect()
    first = snaps[0].snapshot_id
    assert spark.sql(f"SELECT count(*) AS n FROM ice.db.t VERSION AS OF {first}").collect()[0].n == 5


def test_versioned_table_time_travel(spark, tmp_path):
    """Native snapshot semantics (the capability the reference's
    metadata-ignoring scan lacks): append and overwrite commits,
    latest-read, time travel to any version, and invisibility of
    unreferenced files."""
    from igloo_spark.sources.versioned import read_versioned, snapshots, write_versioned

    root = str(tmp_path / "vt")
    v1 = write_versioned(spark.range(5).toDF("id"), root, mode="overwrite")
    v2 = write_versioned(spark.range(5, 8).toDF("id"), root, mode="append")
    assert (v1, v2) == (1, 2)

    assert read_versioned(spark, root).count() == 8  # latest
    assert read_versioned(spark, root, version=1).count() == 5  # time travel
    write_versioned(spark.range(100, 102).toDF("id"), root, mode="overwrite")
    assert sorted(r.id for r in read_versioned(spark, root).collect()) == [100, 101]
    assert read_versioned(spark, root, version=2).count() == 8  # old snapshot intact

    log = snapshots(root)
    assert [s["version"] for s in log] == [1, 2, 3]
    assert [s["op"] for s in log] == ["overwrite", "append", "overwrite"]

    # a file dropped into data/ outside a commit is never visible
    import os
    stray = os.path.join(root, "data", "stray")
    os.makedirs(stray)
    spark.range(1000, 1100).toDF("id").write.parquet(stray, mode="overwrite")
    assert read_versioned(spark, root).count() == 2

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not in"):
        read_versioned(spark, root, version=99)


def test_merge_upsert_actions_and_versioned_merge(spark, tmp_path):
    """MERGE semantics: matched rows take delta values, delta-only rows
    insert, base-only rows keep; merge_into_versioned commits the
    merged state while time travel still sees the pre-merge snapshot."""
    from pyspark.sql import functions as F

    from igloo_spark.sources.versioned import (
        merge_into_versioned,
        merge_upsert,
        read_versioned,
        write_versioned,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    delta = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    out = {r["k"]: r for r in merge_upsert(base, delta, ["k"]).collect()}
    assert out[1]["merge_action"] == "keep" and out[1]["v"] == 10.0
    assert out[2]["merge_action"] == "update" and out[2]["name"] == "b2" and out[2]["v"] == 99.0
    assert out[3]["merge_action"] == "keep"
    assert out[4]["merge_action"] == "insert" and out[4]["v"] == 40.0

    root = str(tmp_path / "vt")
    v1 = write_versioned(base, root, mode="overwrite")
    v2 = merge_into_versioned(spark, root, delta, ["k"])
    assert v2 == v1 + 1
    latest = {r["k"]: r["v"] for r in read_versioned(spark, root).collect()}
    assert latest == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}
    old = {r["k"]: r["v"] for r in read_versioned(spark, root, version=v1).collect()}
    assert old == {1: 10.0, 2: 20.0, 3: 30.0}

    import pytest

    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert(base, delta.drop("v"), ["k"])
    with pytest.raises(ValueError, match="non-empty"):
        merge_upsert(base, delta, [])


def test_merge_upsert_null_keys(spark):
    """NULL is a legal merge key under eqNullSafe: a NULL-key delta row
    must UPDATE a NULL-key base row (not be dropped or double-counted),
    and a NULL-key delta row with no base match must INSERT."""
    from igloo_spark.sources.versioned import merge_upsert

    base = spark.createDataFrame(
        [(None, "base-null", 1.0), (1, "one", 10.0)], "k int, name string, v double"
    )
    delta = spark.createDataFrame(
        [(None, "delta-null", 99.0), (2, "two", 20.0)], "k int, name string, v double"
    )
    rows = merge_upsert(base, delta, ["k"]).collect()
    assert len(rows) == 3
    out = {r["k"]: r for r in rows}
    assert out[None]["merge_action"] == "update"
    assert out[None]["name"] == "delta-null" and out[None]["v"] == 99.0
    assert out[1]["merge_action"] == "keep"
    assert out[2]["merge_action"] == "insert"

    # delta-only NULL key (no base NULL row) must insert, not vanish
    only_insert = merge_upsert(
        base.filter("k IS NOT NULL"), delta, ["k"]
    ).collect()
    acts = {r["k"]: r["merge_action"] for r in only_insert}
    assert acts == {None: "insert", 1: "keep", 2: "insert"}


def test_stream_sink_watermark_survives_vacuum(spark, tmp_path):
    """Exactly-once must hold across VACUUM: after vacuum deletes the
    manifests that recorded earlier batch ids, a crash-replayed
    micro-batch must still be recognized as committed and skipped."""
    from igloo_spark.sources.versioned import (
        last_committed_batch,
        snapshots,
        vacuum_versioned,
        versioned_stream_sink,
    )

    root = str(tmp_path / "wm")
    sink = versioned_stream_sink(root, mode="overwrite")
    for bid in (0, 1, 2):
        sink(spark.range(10 * (bid + 1)).toDF("id"), bid)
    assert last_committed_batch(root) == 2

    vacuum_versioned(root, keep_last=1)  # drops the batch-0/1 manifests
    assert last_committed_batch(root) == 2

    # vacuum everything down to a snapshot whose manifest has no batch
    # id at all, then replay an old batch — still a no-op
    n_before = len(snapshots(root))
    sink(spark.range(5).toDF("id"), 1)  # replayed batch 1
    assert len(snapshots(root)) == n_before, "replayed batch re-committed"
    assert last_committed_batch(root) == 2


def test_chunk_dedup_known_fixture(spark):
    """Two docs sharing one 2-token chunk: the later occurrence is
    counted as removed; unique chunks all survive."""
    from igloo_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb zz yy"), (3, "cc dd")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup(df, "doc_id", "text", chunk_tokens=2).collect()}
    # doc1: chunks [aa bb][cc dd] both first -> kept 2/2
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 2)
    # doc2: [aa bb] is a dup of doc1's, [zz yy] unique -> kept 1/2
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (2, 1)
    # doc3: [cc dd] dup of doc1's second chunk -> kept 0/1
    assert (out[3]["n_chunks"], out[3]["n_kept"]) == (1, 0)
    assert out[2]["kept_ratio"] == 0.5


def test_profile_columns_validation_and_approx(spark):
    from igloo_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 2.0), (4, 2.0)], "k int, v double"
    )
    rows = {r["col_name"]: r for r in profile_columns(df, ["k", "v"]).collect()}
    assert rows["v"]["n_nulls"] == 1 and rows["v"]["n_distinct"] == 2
    assert rows["k"]["min_v"] == 1.0 and rows["k"]["max_v"] == 4.0
    approx = {r["col_name"]: r for r in profile_columns(df, ["k"], exact=False).collect()}
    assert approx["k"]["n_distinct"] == 4  # HLL exact at tiny cardinality

    import pytest

    with pytest.raises(ValueError, match="not in dataframe"):
        profile_columns(df, ["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(df, [])


def test_numeric_histogram_edges(spark):
    """Constant column collapses to bucket 0; nulls are excluded; the
    bucket counts sum to the non-null row count."""
    from igloo_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame([(1.0,), (2.0,), (None,), (10.0,)], "v double")
    rows = numeric_histogram(df, "v", 4).collect()
    assert sum(r["n"] for r in rows) == 3
    top = max(rows, key=lambda r: r["bucket"])
    assert top["hi"] == 10.0  # last bucket closed at the max

    const = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    crows = numeric_histogram(const, "v", 4).collect()
    assert len(crows) == 1 and crows[0]["bucket"] == 0 and crows[0]["n"] == 2

    import pytest

    with pytest.raises(ValueError, match="nbuckets"):
        numeric_histogram(df, "v", 0)


def test_dedup_manifest_covers_all_docs(spark):
    """Every input id appears exactly once; canonical ids are component
    minima; singletons are their own canonical."""
    from igloo_spark.operators.dedup import dedup_manifest

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again today"),
            (3, "completely different text about spark shuffles and joins here"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_manifest(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["canonical_id"] == 1 and rows[1]["is_canonical"]
    assert rows[2]["canonical_id"] == 1 and not rows[2]["is_canonical"]
    assert rows[2]["group_size"] == 2
    assert rows[3]["canonical_id"] == 3 and rows[3]["is_canonical"]
    assert rows[3]["group_size"] == 1


def test_apply_changelog_last_writer_wins(spark, tmp_path):
    """CDC apply: updates replace, deletes remove, inserts add; with a
    sequence column, the latest change per key wins (an insert
    followed by a delete leaves nothing)."""
    from igloo_spark.sources.versioned import (
        apply_changelog,
        read_versioned,
        write_versioned,
    )

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double"
    )
    root = str(tmp_path / "cdc_table")
    v1 = write_versioned(base, root, mode="overwrite")

    changes = spark.createDataFrame(
        [
            (2, 99.0, "update", 1),
            (3, None, "delete", 1),
            (4, 40.0, "insert", 1),
            (5, 50.0, "insert", 1),
            (5, None, "delete", 2),  # later seq: delete wins over insert
            (1, 11.0, "update", 1),
            (1, 12.0, "update", 2),  # later seq: 12.0 wins
        ],
        "k int, v double, op string, seq int",
    )
    v2 = apply_changelog(spark, root, changes, ["k"], seq_col="seq")
    assert v2 == v1 + 1
    state = {r["k"]: r["v"] for r in read_versioned(spark, root).collect()}
    assert state == {1: 12.0, 2: 99.0, 4: 40.0}

    import pytest

    bad = spark.createDataFrame([(1, 1.0, "upsert", 1)], "k int, v double, op string, seq int")
    with pytest.raises(ValueError, match="unknown ops"):
        apply_changelog(spark, root, bad, ["k"], seq_col="seq")


def test_compact_and_vacuum_lifecycle(spark, tmp_path):
    """Append-heavy table: compaction folds the file tail into a new
    snapshot, vacuum reclaims everything older while the latest
    snapshot stays intact; vacuumed versions stop time-traveling."""
    import os

    from igloo_spark.sources.versioned import (
        compact_versioned,
        read_versioned,
        snapshots,
        vacuum_versioned,
        write_versioned,
    )

    root = str(tmp_path / "life")
    for i in range(3):
        write_versioned(spark.range(i * 10, (i + 1) * 10).toDF("id"), root)
    assert snapshots(root)[-1]["n_files"] >= 3

    v = compact_versioned(spark, root, n_files=2)
    assert snapshots(root)[-1]["n_files"] == 2
    assert read_versioned(spark, root).count() == 30

    deleted = vacuum_versioned(root, keep_last=1)
    assert deleted and all(not os.path.exists(f) for f in deleted)
    # latest snapshot fully readable after the purge
    assert read_versioned(spark, root).count() == 30
    assert [s["version"] for s in snapshots(root)] == [v]
    # old version no longer time-travelable
    import pytest

    with pytest.raises(ValueError, match="not in"):
        read_versioned(spark, root, version=1)
    # idempotent when nothing to reclaim
    assert vacuum_versioned(root, keep_last=1) == []


def test_quantile_bins_validation(spark):
    from igloo_spark.operators.profile import quantile_bins

    import pytest

    df = spark.createDataFrame([(1.0,)], "v double")
    for bad in ([], [0.5, 0.25], [0.0, 0.5], [0.5, 1.0]):
        with pytest.raises(ValueError, match="probs"):
            quantile_bins(df, "v", bad)


def test_expectations_count_real_violations(spark):
    """Each rule kind must count its violations on a deliberately
    dirty frame: nulls, out-of-range, duplicate keys, orphaned FKs."""
    from igloo_spark.operators.expectations import (
        check_expectations,
        expect_in_range,
        expect_matches,
        expect_not_null,
    )

    child = spark.createDataFrame(
        [
            (1, 10.0, "ok-1"),
            (1, -5.0, "ok-2"),    # dup key + below range
            (None, 20.0, "bad"),  # null key (opts out of FK) + regex fail
            (9, None, "ok-3"),    # orphan FK + null value
        ],
        "k int, v double, tag string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    out = {
        r["rule"]: r["n_violations"]
        for r in check_expectations(
            child,
            row_rules=[
                expect_not_null("k"),
                expect_in_range("v", 0, 100),
                expect_matches("tag", "^ok-"),
            ],
            unique_keys=[["k"]],
            foreign_keys=[(["k"], parent, ["pk"])],
        ).collect()
    }
    assert out["not_null(k)"] == 1
    assert out["in_range(v,0,100)"] == 2  # -5.0 and the null value
    assert out["matches(tag)"] == 1
    assert out["unique(k)"] == 2  # both rows of the duplicated key
    assert out["fk(k)->(pk)"] == 1  # k=9; the null key opted out

    import pytest

    with pytest.raises(ValueError, match="at least one"):
        check_expectations(child)


def test_versioned_schema_evolution(spark, tmp_path):
    """A later append may add columns; merge_schema reads the union
    schema with nulls backfilled for older commits, while the default
    read keeps the cheap single-footer behavior."""
    from pyspark.sql import functions as F

    from igloo_spark.sources.versioned import read_versioned, write_versioned

    root = str(tmp_path / "evolve")
    write_versioned(spark.range(3).toDF("id"), root, mode="overwrite")
    write_versioned(
        spark.range(3, 5).toDF("id").withColumn("extra", F.lit("new")), root
    )
    merged = read_versioned(spark, root, merge_schema=True)
    assert set(merged.columns) == {"id", "extra"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert rows[0] is None and rows[4] == "new"
    assert merged.count() == 5


def test_csv_json_corrupt_record_modes(spark, tmp_path):
    """Dirty-ingest surface: the three reader modes Spark offers for
    malformed rows — PERMISSIVE (null-fill + _corrupt_record),
    DROPMALFORMED (silently skip), FAILFAST (raise) — on both CSV and
    JSON. A 100 TB crawl drop always contains garbage lines; mode
    choice is the difference between a poisoned column, a silent gap,
    and a failed job."""
    import pytest as _pytest
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    csv_path = tmp_path / "dirty.csv"
    csv_path.write_text("id,v\n1,10\n2,notanum\n3,30\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("v", LongType())]
    )

    permissive = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(str(csv_path))
    )
    rows = {r["id"]: r["v"] for r in permissive.collect()}
    assert rows == {1: 10, 2: None, 3: 30}

    dropped = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(csv_path))
    )
    assert {r["id"] for r in dropped.collect()} == {1, 3}

    failfast = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(str(csv_path))
    )
    with _pytest.raises(Exception, match="FAILFAST|Malformed"):
        failfast.collect()

    json_path = tmp_path / "dirty.jsonl"
    json_path.write_text('{"id": 1, "v": 10}\nnot json at all\n{"id": 3, "v": 30}\n')
    jschema = StructType(
        [
            StructField("id", LongType()),
            StructField("v", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    pj = spark.read.schema(jschema).json(str(json_path))
    bad = pj.filter("_corrupt_record IS NOT NULL").collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "not json at all"
    good = {r["id"]: r["v"] for r in pj.filter("_corrupt_record IS NULL").collect()}
    assert good == {1: 10, 3: 30}


def test_xml_roundtrip_and_modes(spark, tmp_path):
    """Native XML source (Spark 4 merged spark-xml upstream): write →
    read round-trip with declared rowTag, declared-schema read, and
    DROPMALFORMED on a hand-corrupted document."""
    import pytest as _pytest
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from igloo_spark.sources import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, name string"
    )
    out = str(tmp_path / "xml_rt")
    write_xml(df, out, row_tag="doc")
    back = read_xml(spark, out, row_tag="doc")
    assert {(r["id"], r["name"]) for r in back.collect()} == {
        (1, "alpha"), (2, "beta"), (3, "gamma")
    }

    # declared schema: no inference pass over the files
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    typed = read_xml(spark, out, row_tag="doc", schema=schema)
    assert typed.schema == schema and typed.count() == 3

    # corrupt-record surface parity with CSV/JSON
    bad_dir = tmp_path / "xml_bad"
    bad_dir.mkdir()
    (bad_dir / "t.xml").write_text(
        "<rows><doc><id>1</id><name>ok</name></doc>"
        "<doc><id>oops</id><name>bad</name></doc></rows>"
    )
    dropped = read_xml(
        spark, str(bad_dir), row_tag="doc", schema=schema, mode="DROPMALFORMED"
    )
    assert [r["id"] for r in dropped.collect()] == [1]
    failfast = read_xml(
        spark, str(bad_dir), row_tag="doc", schema=schema, mode="FAILFAST"
    )
    with _pytest.raises(Exception, match="FAILFAST|Malformed"):
        failfast.collect()


def test_diff_versions_prunes_shared_files(spark, tmp_path):
    """Snapshot diff: append → inserts only (and ONLY the appended
    files are scanned — manifest pruning); merge rewrite → updates +
    deletes + inserts; identical versions → empty diff."""
    from igloo_spark.sources.versioned import (
        diff_versions,
        merge_into_versioned,
        write_versioned,
    )

    root = str(tmp_path / "vt")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    write_versioned(base, root)  # v1
    appended = spark.createDataFrame([(4, "d", 40)], "id long, name string, v long")
    write_versioned(appended, root, mode="append")  # v2

    d12 = diff_versions(spark, root, ["id"], 1, 2)
    assert {(r["id"], r["change_type"]) for r in d12.collect()} == {(4, "insert")}
    # manifest pruning: for an append the old side of the diff is the
    # EMPTY symmetric difference, which Catalyst folds away entirely
    # (PropagateEmptyRelation) — exactly ONE FileScan survives, over
    # only the appended files; an unpruned diff would scan both
    # snapshots (two FileScans incl. the base files)
    plan = d12._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan

    # merge: update id=2, delete nothing, insert id=5 (copy-on-write
    # rewrite — every file new, diff degrades to the full outer join)
    delta = spark.createDataFrame([(2, "B", 21), (5, "e", 50)], "id long, name string, v long")
    merge_into_versioned(spark, root, delta, ["id"])  # v3
    d23 = diff_versions(spark, root, ["id"], 2, 3)
    assert {(r["id"], r["change_type"]) for r in d23.collect()} == {
        (2, "update"),
        (5, "insert"),
    }

    # identical snapshots → empty
    assert diff_versions(spark, root, ["id"], 2, 2).count() == 0

    # delete detection via a rewrite that drops id=1
    from igloo_spark.sources.versioned import read_versioned

    kept = read_versioned(spark, root).filter("id <> 1")
    write_versioned(kept, root, mode="overwrite")  # v4
    d34 = diff_versions(spark, root, ["id"], 3, 4)
    assert {(r["id"], r["change_type"]) for r in d34.collect()} == {(1, "delete")}


def test_diff_versions_append_with_evolved_schema(spark, tmp_path):
    """Schema evolution + append: manifest pruning still reports only
    the appended rows as inserts (the shared base files never enter
    the diff, so the old side's narrower schema is irrelevant)."""
    from igloo_spark.sources.versioned import diff_versions, write_versioned

    root = str(tmp_path / "vse")
    write_versioned(
        spark.createDataFrame([(1, "a")], "id long, v string"), root
    )  # v1
    write_versioned(
        spark.createDataFrame([(2, "b", 9)], "id long, v string, extra long"),
        root,
        mode="append",
    )  # v2 — evolved schema
    d = diff_versions(spark, root, ["id"], 1, 2)
    assert {(r["id"], r["change_type"]) for r in d.collect()} == {(2, "insert")}


def test_diff_versions_two_empty_snapshots(spark, tmp_path):
    """Diffing two snapshots whose manifests list no files returns an
    empty diff instead of handing spark.read.parquet a zero-path list
    (r06 ADVICE #4). Empty manifests can't come from write_versioned
    (Spark emits a schema-only part file even for 0 rows) but can come
    from external manifest tooling / retention repair, so they are
    constructed directly here."""
    import json as _json

    from igloo_spark.sources.versioned import diff_versions

    root = tmp_path / "vempty"
    mdir = root / "manifests"
    mdir.mkdir(parents=True)
    for v in (1, 2):
        (mdir / f"v{v:06d}.json").write_text(
            _json.dumps(
                {"version": v, "op": "overwrite", "committed_at": 0.0,
                 "files": [], "batch_id": None}
            )
        )
    d = diff_versions(spark, str(root), ["id"], 1, 2)
    assert d.count() == 0
    assert d.columns == ["id", "change_type"]
