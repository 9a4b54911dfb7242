"""Reference-derived smoke suite (SURVEY §5): the five concrete test
scenarios the reference itself asserts, re-expressed on our engine.

Citations are to igloo-io/igloo files the scenario was lifted from.
"""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

USERS_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("age", IntegerType(), False),
    ]
)
USERS_ROWS = [(1, "Alice", 25), (2, "Bob", 30), (3, "Charlie", 35), (4, "Diana", 28), (5, "Eve", 32)]


def test_select_42(igloo):
    # crates/engine/src/lib.rs:160-183 — schema + value
    df = igloo.execute("SELECT 42 as answer")
    assert df.columns == ["answer"]
    rows = df.collect()
    assert len(rows) == 1 and rows[0].answer == 42


def test_select_42_hello(igloo):
    # crates/igloo/src/main.rs:43, README.md:27
    row = igloo.execute("SELECT 42 as answer, 'Hello Igloo' as message").collect()[0]
    assert row.answer == 42 and row.message == "Hello Igloo"


def test_capitalize_nulls_first(igloo):
    # crates/engine/src/lib.rs:192-228: capitalize over
    # ["hello","WoRlD",NULL,"rust",""] with ORDER BY ... ASC NULLS FIRST
    # → [NULL, "", "HELLO", "RUST", "WORLD"]
    df = igloo.spark.createDataFrame(
        [("hello",), ("WoRlD",), (None,), ("rust",), ("",)],
        StructType([StructField("text_col", StringType(), True)]),
    )
    igloo.register_table("test_strings", df)
    out = igloo.execute(
        "SELECT capitalize(text_col) AS capitalized_text FROM test_strings "
        "ORDER BY capitalized_text ASC NULLS FIRST"
    ).collect()
    assert [r.capitalized_text for r in out] == [None, "", "HELLO", "RUST", "WORLD"]


def test_filter_sort_users(igloo):
    # crates/engine/tests/integration_test.rs:59-75 — parquet roundtrip
    # + WHERE age > 30 ORDER BY age → exactly [Eve 32, Charlie 35]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/test_table.parquet"
        igloo.spark.createDataFrame(USERS_ROWS, USERS_SCHEMA).write.parquet(path)
        igloo.register_table("test_table", path)
        out = igloo.execute(
            "SELECT name, age FROM test_table WHERE age > 30 ORDER BY age"
        ).collect()
        assert [(r.name, r.age) for r in out] == [("Eve", 32), ("Charlie", 35)]


def test_where_age_gt_25(igloo):
    # README.md:30 demo query on the CLI's users table
    igloo.register_table("users", igloo.spark.createDataFrame(USERS_ROWS, USERS_SCHEMA))
    out = igloo.execute("SELECT name, age FROM users WHERE age > 25").collect()
    assert {(r.name, r.age) for r in out} == {("Bob", 30), ("Charlie", 35), ("Diana", 28), ("Eve", 32)}


def test_csv_header_handling(igloo, tmp_path):
    # crates/connectors/filesystem/src/lib.rs:48-114 +
    # crates/coordinator/src/main.rs:33-41 (declared-schema CSV, LIMIT 5)
    from igloo_spark.sources import read_csv

    with_header = tmp_path / "with_header.csv"
    with_header.write_text("col_a,col_b\n1,foo\n2,bar\n")
    schema = "col_a LONG, col_b STRING"
    df = read_csv(igloo.spark, str(with_header), schema=schema, header=True)
    igloo.register_table("test_table_csv", df)
    out = igloo.execute("SELECT col_a, col_b FROM test_table_csv LIMIT 5").collect()
    assert [(r.col_a, r.col_b) for r in out] == [(1, "foo"), (2, "bar")]

    no_header = tmp_path / "no_header.csv"
    no_header.write_text("a,b\nc,d\n")
    df2 = read_csv(igloo.spark, str(no_header), header=False)
    assert df2.count() == 2
    assert [tuple(r) for r in df2.collect()][0] == ("a", "b")


def test_cache_roundtrip(igloo):
    # crates/cache/src/lib.rs:96-191 — put/get equality + missing key
    df = igloo.spark.createDataFrame(
        [(1, "foo"), (2, "bar"), (3, "baz")], ["id", "name"]
    )
    igloo.cache.put("test_key", df)
    got = igloo.cache.get("test_key")
    assert got is not None
    assert sorted(tuple(r) for r in got.collect()) == [(1, "foo"), (2, "bar"), (3, "baz")]
    assert igloo.cache.get("missing") is None
    assert igloo.cache.invalidate("test_key") is True
    assert igloo.cache.get("test_key") is None


def test_iceberg_dir_scan(igloo, tmp_path):
    # crates/connectors/iceberg/src/lib.rs:42-76 — recurse data/**/*.parquet;
    # :158-184 — missing data dir errors
    from igloo_spark.sources import read_iceberg_dir

    root = tmp_path / "iceberg_table"
    (root / "data" / "part=a").mkdir(parents=True)
    (root / "metadata").mkdir()
    (root / "metadata" / "version-hint.text").write_text("1")
    users = igloo.spark.createDataFrame(USERS_ROWS, USERS_SCHEMA)
    users.limit(2).write.parquet(str(root / "data" / "part=a" / "f1.parquet"))
    users.limit(5).subtract(users.limit(2)).write.parquet(str(root / "data" / "f2.parquet"))
    df = read_iceberg_dir(igloo.spark, str(root))
    assert df.count() == 5

    with pytest.raises(FileNotFoundError):
        read_iceberg_dir(igloo.spark, str(tmp_path / "nope"))


def test_execute_cached_fingerprint(igloo):
    # plan-fingerprint wiring: same semantic query → same cache entry
    igloo.cache.clear()
    igloo.register_table("users", igloo.spark.createDataFrame(USERS_ROWS, USERS_SCHEMA))
    igloo.execute_cached("SELECT name FROM users WHERE age > 30")
    n1 = len(igloo.cache)
    igloo.execute_cached("SELECT name FROM users WHERE age > 30")
    assert len(igloo.cache) == n1


def test_multimodal_resize_plumbing(spark):
    """resize_media: aspect-preserving geometry through the same
    mapInPandas path the real scaler would use."""
    from igloo_spark.operators.multimodal import attach_binary, decode_media, resize_media
    from igloo_spark.sources import load_testdata_table

    docs = load_testdata_table(spark, SF_SMOKE, "documents").limit(50)
    decoded = decode_media(attach_binary(docs, "doc_id", "text"), fake=True)
    resized = resize_media(decoded, target_w=224, target_h=224)
    rows = resized.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.out_w <= 224 and r.out_h <= 224
        assert abs(r.scale - min(224 / r.width, 224 / r.height)) < 1e-12
        # aspect preserved (integer floor tolerance)
        assert r.out_w == int(r.width * r.scale) and r.out_h == int(r.height * r.scale)


def test_multimodal_real_decode_is_gated(spark):
    """The codec gate is now scoped per payload: UNCOMPRESSED formats
    decode natively (test below), but a compressed/unknown payload
    without PIL still hits the documented NotImplementedError — at
    action time, since the dispatch is payload-inspecting."""
    import pytest as _pytest

    try:
        import PIL  # noqa: F401

        _pytest.skip("PIL present — the real-decode path applies (test below)")
    except ImportError:
        pass
    from igloo_spark.operators.multimodal import attach_binary, decode_media
    from igloo_spark.sources import load_testdata_table

    docs = load_testdata_table(spark, SF_SMOKE, "documents").limit(1)
    with _pytest.raises(Exception, match="codec library"):
        decode_media(
            attach_binary(docs, "doc_id", "text"), fake=False
        ).collect()


def test_multimodal_real_decode_bmp_no_codec(spark, tmp_path):
    """decode_media(fake=False) decodes a REAL image end-to-end in
    this sandbox: a 24-bit BMP written byte-by-byte via struct, read
    through binaryFile → from_binary_files → the mapInPandas real
    path — no PIL, pure-numpy parse."""
    import struct

    from igloo_spark.operators.multimodal import decode_media, from_binary_files

    w, h = 5, 3
    row = bytes([10, 20, 30] * w)  # BGR pixels
    pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
    pixel_data = (row + pad) * h
    data_off = 14 + 40
    file_size = data_off + len(pixel_data)
    header = (
        b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(pixel_data), 2835, 2835, 0, 0)
    )
    media = tmp_path / "media"
    media.mkdir()
    (media / "a.bmp").write_bytes(header + pixel_data)

    files = spark.read.format("binaryFile").load(str(media))
    out = decode_media(
        from_binary_files(files, mime="image/bmp"), fake=False
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
    assert r.byte_size == file_size


def test_multimodal_real_decode_with_pil(spark, tmp_path):
    """Flips on automatically the moment a container refresh ships
    PIL (importorskip — the jar-gated-source pattern): a real PNG
    decoded through the same binaryFile → from_binary_files →
    decode_media(fake=False) plumbing must report its true geometry."""
    import pytest as _pytest

    _pytest.importorskip("PIL")
    import io

    from PIL import Image

    from igloo_spark.operators.multimodal import decode_media, from_binary_files

    media = tmp_path / "media"
    media.mkdir()
    img = Image.new("RGB", (17, 9), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    (media / "a.png").write_bytes(buf.getvalue())

    files = spark.read.format("binaryFile").load(str(media))
    out = decode_media(from_binary_files(files, mime="image/png"), fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height, r.n_pixels) == (17, 9, 153)


def test_multi_source_federation(igloo, tmp_path):
    """The reference's headline story — one SQL over federated sources
    (parquet, CSV, JSON, in-memory) — as a single Catalyst plan with
    per-source pushdown."""
    from igloo_spark import sinks
    from igloo_spark.sources import load_testdata_table, memtable, read_csv, read_json

    nation = load_testdata_table(igloo.spark, SF_SMOKE, "nation")
    sinks.write_csv(nation, str(tmp_path / "nation_csv"))
    sinks.write_json(
        load_testdata_table(igloo.spark, SF_SMOKE, "customer"), str(tmp_path / "cust_json")
    )

    igloo.register_table("lineitem", load_testdata_table(igloo.spark, SF_SMOKE, "lineitem"))
    igloo.register_table("orders", load_testdata_table(igloo.spark, SF_SMOKE, "orders"))
    igloo.register_table(
        "nation_csv", read_csv(igloo.spark, str(tmp_path / "nation_csv"))
    )
    igloo.register_table("cust_json", read_json(igloo.spark, str(tmp_path / "cust_json")))
    igloo.register_table(
        "region_mem",
        memtable(
            igloo.spark,
            [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST")],
            "r_regionkey int, r_name string",
        ),
    )

    out = igloo.execute(
        """
        SELECT r.r_name, count(DISTINCT c.c_custkey) AS n_customers,
               sum(l.l_quantity) AS total_qty
        FROM lineitem l
        JOIN orders o     ON l.l_orderkey = o.o_orderkey
        JOIN cust_json c  ON o.o_custkey = c.c_custkey
        JOIN nation_csv n ON c.c_nationkey = n.n_nationkey
        JOIN region_mem r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    ).collect()
    assert len(out) == 5
    assert sum(r.n_customers for r in out) > 0
    # cross-check against the same join computed from parquet alone
    li = load_testdata_table(igloo.spark, SF_SMOKE, "lineitem")
    o = load_testdata_table(igloo.spark, SF_SMOKE, "orders")
    c = load_testdata_table(igloo.spark, SF_SMOKE, "customer")
    expected = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .agg({"l_quantity": "sum"})
        .collect()[0][0]
    )
    assert abs(sum(r.total_qty for r in out) - expected) < 1e-6


def test_connected_components_transitive(spark):
    """A~B, B~C must land in one group even though A~C was never
    compared; D~E is a separate group."""
    from igloo_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cache_lru_eviction(igloo):
    """Beyond max_entries, the least-recently-USED entry goes first —
    a get() refreshes recency (the reference cache has no eviction at
    all; crates/cache/src/lib.rs:20-56)."""
    from igloo_spark.plans import ResultCache

    cache = ResultCache(igloo.spark, max_entries=2)
    a = igloo.spark.range(1)
    b = igloo.spark.range(2)
    c = igloo.spark.range(3)
    cache.put("a", a)
    cache.put("b", b)
    assert cache.get("a") is not None  # refresh: now b is least-recent
    cache.put("c", c)                  # evicts b, not a
    assert cache.get("b") is None
    assert cache.get("a") is not None and cache.get("c") is not None


def test_execute_cached_fingerprint_with_aggregates(igloo):
    """Aggregate aliases allocate fresh expression ids per query; the
    fingerprint must normalize them so repeated (and syntactically
    variant) aggregate queries share one cache entry."""
    igloo.cache.clear()
    igloo.register_table("users", igloo.spark.createDataFrame(USERS_ROWS, USERS_SCHEMA))
    igloo.execute_cached("SELECT count(*) AS n FROM users WHERE age > 30")
    n1 = len(igloo.cache)
    igloo.execute_cached("select COUNT(*) as n from users where age > 30")
    assert len(igloo.cache) == n1


def test_cache_concurrent_access(igloo):
    """Mirrors the reference's cache concurrency test
    (crates/cache/src/lib.rs:106-191: 10 concurrent tasks put/get):
    interleaved put/get from 10 threads must neither corrupt entries
    nor lose the ones within capacity."""
    import threading

    from igloo_spark.plans import ResultCache

    cache = ResultCache(igloo.spark, max_entries=32)
    errors: list[Exception] = []

    def worker(i: int) -> None:
        try:
            df = igloo.spark.range(i, i + 3)
            cache.put(f"k{i}", df)
            got = cache.get(f"k{i}")
            assert got is not None
            assert [r.id for r in got.collect()] == [i, i + 1, i + 2]
        except Exception as e:  # surfaced below on the main thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(cache) == 10

def test_cache_concurrent_shared_key(igloo):
    """get() vs invalidate() on the SAME key from different threads —
    the CDC invalidator runs on the streaming thread, so the recency
    refresh inside get() must be atomic (no KeyError, no resurrection
    of an entry invalidate() already removed and unpersisted)."""
    import threading

    from igloo_spark.plans import ResultCache

    cache = ResultCache(igloo.spark, max_entries=32)
    df = igloo.spark.range(3)
    errors: list[Exception] = []
    stop = threading.Event()

    def getter() -> None:
        try:
            while not stop.is_set():
                cache.get("shared")  # None or a frame — never raises
        except Exception as e:
            errors.append(e)

    def churner() -> None:
        try:
            for _ in range(200):
                cache.put("shared", df)
                cache.invalidate("shared")
        except Exception as e:
            errors.append(e)
        finally:
            stop.set()

    threads = [threading.Thread(target=getter) for _ in range(4)]
    threads.append(threading.Thread(target=churner))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert cache.get("shared") is None


def test_fingerprint_distinguishes_attribute_instances(igloo):
    """Self-join projecting a.v vs b.v returns different rows, so the
    fingerprints must differ — erasing expression ids wholesale would
    conflate them (they differ ONLY in which instance is referenced)."""
    from igloo_spark.plans.cache import plan_fingerprint

    igloo.spark.createDataFrame(
        [(1, 10), (2, 20)], "k int, v int"
    ).createOrReplaceTempView("fp_t")
    qa = igloo.spark.sql("SELECT a.v AS v FROM fp_t a JOIN fp_t b ON a.k < b.k")
    qb = igloo.spark.sql("SELECT b.v AS v FROM fp_t a JOIN fp_t b ON a.k < b.k")
    assert [r.v for r in qa.collect()] != [r.v for r in qb.collect()]
    assert plan_fingerprint(qa) != plan_fingerprint(qb)
    # …while re-analysis of the SAME query (fresh expression ids) must
    # still collapse to one fingerprint.
    qa2 = igloo.spark.sql("SELECT a.v AS v FROM fp_t a JOIN fp_t b ON a.k < b.k")
    assert plan_fingerprint(qa) == plan_fingerprint(qa2)


def test_minhash_hot_band_cap(spark):
    """A boilerplate template repeated m times makes one band key emit
    m·(m-1)/2 pairs — the cap must drop those keys (linear exact-dedup
    handles the docs instead) while leaving normal near-dup pairs
    untouched."""
    from igloo_spark.operators.dedup import minhash_candidate_pairs

    boiler = [(i, "terms of service apply to all users of this site") for i in range(30)]
    normal = [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "the quick brown fox jumps over the lazy cat today"),
        (200, "completely unrelated text about spark physical plans"),
    ]
    df = spark.createDataFrame(boiler + normal, "doc_id bigint, text string")

    uncapped = minhash_candidate_pairs(df, "doc_id", "text", threshold=0.0)
    capped = minhash_candidate_pairs(df, "doc_id", "text", threshold=0.0, max_band_members=5)

    n_uncapped = uncapped.count()
    assert n_uncapped >= 30 * 29 // 2  # boilerplate is quadratic without the cap
    capped_rows = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # no boilerplate pair survives the cap...
    assert not any(a < 30 and b < 30 for a, b in capped_rows)
    # ...but pairs between normal docs are exactly the uncapped ones
    normal_uncapped = {
        (r.doc_a, r.doc_b) for r in uncapped.collect() if r.doc_a >= 100 and r.doc_b >= 100
    }
    normal_capped = {(a, b) for a, b in capped_rows if a >= 100 and b >= 100}
    assert normal_capped == normal_uncapped
    # a generous cap changes nothing at all
    wide = minhash_candidate_pairs(df, "doc_id", "text", threshold=0.0, max_band_members=1000)
    assert {(r.doc_a, r.doc_b) for r in wide.collect()} == {
        (r.doc_a, r.doc_b) for r in uncapped.collect()
    }


def test_binary_file_ingestion_to_decode(spark, tmp_path):
    """Real media-ingestion path: opaque files on disk → binaryFile
    source → multimodal layout → mapInPandas decode — the end-to-end
    pipeline a real corpus would run, with the codec faked."""
    from igloo_spark.operators.multimodal import decode_media, from_binary_files, sample_frames
    from igloo_spark.sources import read_binary_files

    media = tmp_path / "media"
    media.mkdir()
    payloads = {f"img_{i}.bin": bytes(range(10 + i * 7))[:10 + i * 7] for i in range(5)}
    for name, data in payloads.items():
        (media / name).write_bytes(data)
    (media / "notes.txt").write_text("not media")

    files = read_binary_files(spark, str(media), glob="*.bin")
    mm = from_binary_files(files, mime="image/fake")
    decoded = decode_media(mm, fake=True)
    rows = decoded.collect()
    assert len(rows) == 5  # glob filtered the .txt out
    assert sorted(r.byte_size for r in rows) == sorted(len(p) for p in payloads.values())
    assert all(r.mime == "image/fake" for r in rows)
    # 1→many frame sampling over the same ingested frame
    frames = sample_frames(mm, every_n=2)
    assert frames.count() >= 5


def test_fingerprint_distinguishes_literal_only_difference(igloo):
    """Queries differing only in a string literal that LOOKS like an
    attribute reference (s = 'x#1' vs 'x#2') must get different keys —
    guarded by both the canonical text and the semantic hash."""
    from igloo_spark.plans.cache import plan_fingerprint

    igloo.spark.createDataFrame(
        [("x#1", 1), ("x#2", 2)], "s string, v int"
    ).createOrReplaceTempView("fp_lit")
    qa = igloo.spark.sql("SELECT v FROM fp_lit WHERE s = 'x#1'")
    qb = igloo.spark.sql("SELECT v FROM fp_lit WHERE s = 'x#2'")
    assert [r.v for r in qa.collect()] != [r.v for r in qb.collect()]
    assert plan_fingerprint(qa) != plan_fingerprint(qb)
    # stability across re-analysis still holds with the hash mixed in
    qa2 = igloo.spark.sql("SELECT v FROM fp_lit WHERE s = 'x#1'")
    assert plan_fingerprint(qa) == plan_fingerprint(qa2)


def test_funnel_requires_stage_order(spark):
    """A user whose 'click' precedes every 'view' converts to stage 1
    but not stage 2 — ordering is strict, not mere membership."""
    from pyspark.sql import functions as F

    from igloo_spark.operators.events import funnel_counts

    rows = [
        # user 1: view -> click (in order)
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T01:00:00", "click"),
        # user 2: click BEFORE view — must not count as view>click
        (2, "2024-01-01T00:00:00", "click"),
        (2, "2024-01-01T01:00:00", "view"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_s string, event_type string").select(
        "user_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "event_type"
    )
    out = {r["stage"]: r["n_users"] for r in funnel_counts(df, ["view", "click"]).collect()}
    assert out["view"] == 2
    assert out["view > click"] == 1

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts(df, [])


def test_retention_cohorts_period_numbers(spark):
    from pyspark.sql import functions as F

    from igloo_spark.operators.events import retention_cohorts

    rows = [
        (1, "2024-01-01T10:00:00"),  # Monday, cohort week 0
        (1, "2024-01-09T10:00:00"),  # next week -> period 1
        (2, "2024-01-10T10:00:00"),  # cohort week of Jan 8
        (2, "2024-01-10T12:00:00"),  # same week -> period 0 only
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp_ntz").alias("ts")
    ).withColumn("event_type", F.lit("e"))
    got = {
        (str(r["cohort"]), r["period_n"]): r["n_active"]
        for r in retention_cohorts(df).collect()
    }
    assert got[("2024-01-01 00:00:00", 0)] == 1
    assert got[("2024-01-01 00:00:00", 1)] == 1
    assert got[("2024-01-08 00:00:00", 0)] == 1
    assert len(got) == 3

    import pytest

    with pytest.raises(ValueError, match="grain"):
        retention_cohorts(df, grain="month")


def test_funnel_conversion_window(spark):
    """With within='1 hour', a conversion 2 hours after the previous
    stage no longer counts; without it, it does."""
    from pyspark.sql import functions as F

    from igloo_spark.operators.events import funnel_counts

    rows = [
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:30:00", "click"),  # within the hour
        (2, "2024-01-01T00:00:00", "view"),
        (2, "2024-01-01T02:00:00", "click"),  # 2h later
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_s string, event_type string").select(
        "user_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "event_type"
    )
    loose = {r["stage"]: r["n_users"] for r in funnel_counts(df, ["view", "click"]).collect()}
    tight = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(df, ["view", "click"], within="1 hour").collect()
    }
    assert loose["view > click"] == 2
    assert tight["view > click"] == 1

    import pytest

    with pytest.raises(ValueError, match="within"):
        funnel_counts(df, ["view"], within="soonish")


def test_driver_entry_contract(igloo):
    """The external driver's actual contract surface: entry(spark)
    returns a DataFrame with rows and a stable schema; queries() maps
    the full registry; oracle_sql() covers every oracle-backed query
    with matching keys. This test is the in-repo stand-in for the
    driver's smoke gate — keep it importing __spark_entry__ directly."""
    import __spark_entry__ as e

    from igloo_spark.queries import all_queries

    df = e.entry(igloo.spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

    qs, osql = e.queries(), e.oracle_sql()
    reg = all_queries()
    assert set(qs) == set(reg)
    assert set(osql) == {n for n, s in reg.items() if s.oracle is not None}
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())


def test_driver_canonicalizer_schema_contract(igloo, corpus_frames):
    """The driver's correctness gate canonicalizes results with pandas
    (sort_values over every column, then hash). Raw ArrayType/MapType/
    StructType top-level columns are unhashable there and turn a green
    query into a driver `err` row (q78/x80 in round 4, q53/q63/x58 in
    round 2). Lock the contract: every oracle-backed query must emit
    only atomic top-level columns — serialize collections with
    array_join/to_json in the final projection of BOTH engines.
    Rows-only queries (oracle is None) are exempt: the driver only
    counts their rows."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from igloo_spark.queries import all_queries

    offenders = []
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        df = corpus_frames(name, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "driver-unhashable top-level columns (serialize in the final "
        f"projection of both engines): {offenders}"
    )
