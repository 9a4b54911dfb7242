"""End-to-end tests: Flight round trip + streaming CDC pipeline."""

from __future__ import annotations

import json
import time

import pytest


def test_flight_round_trip(igloo):
    # reference semantics: get_flight_info(cmd=sql) → schema; do_get(ticket=sql) → batches
    # (crates/api/src/lib.rs:81-149)
    flight = pytest.importorskip("pyarrow.flight")
    from igloo_spark.serving import query_via_flight, serve_in_background

    igloo.register_parquet_dir("/root/testdata/sf0.001", ["nation", "region"])
    server, thread = serve_in_background(igloo)
    try:
        client = flight.connect(f"grpc://127.0.0.1:{server.port}")
        sql = "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_name LIMIT 5"
        info = client.get_flight_info(flight.FlightDescriptor.for_command(sql.encode()))
        assert [f.name for f in info.schema] == ["n_name", "r_name"]

        tbl = query_via_flight(server.port, sql)
        assert tbl.num_rows == 5
        assert tbl.column_names == ["n_name", "r_name"]
    finally:
        server.shutdown()


def test_flight_schema_is_lazy(igloo):
    """get_flight_info must not execute the query (unlike the reference,
    which eagerly collects — lib.rs:86-92). A query whose execution
    would fail (division by a column that errors under strict mode) is
    fine here because schema derivation never runs the plan."""
    flight = pytest.importorskip("pyarrow.flight")
    from igloo_spark.serving import serve_in_background

    server, _ = serve_in_background(igloo)
    try:
        client = flight.connect(f"grpc://127.0.0.1:{server.port}")
        # raise_error would fail at runtime; schema derivation must succeed
        sql = "SELECT CAST(raise_error('must not execute') AS STRING) AS boom"
        info = client.get_flight_info(flight.FlightDescriptor.for_command(sql.encode()))
        assert [f.name for f in info.schema] == ["boom"]
    finally:
        server.shutdown()


def test_flight_do_put_registers_table(igloo):
    # reference leaves do_put unimplemented (crates/api/src/lib.rs:151-156);
    # ours accepts an upload and makes it queryable in the same session
    pytest.importorskip("pyarrow.flight")
    import pyarrow as pa

    from igloo_spark.serving import query_via_flight, serve_in_background, upload_via_flight

    server, _ = serve_in_background(igloo)
    try:
        tbl = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
        upload_via_flight(server.port, "uploaded", tbl)
        out = query_via_flight(server.port, "SELECT k, v FROM uploaded WHERE k >= 2 ORDER BY k")
        assert out.column_names == ["k", "v"]
        assert out.column("k").to_pylist() == [2, 3]
    finally:
        server.shutdown()


def test_flight_do_put_preserves_types(igloo):
    """Upload must keep the client's schema exactly: nullable ints stay
    integral (a pandas hop would widen them to float64) and timestamp
    values survive to the microsecond."""
    pytest.importorskip("pyarrow.flight")
    from datetime import datetime

    import pyarrow as pa

    from igloo_spark.serving import query_via_flight, serve_in_background, upload_via_flight

    server, _ = serve_in_background(igloo)
    try:
        tbl = pa.table(
            {
                "k": pa.array([1, None, 3], pa.int64()),
                "ts": pa.array(
                    [datetime(2024, 5, 1, 12, 30, 0, 123456), None, datetime(2024, 5, 2)],
                    pa.timestamp("us"),
                ),
                "d": pa.array([None, 2.5, 3.25], pa.float64()),
            }
        )
        upload_via_flight(server.port, "typed_upload", tbl)
        out = query_via_flight(server.port, "SELECT k, ts, d FROM typed_upload ORDER BY d NULLS FIRST")
        assert pa.types.is_integer(out.schema.field("k").type), out.schema
        assert pa.types.is_timestamp(out.schema.field("ts").type), out.schema
        assert out.column("k").to_pylist() == [1, None, 3]
        # Spark serves timestamps as TIMESTAMP_LTZ in the session (UTC)
        # zone; the instant — down to the microsecond — must be intact.
        got_ts = out.column("ts").to_pylist()[0]
        assert got_ts.replace(tzinfo=None) == datetime(2024, 5, 1, 12, 30, 0, 123456)
    finally:
        server.shutdown()


def test_cli_serve_flag():
    """`igloo_spark.cli --serve` must expose the catalog over Flight."""
    pytest.importorskip("pyarrow.flight")
    import re
    import subprocess

    from igloo_spark.serving import query_via_flight

    proc = subprocess.Popen(
        ["python", "-m", "igloo_spark.cli", "--serve", "0",
         "--data-dir", "/root/testdata/sf0.001"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        port = None
        deadline = time.time() + 90
        while time.time() < deadline:
            line = proc.stdout.readline()
            m = re.search(r"listening on grpc://127\.0\.0\.1:(\d+)", line or "")
            if m:
                port = int(m.group(1))
                break
        assert port, "server did not report a port"
        tbl = query_via_flight(port, "SELECT count(*) AS n FROM nation")
        assert tbl.column("n").to_pylist() == [25]
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_streaming_windowed_counts(igloo, tmp_path):
    from igloo_spark.streaming import change_stream, windowed_counts

    src = tmp_path / "cdc"
    src.mkdir()
    rows = [
        {"table_name": "orders", "op": "insert", "key": "1", "ts": "2024-01-01T00:00:10"},
        {"table_name": "orders", "op": "insert", "key": "2", "ts": "2024-01-01T00:00:20"},
        {"table_name": "customer", "op": "delete", "key": "9", "ts": "2024-01-01T00:01:30"},
    ]
    (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = change_stream(igloo.spark, str(src))
    assert stream.isStreaming
    agg = windowed_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("cdc_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = {(r.table_name, r.op): r.n_changes for r in igloo.spark.sql("SELECT * FROM cdc_counts").collect()}
    assert out[("orders", "insert")] == 2
    assert out[("customer", "delete")] == 1


def test_streaming_cache_invalidation(igloo, tmp_path):
    from igloo_spark.streaming import cache_invalidator, change_stream

    df = igloo.spark.range(5).toDF("id")
    igloo.cache.put("orders_summary", df)
    igloo.cache.put("unrelated", df)
    assert igloo.cache.get("orders_summary") is not None

    src = tmp_path / "cdc2"
    src.mkdir()
    (src / "b.json").write_text(
        json.dumps({"table_name": "orders", "op": "update", "key": "1", "ts": "2024-01-01T00:00:00"})
    )
    q = cache_invalidator(
        change_stream(igloo.spark, str(src)),
        igloo.cache,
        {"orders": ["orders_summary"]},
        str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(60)
    assert igloo.cache.get("orders_summary") is None
    assert igloo.cache.get("unrelated") is not None


def test_streaming_dedup_within_watermark(igloo, tmp_path):
    """Duplicate change events — including a replay arriving in a later
    micro-batch — must be emitted exactly once."""
    from igloo_spark.streaming import change_stream, dedup_stream

    src = tmp_path / "dedup_src"
    src.mkdir()
    rows = [
        {"table_name": "orders", "op": "insert", "key": "1", "ts": "2024-01-01T00:00:10"},
        {"table_name": "orders", "op": "insert", "key": "1", "ts": "2024-01-01T00:00:11"},
        {"table_name": "orders", "op": "insert", "key": "2", "ts": "2024-01-01T00:00:12"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    # batch 2: replay of key=1 within the watermark horizon
    (src / "b2.json").write_text(
        json.dumps(
            {"table_name": "orders", "op": "insert", "key": "1", "ts": "2024-01-01T00:00:30"}
        )
    )
    stream = (
        igloo.spark.readStream.schema(change_stream(igloo.spark, str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    deduped = dedup_stream(stream, ["table_name", "op", "key"], "ts", "10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = igloo.spark.sql("SELECT key, count(*) AS n FROM dedup_out GROUP BY key").collect()
    assert {r.key: r.n for r in out} == {"1": 1, "2": 1}


def test_stateful_sessionization_spans_batches(igloo, tmp_path):
    """A session whose events arrive in two different micro-batches must
    be emitted once, stitched together from the state store."""
    from igloo_spark.streaming import sessionize_stream
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("user_id", LongType()), StructField("ts", StringType())]
    )
    src = tmp_path / "sess_src"
    src.mkdir()
    # batch 1: two events 10s apart (same session, stays open in state)
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "ts": "2024-01-01T00:00:00"},
                {"user_id": 1, "ts": "2024-01-01T00:00:10"},
            ]
        )
    )
    # batch 2: one continuation (+10s) then a far-future event that
    # closes the session
    (src / "b2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "ts": "2024-01-01T00:00:20"},
                {"user_id": 1, "ts": "2024-01-01T12:00:00"},
            ]
        )
    )
    events = (
        igloo.spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    sessions = sessionize_stream(events, gap_seconds=60)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = igloo.spark.sql("SELECT * FROM sessions_out").collect()
    assert len(rows) == 1, f"expected exactly one closed session, got {rows}"
    r = rows[0]
    assert r.user_id == 1 and r.n_events == 3
    assert r.session_start.isoformat() == "2024-01-01T00:00:00"
    assert r.session_end.isoformat() == "2024-01-01T00:00:20"


def test_streaming_static_enrichment(igloo, tmp_path):
    """Stream–static join: change events decorated with dimension
    attributes via a broadcast probe — no stream shuffle, no state."""
    from igloo_spark.streaming import change_stream, enrich_stream

    src = tmp_path / "enrich_src"
    src.mkdir()
    rows = [
        {"table_name": "orders", "op": "insert", "key": "1", "ts": "2024-01-01T00:00:10"},
        {"table_name": "customer", "op": "delete", "key": "9", "ts": "2024-01-01T00:00:20"},
        {"table_name": "unknown_tbl", "op": "insert", "key": "3", "ts": "2024-01-01T00:00:30"},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    dim = igloo.spark.createDataFrame(
        [("orders", "fact", 1), ("customer", "dim", 2)],
        "table_name string, kind string, tier int",
    )
    enriched = enrich_stream(change_stream(igloo.spark, str(src)), dim, on="table_name")
    assert enriched.isStreaming
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_cdc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = {r.table_name: (r.kind, r.tier) for r in igloo.spark.sql("SELECT * FROM enriched_cdc").collect()}
    assert out["orders"] == ("fact", 1)
    assert out["customer"] == ("dim", 2)
    assert out["unknown_tbl"] == (None, None)  # left join keeps unmatched events


def test_stream_stream_interval_join(igloo, tmp_path):
    """Two change feeds correlated on key within a time bound: the
    in-window pair matches, the out-of-window pair does not, and both
    sides keep bounded state (watermark + interval condition)."""
    from igloo_spark.streaming import change_stream, correlate_streams

    lsrc = tmp_path / "left_src"
    rsrc = tmp_path / "right_src"
    lsrc.mkdir()
    rsrc.mkdir()
    (lsrc / "l.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"table_name": "orders", "op": "insert", "key": "A", "ts": "2024-01-01T00:00:00"},
                {"table_name": "orders", "op": "insert", "key": "B", "ts": "2024-01-01T00:00:00"},
            ]
        )
    )
    (rsrc / "r.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                # A: 2 minutes later -> inside the 5-minute window
                {"table_name": "payments", "op": "insert", "key": "A", "ts": "2024-01-01T00:02:00"},
                # B: 9 minutes later -> outside
                {"table_name": "payments", "op": "insert", "key": "B", "ts": "2024-01-01T00:09:00"},
            ]
        )
    )
    joined = correlate_streams(
        change_stream(igloo.spark, str(lsrc)),
        change_stream(igloo.spark, str(rsrc)),
        key="key",
        within="5 minutes",
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("correlated")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_corr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = igloo.spark.sql("SELECT key, table_name, table_name_r FROM correlated").collect()
    assert [(r.key, r.table_name, r.table_name_r) for r in rows] == [("A", "orders", "payments")]


def test_flight_list_flights_advertises_catalog(igloo):
    """list_flights (unimplemented in the reference) must advertise
    every registered table with its schema and a runnable ticket."""
    flight = pytest.importorskip("pyarrow.flight")
    from igloo_spark.serving import serve_in_background

    igloo.register_parquet_dir("/root/testdata/sf0.001", ["nation", "region"])
    server, _ = serve_in_background(igloo)
    try:
        client = flight.connect(f"grpc://127.0.0.1:{server.port}")
        infos = {
            i.descriptor.command.decode(): [f.name for f in i.schema]
            for i in client.list_flights()
        }
        assert "SELECT * FROM nation" in infos
        assert "n_name" in infos["SELECT * FROM nation"]
        # the advertised ticket is directly runnable
        reader = client.do_get(flight.Ticket(b"SELECT * FROM region"))
        assert reader.read_all().num_rows == 5
    finally:
        server.shutdown()


def test_versioned_stream_sink_exactly_once(igloo, tmp_path):
    """Streamed micro-batches land as snapshots; a replayed batch id
    (at-least-once delivery) is a no-op, a fresh one appends."""
    from igloo_spark.streaming import change_stream
    from igloo_spark.sources.versioned import (
        last_committed_batch,
        read_versioned,
        snapshots,
        versioned_stream_sink,
    )

    src = tmp_path / "cdc"
    src.mkdir()
    rows = [
        {"table_name": "orders", "op": "insert", "key": str(i), "ts": f"2024-01-01T00:00:{i:02d}"}
        for i in range(6)
    ]
    (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))

    root = str(tmp_path / "sink_table")
    q = (
        change_stream(igloo.spark, str(src))
        .writeStream.foreachBatch(versioned_stream_sink(root))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert read_versioned(igloo.spark, root).count() == 6
    committed = last_committed_batch(root)
    assert committed >= 0

    # simulated crash-replay: same batch id delivered again -> no-op
    replay = read_versioned(igloo.spark, root).limit(3)
    versioned_stream_sink(root)(replay, committed)
    assert read_versioned(igloo.spark, root).count() == 6
    assert len(snapshots(root)) == 1

    # a genuinely new batch appends
    versioned_stream_sink(root)(replay, committed + 1)
    assert read_versioned(igloo.spark, root).count() == 9
    assert last_committed_batch(root) == committed + 1


def test_streaming_pii_scrub(igloo, tmp_path):
    """The PII functions are stateless column expressions, so they
    compose with readStream unchanged — the ingest-time scrub an LLM
    pipeline runs before raw text ever lands. Verifies counts and
    redaction on a file stream, micro-batch by micro-batch."""
    import json as _json

    from pyspark.sql import functions as F

    from igloo_spark.functions.text import pii_count, redact_pii

    src = tmp_path / "docs_in"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "mail me at a@b.io today"},
                {"doc_id": 2, "text": "clean document"},
            ]
        )
    )
    (src / "b2.json").write_text(
        _json.dumps({"doc_id": 3, "text": "ssn 123-45-6789 leaked"})
    )
    schema = "doc_id BIGINT, text STRING"
    stream = (
        igloo.spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    scrubbed = stream.select(
        "doc_id",
        redact_pii(F.col("text")).alias("text"),
        (pii_count(F.col("text"), "email") + pii_count(F.col("text"), "ssn")).alias(
            "n_pii"
        ),
    )
    q = (
        scrubbed.writeStream.format("memory")
        .queryName("pii_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "pii_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r.doc_id: r for r in igloo.spark.sql("SELECT * FROM pii_out").collect()}
    assert out[1].text == "mail me at [EMAIL] today" and out[1].n_pii == 1
    assert out[2].text == "clean document" and out[2].n_pii == 0
    assert out[3].text == "ssn [SSN] leaked" and out[3].n_pii == 1


def test_streaming_ingest_pipeline_end_to_end(igloo, tmp_path):
    """The full ingest composition a training pipeline runs on a raw
    document stream: quality gate (token floor) → PII scrub →
    exactly-once versioned sink — then a batch reader sees the scrubbed
    state, a replayed micro-batch commits nothing, and time travel
    still shows the first micro-batch alone."""
    import json as _json

    from pyspark.sql import functions as F

    from igloo_spark.functions.text import redact_pii, token_count
    from igloo_spark.sources.versioned import (
        last_committed_batch,
        read_versioned,
        snapshots,
        versioned_stream_sink,
    )

    src = tmp_path / "raw_docs"
    src.mkdir()
    (src / "b1.jsonl").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "reach me at a@b.io for the full dataset details"},
                {"doc_id": 2, "text": "short"},  # fails the token floor
                {"doc_id": 3, "text": "a clean document with enough tokens to pass easily"},
            ]
        )
    )
    (src / "b2.jsonl").write_text(
        _json.dumps(
            {"doc_id": 4, "text": "second batch calls 415-555-1234 about the corpus"}
        )
    )
    # FileStreamSource orders by mtime with filesystem-dependent tie
    # order; pin distinct mtimes so b1 is deterministically batch 0
    import os as _os
    import time as _time

    now = _time.time()
    _os.utime(src / "b1.jsonl", (now - 10, now - 10))
    _os.utime(src / "b2.jsonl", (now, now))

    root = str(tmp_path / "clean_docs")
    stream = (
        igloo.spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    cleaned = stream.filter(token_count(F.col("text")) >= 5).select(
        "doc_id", redact_pii(F.col("text")).alias("text")
    )
    q = (
        cleaned.writeStream.foreachBatch(versioned_stream_sink(root, mode="append"))
        .option("checkpointLocation", str(tmp_path / "ingest_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = {r["doc_id"]: r["text"] for r in read_versioned(igloo.spark, root).collect()}
    assert set(out) == {1, 3, 4}, "quality gate must drop doc 2"
    assert out[1] == "reach me at [EMAIL] for the full dataset details"
    assert out[4] == "second batch calls [PHONE] about the corpus"

    # exactly-once: replaying the last committed batch is a no-op
    wm = last_committed_batch(root)
    n_snaps = len(snapshots(root))
    replay = igloo.spark.createDataFrame([(9, "replayed row not committed")], "doc_id bigint, text string")
    versioned_stream_sink(root, mode="append")(replay, wm)
    assert len(snapshots(root)) == n_snaps

    # time travel: the first snapshot holds only micro-batch 1's docs
    assert {r["doc_id"] for r in read_versioned(igloo.spark, root, version=1).collect()} == {1, 3}


def test_streaming_neardup_gate(igloo, tmp_path):
    """Ingest-time near-dup gate: a streamed document sharing a long
    token run with history is flagged; a novel document is not; the
    verdicts accumulate across micro-batches via foreachBatch."""
    from igloo_spark.operators.dedup import winnow_fingerprints
    from igloo_spark.streaming.neardup import neardup_gate_stream

    spark = igloo.spark
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    history_docs = spark.createDataFrame(
        [(100, f"historic document body {shared} with trailing words here"),
         (101, "completely different historical content nothing shared at all ok")],
        "doc_id long, text string",
    )
    history_fp = winnow_fingerprints(history_docs, "doc_id", "text")

    src = tmp_path / "docs_src"
    src.mkdir()
    (src / "b1.json").write_text(
        json.dumps({"doc_id": 1, "text": f"incoming copy with {shared} inside it"})
        + "\n"
        + json.dumps({"doc_id": 2, "text": "fresh novel words never seen before in any document stream"})
    )
    (src / "b2.json").write_text(
        json.dumps({"doc_id": 3, "text": f"later batch also contains {shared} run"})
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    results: dict[int, tuple[int, bool]] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            results[r["doc_id"]] = (r["n_shared"], r["is_neardup"])

    q = neardup_gate_stream(
        stream, history_fp, sink, str(tmp_path / "nd_ckpt"), min_shared=1
    )
    q.awaitTermination(120)
    assert results[1][1] is True and results[1][0] >= 1
    assert results[2] == (0, False)
    assert results[3][1] is True


def test_streaming_exactsubstr_cleaning(igloo, tmp_path):
    """The streaming span-REMOVAL pass (r05 verdict stretch #8): the
    near-dup gate flags; this cleans. Documents streamed across two
    micro-batches have their history-shared token runs cut (history
    keeps its copy); novel documents pass through untouched with
    n_removed=0 and the hash of their unchanged text."""
    from igloo_spark.operators.dedup import winnow_fingerprints
    from igloo_spark.streaming.neardup import exactsubstr_clean_stream

    spark = igloo.spark
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
    history_docs = spark.createDataFrame(
        [(100, f"historic document body {shared} with trailing words here"),
         (101, "completely different historical content nothing shared at all ok")],
        "doc_id long, text string",
    )
    history_fp = winnow_fingerprints(history_docs, "doc_id", "text")

    src = tmp_path / "clean_src"
    src.mkdir()
    novel = "fresh novel words never seen before in any document stream"
    (src / "b1.json").write_text(
        json.dumps({"doc_id": 1, "text": f"incoming copy with {shared} inside it"})
        + "\n"
        + json.dumps({"doc_id": 2, "text": novel})
    )
    (src / "b2.json").write_text(
        json.dumps({"doc_id": 3, "text": f"later batch also contains {shared} run"})
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    results = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            results[r["doc_id"]] = r

    q = exactsubstr_clean_stream(
        stream, history_docs, history_fp, sink, str(tmp_path / "es_ckpt")
    )
    q.awaitTermination(120)

    assert set(results) == {1, 2, 3}
    # doc 1: the 10-token run is cut; surrounding words survive
    assert results[1]["n_removed"] == 10
    assert results[1]["n_tokens"] == 15
    # doc 2: untouched; clean_fp equals the hash of its own text
    import hashlib

    assert results[2]["n_removed"] == 0
    assert results[2]["clean_fp"] == hashlib.md5(novel.encode()).hexdigest()
    # doc 3 (second micro-batch): cleaned against the same history
    assert results[3]["n_removed"] == 10


def test_streaming_semantic_gate(igloo, tmp_path):
    """Ingest-time semantic decontamination (x106's streaming twin): a
    streamed embedding near an eval vector is flagged across
    micro-batches; orthogonal vectors pass."""
    from igloo_spark.streaming.neardup import semantic_gate_stream

    spark = igloo.spark
    eval_emb = spark.createDataFrame(
        [(900, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    src = tmp_path / "emb_src"
    src.mkdir()
    (src / "b1.json").write_text(
        json.dumps({"vec_id": 1, "embedding": [0.999, 0.01, 0.0, 0.0]})
        + "\n"
        + json.dumps({"vec_id": 2, "embedding": [0.0, 0.0, 1.0, 0.0]})
    )
    (src / "b2.json").write_text(
        json.dumps({"vec_id": 3, "embedding": [0.98, 0.0, 0.199, 0.0]})
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    results: dict[int, tuple[int, bool]] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            results[r["vec_id"]] = (r["nearest_eval_id"], r["contaminated"])

    q = semantic_gate_stream(
        stream, eval_emb, sink, str(tmp_path / "sg_ckpt"), threshold=0.9
    )
    q.awaitTermination(120)
    assert results[1] == (900, True)
    assert results[2][1] is False
    assert results[3] == (900, True)


def test_flight_actions(igloo):
    """do_action/list_actions (both unimplemented in the reference):
    health, version, explain, and cache invalidation round-trip
    through a live server."""
    from igloo_spark.serving.flight import action_via_flight, serve_in_background

    server, _ = serve_in_background(igloo)
    try:
        port = server.port
        import pyarrow.flight as flight

        listed = {a.type for a in flight.connect(f"grpc://127.0.0.1:{port}").list_actions()}
        assert {"health", "version", "invalidate_cache", "explain"} <= listed

        h = action_via_flight(port, "health")
        assert h["status"] == "ok" and h["tables"] >= 0
        v = action_via_flight(port, "version")
        assert v["engine"] == "igloo-spark" and v["spark"].startswith("4.")
        ex = action_via_flight(port, "explain", "SELECT 1 AS one")
        assert "Project" in ex["plan"] or "one" in ex["plan"]

        # cache invalidation: warm an entry, drop it via the action
        igloo.execute_cached("SELECT 42 AS answer")
        assert len(igloo.cache._entries) >= 1
        r = action_via_flight(port, "invalidate_cache")
        assert r["invalidated"] is True
        assert len(igloo.cache._entries) == 0

        import pytest as _pytest

        with _pytest.raises(Exception, match="unknown action"):
            action_via_flight(port, "nope")
    finally:
        server.shutdown()


def test_streaming_weighted_admission(igloo, tmp_path):
    """weighted_sample is a stateless scan-stage filter, so it is
    streaming-legal DIRECTLY on a readStream frame (no foreachBatch):
    in-stream admission control with the same deterministic decisions
    the batch path makes."""
    from igloo_spark.operators.packing import weighted_sample

    spark = igloo.spark
    src = tmp_path / "adm_src"
    src.mkdir()
    rows = [{"doc_id": i, "w": (i % 11) / 10.0} for i in range(200)]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("doc_id long, w double").json(str(src))
    gated = weighted_sample(stream, "doc_id", "w")
    assert gated.isStreaming
    got: set[int] = set()

    def sink(batch_df, batch_id):
        got.update(r["doc_id"] for r in batch_df.collect())

    q = (
        gated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "adm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = spark.createDataFrame([(r["doc_id"], r["w"]) for r in rows], "doc_id long, w double")
    want = {r["doc_id"] for r in weighted_sample(batch, "doc_id", "w").collect()}
    assert got == want and got  # stream decisions == batch decisions


def test_streaming_kl_drift_monitor(igloo, tmp_path):
    """Drift monitor: a batch matching the reference distribution
    scores near-zero KL with low OOV; a drifted batch (different
    vocabulary) shows a high out-of-vocab fraction."""
    from igloo_spark.streaming.monitor import batch_kl, kl_drift_stream, reference_distribution

    spark = igloo.spark
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again " * 2) for i in range(10)],
        "doc_id long, text string",
    )
    reference = reference_distribution(ref, top=50)

    # batch-level unit check first: matching batch ≈ 0 KL, 0 OOV
    match = spark.createDataFrame(
        [(0, "webA", "the quick brown fox jumps over the lazy dog again")],
        "doc_id long, source string, text string",
    )
    row = batch_kl(match, reference).first()
    assert row["kl"] is not None and abs(row["kl"]) < 0.05
    assert row["oov_frac"] == 0.0

    # streaming path: second micro-batch has drifted vocabulary
    src = tmp_path / "drift_src"
    src.mkdir()
    (src / "b1.json").write_text(json.dumps(
        {"doc_id": 1, "source": "webA",
         "text": "the quick brown fox jumps over the lazy dog again"}))
    (src / "b2.json").write_text(json.dumps(
        {"doc_id": 2, "source": "webB",
         "text": "völlig andere wörter aus einer anderen sprache hier jetzt"}))
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    got: dict[str, tuple] = {}

    def sink(df, bid):
        for r in df.collect():
            got[r["source"]] = (r["kl"], r["oov_frac"])

    q = kl_drift_stream(stream, ref, sink, str(tmp_path / "kd_ckpt"))
    q.awaitTermination(120)
    assert got["webA"][1] == 0.0 and abs(got["webA"][0]) < 0.05
    # fully drifted feed: every token out-of-vocabulary; KL undefined
    # (NULL) over the empty in-vocab mass — but the source MUST appear
    assert got["webB"][1] == 1.0 and got["webB"][0] is None, got


def test_cli_serve_corpus_store(tmp_path):
    """`--serve --corpus-store` must expose an ingested versioned
    store's snapshot over Flight — the serve half of the CLI ingest
    loop (ingest nightly, serve the curated corpus to consumers)."""
    pytest.importorskip("pyarrow.flight")
    import re
    import subprocess

    import pyarrow as pa
    import pyarrow.parquet as pq

    from igloo_spark.cli import main
    from igloo_spark.serving import query_via_flight

    d = tmp_path / "svdocs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, 7), pa.int64()),
                "text": pa.array(
                    [f"serve me document {i} with words {i}a {i}b {i}c"
                     for i in range(1, 7)],
                    pa.string(),
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    store = str(tmp_path / "svstore")
    assert main(["--data-dir", str(d), "--ingest", store,
                 "--min-quality", "0.0"]) == 0

    proc = subprocess.Popen(
        ["python", "-m", "igloo_spark.cli", "--serve", "0",
         "--corpus-store", store],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        port = None
        deadline = time.time() + 90
        while time.time() < deadline:
            line = proc.stdout.readline()
            m = re.search(r"listening on grpc://127\.0\.0\.1:(\d+)", line or "")
            if m:
                port = int(m.group(1))
                break
        assert port, "server did not report a port"
        tbl = query_via_flight(port, "SELECT count(*) AS n FROM corpus")
        assert tbl.column("n").to_pylist() == [6]
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_flight_do_exchange_transform_roundtrip(igloo):
    """do_exchange: upload + transform + stream back in ONE call (the
    reference leaves this RPC unimplemented, crates/api/src/lib.rs:
    172-177). The SQL references the uploaded frame as
    ``exchange_input``; the temp view must not leak into the catalog
    afterwards, and two sequential exchanges must not clobber."""
    pytest.importorskip("pyarrow.flight")
    import pyarrow as pa

    from igloo_spark.serving import exchange_via_flight, serve_in_background

    server, _ = serve_in_background(igloo)
    try:
        tbl = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                        "v": pa.array([10, 20, 30], pa.int64())})
        out = exchange_via_flight(
            server.port,
            "SELECT k, v * 2 AS v2 FROM exchange_input WHERE k >= 2 ORDER BY k",
            tbl,
        )
        assert out.column("k").to_pylist() == [2, 3]
        assert out.column("v2").to_pylist() == [40, 60]
        # second exchange with a different shape — no clobber, no leak
        tbl2 = pa.table({"s": pa.array(["b", "a"], pa.string())})
        out2 = exchange_via_flight(
            server.port,
            "SELECT upper(s) AS u FROM exchange_input ORDER BY u",
            tbl2,
        )
        assert out2.column("u").to_pylist() == ["A", "B"]
        leaked = [t.name for t in igloo.spark.catalog.listTables()
                  if t.name.startswith("_igloo_exchange_")]
        assert leaked == []
    finally:
        server.shutdown()


def test_flight_poll_flight_info_gated(igloo):
    """poll_flight_info (the last reference RPC,
    crates/api/src/lib.rs:183): pyarrow 16.x exposes no PollInfo
    surface, so the override is version-gated — assert the gate
    tracks the installed pyarrow exactly, and exercise the terminal
    PollInfo when the surface exists."""
    import pyarrow.flight as flight

    from igloo_spark.serving.flight import IglooFlightServer

    supported = hasattr(flight.FlightServerBase, "poll_flight_info")
    overridden = "poll_flight_info" in IglooFlightServer.__dict__
    assert overridden == supported
    if not supported:
        pytest.skip("pyarrow has no PollFlightInfo surface (needs >16.x)")
    from igloo_spark.serving.flight import serve_in_background

    server, _ = serve_in_background(igloo)
    try:
        client = flight.connect(f"grpc://127.0.0.1:{server.port}")
        desc = flight.FlightDescriptor.for_command(b"SELECT 1 AS one")
        poll = client.poll_flight_info(desc)
        assert poll.info is not None
        assert poll.descriptor is None  # terminal: no re-poll needed
    finally:
        server.shutdown()


def test_streaming_temperature_mix_frozen_rates(igloo, tmp_path):
    """Round-12: temperature mixing in a STREAM — rates are frozen
    from the reference corpus (temperature_rates, one bounded
    aggregate) and applied in-stream as a stateless scan gate
    (apply_mix_rates, no aggregate/state => streaming-legal). The
    in-stream kept set must equal temperature_sample's batch decision
    bit-for-bit, and an unseen source must pass at the default rate
    (mix-recipe staleness is a signal, not silent data loss)."""
    from igloo_spark.operators.packing import (
        apply_mix_rates,
        temperature_rates,
        temperature_sample,
    )

    spark = igloo.spark
    rows = [
        {"doc_id": i, "source": ("head" if i % 4 else "tail")}
        for i in range(240)
    ]
    batch = spark.createDataFrame(
        [(r["doc_id"], r["source"]) for r in rows], "doc_id long, source string"
    )
    rates = temperature_rates(batch, "source", alpha=0.5)
    assert rates["tail"] == 1_000_000  # the smallest class keeps all

    src = tmp_path / "tmix_src"
    src.mkdir()
    stream_rows = rows + [{"doc_id": 9001, "source": "unseen"}]
    (src / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in stream_rows)
    )
    stream = spark.readStream.schema("doc_id long, source string").json(
        str(src)
    )
    gated = apply_mix_rates(stream, "doc_id", "source", rates)
    assert gated.isStreaming
    got: set[int] = set()

    def sink(batch_df, batch_id):
        got.update(r["doc_id"] for r in batch_df.collect())

    q = (
        gated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "tmix_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = {
        r["doc_id"]
        for r in temperature_sample(batch, "doc_id", "source", 0.5).collect()
    }
    assert got - {9001} == want   # stream decisions == operator's
    assert 9001 in got            # unseen source kept at default rate
