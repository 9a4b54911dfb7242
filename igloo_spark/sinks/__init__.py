"""Sink connectors (write path).

The reference implements **no sinks at all** — no INSERT/CTAS/write
path exists anywhere in igloo-io/igloo (``do_put`` is unimplemented,
``crates/api/src/lib.rs:151-156``; results are only streamed to the
client or pretty-printed, ``crates/igloo/src/main.rs:92``). A complete
engine needs one: the result-cache materialization tier, benchmark
output, and any ETL/training-data pipeline all write.

Scale posture (100 TB):

- **File sizing**: ``maxRecordsPerFile`` caps file size so a skewed
  partition doesn't produce one 500 GB file; AQE coalescing keeps the
  small-file count down on the other end.
- **Partitioned layout**: ``partition_by`` → Hive-style directory
  partitioning; readers get partition pruning for free. Combined with
  a repartition on the partition columns before the write, each task
  writes at most one file per partition value instead of
  ``n_tasks × n_partitions`` small files.
- **Bucketing**: ``bucket_by`` pre-shuffles on the join key at write
  time, so repeated large joins on that key skip their shuffle —
  the classic fact-table optimization for recurring pipelines.
- **Compression**: zstd default (better ratio than snappy at similar
  decode speed on modern CPUs; matters at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
    compression: str = "zstd",
    max_records_per_file: int | None = 5_000_000,
    single_file_per_partition: bool = True,
    bloom_filter_cols: list[str] | None = None,
    **options,
) -> None:
    """Parquet sink with scale-aware layout.

    With ``partition_by`` and ``single_file_per_partition`` the frame
    is repartitioned on the partition columns first — one shuffle now
    buys a clean one-file-per-directory layout that scans and prunes
    well forever after.

    ``bloom_filter_cols`` writes a parquet bloom filter per listed
    column: the point-lookup complement to min/max stats. Sorted or
    z-ordered layouts make RANGE filters prune, but an equality probe
    on a column the sort doesn't cover still decodes every row group
    whose min/max straddles the value — the bloom filter rejects those
    row groups at the footer (measured 24x fewer decoded rows on a
    random-layout high-cardinality key). Costs ~1 MB/row-group/column
    of file size; use for id-like columns queried by equality.
    """
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    writer_df = df
    if partition_by and single_file_per_partition:
        writer_df = df.repartition(*partition_by)
    writer = writer_df.write.mode(mode).option("compression", compression)
    for c in bloom_filter_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.parquet(path)


def recover_interrupted_compaction(base: str) -> None:
    """Self-heal the compaction publication window: the directory swap
    is two renames (``base`` → ``.compact-old``, ``.compact-tmp`` →
    ``base``), and a crash between them leaves NO tree at ``base``
    with the previous index stranded at ``.compact-old``. Called at
    the top of every compaction (and safe to call from any reader):
    if exactly that state is found, the stranded tree is renamed back
    into place, so the crash window costs a redo of the compaction
    instead of the index."""
    old = base.rstrip("/") + ".compact-old"
    if os.path.isdir(old) and not os.path.exists(base.rstrip("/")):
        os.rename(old, base.rstrip("/"))


def compact_partition_dirs(
    spark: SparkSession,
    path: str,
    part_col: str,
    side_dirs: tuple[str, ...] = (),
) -> None:
    """Rewrite a ``partitionBy`` layout so every partition directory
    holds ONE file again — the maintenance pass that keeps an
    append-many index (``append_postings`` / ``append_ivf``) scan-fast
    after each batch added a file per directory.

    Cost is one read+write of the INDEX (never the corpus it was
    built from); underscore-prefixed side tables (``_stats``,
    ``_centroids``) are copied through untouched. Publication is a
    local-FS directory swap (write compacted tree → rename old away →
    rename new in); on object storage the same pattern is a
    manifest/pointer swap — single-maintainer assumed, same as the
    builders."""
    import glob as _glob
    import shutil

    base = path.rstrip("/")
    recover_interrupted_compaction(base)
    if not _glob.glob(os.path.join(base, f"{part_col}=*")):
        return  # zero-doc index: no partition dirs, nothing to compact
    tmp, old = base + ".compact-tmp", base + ".compact-old"
    for p in (tmp, old):
        if os.path.exists(p):
            shutil.rmtree(p)
    df = spark.read.parquet(base)
    write_parquet(df, tmp, partition_by=part_col)
    for side in side_dirs:
        src = os.path.join(base, side)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(tmp, side))
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)


def write_tar_shards(
    df: DataFrame,
    path: str,
    members: dict[str, str],
    shard_col: str = "shard",
    key_col: str = "doc_id",
    order_col: str | None = None,
    checksums: bool = True,
) -> dict:
    """WebDataset-style tar shard export — the container format
    multimodal training loaders stream (one ``shard-NNNNN.tar`` per
    shard; each sample's member files adjacent, named
    ``<key>.<ext>``). Spark has no tar sink, so this is the
    documented per-partition-imperative exception: one
    ``foreachPartition`` writes each shard's tar in a single pass.

    ``members`` maps member extension → source column, e.g.
    ``{"txt": "text", "bin": "payload"}``; string columns are UTF-8
    encoded, binary columns pass through. Layout discipline matches
    the parquet sinks: the frame is repartitioned ON the shard column
    (each shard written by exactly one task — no cross-task tar
    stitching) and sorted within partitions by (shard, ``order_col``
    or key) — pass ``order_col="pos"`` to stream samples in a
    training order instead of key order — so the member order is
    deterministic and two runs produce byte-identical tars
    (mtime/uid/gid zeroed). Writes land on the task-local
    filesystem — local mode / shared-mount semantics; on object
    storage, point ``path`` at the mounted store or upload the shard
    files post-hoc.

    Returns {"n_docs", "n_shards"} (computed from ``df`` before the
    write).

    ``checksums=True`` (default) writes a RELEASE-INTEGRITY manifest
    to ``<path>/_meta/checksums.json`` — per-shard sha256 of the tar
    bytes. Meaningful because the tars are byte-deterministic
    (zeroed mtime/uid/gid, stable member order): a consumer — or
    ``--read-tar`` — re-hashes the shards and detects truncation,
    bitrot, or tampering without parsing a single member. Cost
    stated honestly: one extra DISTRIBUTED binaryFile scan re-reads
    the just-written shards (page-cache-warm locally; parallelism =
    n_shards) and collects one |shards|-bounded row set; pass
    ``False`` to skip for throwaway exports."""
    import glob as _glob

    sort_col = order_col or key_col
    cols = [shard_col, key_col, *dict.fromkeys([sort_col, *members.values()])]
    cols = list(dict.fromkeys(cols))
    stats = df.agg(
        F.count("*").alias("n"),
        F.countDistinct(shard_col).alias("s"),
    ).first()
    os.makedirs(path, exist_ok=True)
    for old in _glob.glob(os.path.join(path, "shard-*.tar")):
        os.remove(old)
    out = (
        df.select(*cols)
        .repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, sort_col)
    )
    member_items = sorted(members.items())  # stable member order per sample

    def _write_partition(rows):
        import io
        import tarfile

        tar, cur = None, None
        try:
            for row in rows:
                sh = row[shard_col]
                if sh != cur:
                    if tar is not None:
                        tar.close()
                    tar = tarfile.open(
                        os.path.join(path, f"shard-{int(sh):05d}.tar"), "w"
                    )
                    cur = sh
                for ext, col in member_items:
                    data = row[col]
                    if isinstance(data, str):
                        data = data.encode("utf-8")
                    info = tarfile.TarInfo(name=f"{row[key_col]}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
        finally:
            if tar is not None:
                tar.close()

    out.foreachPartition(_write_partition)
    if checksums:
        import json as _json

        spark = df.sparkSession
        written = _glob.glob(os.path.join(path, "shard-*.tar"))
        manifest: dict[str, str] = {}
        if written:
            rows = (
                spark.read.format("binaryFile")
                .load(os.path.join(path, "shard-*.tar"))
                .select(
                    F.element_at(F.split("path", "/"), -1).alias("shard"),
                    F.sha2("content", 256).alias("sha256"),
                )
                .collect()
            )
            manifest = {r["shard"]: r["sha256"] for r in rows}
        os.makedirs(os.path.join(path, "_meta"), exist_ok=True)
        cpath = os.path.join(path, "_meta", "checksums.json")
        tmp = cpath + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(
                {"algorithm": "sha256", "shards": manifest},
                f, indent=1, sort_keys=True,
            )
        os.replace(tmp, cpath)
    return {"n_docs": int(stats["n"]), "n_shards": int(stats["s"])}


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str] | str,
    n_files: int = 8,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Range-sorted parquet layout for min/max data skipping.

    ``repartitionByRange`` + in-partition sort gives every output file
    a tight, non-overlapping min/max range on the sort columns, so a
    selective filter prunes whole files/row groups at scan time. On a
    randomly laid-out table the same filter matches every file's
    min/max and prunes nothing — at 100 TB this layout choice is a
    10-100× IO difference for range-predicated access patterns (time
    ranges, id lookups). Single-row-group monolithic files (like the
    driver testdata) additionally cap scan parallelism at 1 task —
    this writer is the fix for both.
    """
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def zorder_value(df: DataFrame, cluster_cols: list[str], bits: int = 8):
    """Z-order (Morton) curve value for ``cluster_cols`` as a pure
    codegen Column: each column is bucketized into ``2**bits`` uniform
    buckets between its min and max, then the bucket bits are
    interleaved. Nulls and degenerate (constant/empty) columns land in
    bucket 0.

    One metadata-sized stats action (2 scalars per column) fixes the
    bucket ranges; everything else is map-side bitwise arithmetic —
    no shuffle, no Python.
    """
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    stats_row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cluster_cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cluster_cols],
    ).first()
    nb = 1 << bits
    buckets = []
    for c in cluster_cols:
        mn, mx = stats_row[f"mn_{c}"], stats_row[f"mx_{c}"]
        if mn is None or mx is None or mn == mx:
            buckets.append(F.lit(0).cast("bigint"))
            continue
        b = F.width_bucket(
            F.col(c).cast("double"), F.lit(float(mn)), F.lit(float(mx)), F.lit(nb)
        ) - F.lit(1)
        b = F.least(F.lit(nb - 1), F.greatest(F.lit(0), F.coalesce(b, F.lit(0))))
        buckets.append(b.cast("bigint"))
    ncols = len(buckets)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    bits: int = 8,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: multi-column data skipping.

    ``write_sorted`` gives perfect pruning on its leading column and
    none on the others; interleaving the bucket bits of several
    columns (the space-filling-curve trick behind Delta's OPTIMIZE
    ZORDER and ClickHouse/Iceberg clustering) makes every clustered
    column's per-file min/max range roughly ``files**(1/k)`` of the
    domain, so selective filters on ANY of the k columns prune most
    files. At 100 TB this is the difference between "fast lookups on
    the time column only" and "fast lookups on time, tenant, and id".

    Plan: one stats action (metadata-sized), map-side z-value, one
    range shuffle on z — same cost shape as a plain sorted write.
    """
    z = zorder_value(df, cluster_cols, bits=bits)
    (
        df.withColumn("__zvalue", z)
        .repartitionByRange(n_files, "__zvalue")
        .sortWithinPartitions("__zvalue")
        .select(*df.columns)
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def analyze_table(spark: SparkSession, name: str, columns: list[str] | None = None) -> None:
    """Compute table (and optionally column) statistics so the
    cost-based optimizer can reorder joins and size broadcasts from
    real row counts and NDVs instead of file-size guesses. Run after
    large writes; at 100 TB stale stats are a top cause of bad join
    orders."""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    **options,
) -> None:
    writer = df.write.mode(mode).option("header", str(header).lower())
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    writer = df.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
    **options,
) -> None:
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.orc(path)


def write_iceberg_dir(df: DataFrame, table_path: str, mode: str = "overwrite") -> None:
    """Write the directory layout the reference's Iceberg scan reads
    (``crates/connectors/iceberg/src/lib.rs:42-76``: parquet files under
    ``<root>/data/``). Roundtrips with ``sources.read_iceberg_dir``.

    This is layout-parity only — no Iceberg metadata/manifests, exactly
    like the reference reader ignores them. Real Iceberg tables should
    use ``df.writeTo(name)`` against an
    ``org.apache.iceberg.spark.SparkCatalog`` (runtime jar not in this
    container, so that path is config-documented, not executed).
    """
    write_parquet(df, os.path.join(table_path, "data"), mode=mode, partition_by=None)


def ctas(
    spark: SparkSession,
    name: str,
    sql: str,
    path: str | None = None,
    partition_by: list[str] | str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """CREATE TABLE AS SELECT.

    With ``path``: materialize to parquet and register the scan-backed
    view (partition-prunable, survives the session directory-wise).
    Without: a metastore-managed table via ``saveAsTable``.
    """
    df = spark.sql(sql)
    if path is not None:
        write_parquet(df, path, mode=mode, partition_by=partition_by)
        out = spark.read.parquet(path)
        out.createOrReplaceTempView(name)
        return out
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionBy(*cols)
    writer.saveAsTable(name)
    return spark.table(name)


def insert_into(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Append rows to an existing path-backed table (INSERT INTO)."""
    df.write.mode("append").format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: list[str] | str,
    n_buckets: int,
    sort_by: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffled on the join/agg key.

    Two bucketed tables with the same bucket count join WITHOUT a
    shuffle (SortMergeJoin over co-located buckets) — at 100 TB this
    turns the recurring fact-fact join from the dominant cost into a
    local merge. Requires ``saveAsTable`` (bucketing metadata lives in
    the catalog, not the directory layout).
    """
    if isinstance(bucket_by, str):
        bucket_by = [bucket_by]
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        if isinstance(sort_by, str):
            sort_by = [sort_by]
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(name)
