"""Round-14 hardening: content checksums for versioned stores
(write-time sha256 manifests + --verify-store --deep), caller-form
path normalization in verify_versioned, the --read-tar malformed-UTF8
member path under ANSI mode, the <default>-sentinel validation split
replicated to mixture_sample / epoch_upsample, and index-freshness
composition in --hybrid-search.

Reference parity note: the reference's integrity story is a roadmap
TODO (igloo-io/igloo roadmap.md:17-19, cache consistency); the store
here records per-file digests at commit time and re-verifies them
with the same distributed binaryFile+sha2 scan the tar exporters use.
"""

from __future__ import annotations

import glob
import json
import os

import pytest


def _mk_docs(spark, ids):
    rows = [
        (
            i,
            f"document body {i} " + " ".join(
                f"tok{i}word{j}" for j in range(12)
            ),
            "head" if i % 5 else "tail",
        )
        for i in ids
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _store(spark, tmp_path, name):
    from igloo_spark.pipelines import incremental_ingest

    root = str(tmp_path / name)
    incremental_ingest(
        _mk_docs(spark, range(1, 11)), root, min_quality=0.0, batch_id=0
    )
    incremental_ingest(
        _mk_docs(spark, range(21, 31)), root, min_quality=0.0, batch_id=1
    )
    return root


class TestStoreContentChecksums:
    """write_versioned records per-file sha256 in the commit manifest
    (executor-side hash of exactly the NEW files; append commits
    inherit carried digests, so commit cost never scales with table
    size) and verify_versioned(deep=True) re-hashes against them."""

    def test_manifest_records_sha256_for_every_file(self, spark, tmp_path):
        root = _store(spark, tmp_path, "ck_manifest")
        for mpath in sorted(
            glob.glob(os.path.join(root, "corpus", "manifests", "v*.json"))
        ):
            with open(mpath) as f:
                m = json.load(f)
            assert set(m["sha256"]) == set(m["files"])
            assert all(
                len(h) == 64 and int(h, 16) >= 0
                for h in m["sha256"].values()
            )

    @staticmethod
    def _flip_byte(victim, drop_crc):
        with open(victim, "r+b") as f:
            f.seek(10)
            b = f.read(1)
            f.seek(10)
            f.write(bytes([b[0] ^ 0xFF]))  # same size, one flipped byte
        crc = os.path.join(
            os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
        )
        if drop_crc and os.path.exists(crc):
            # object stores have no CRC sidecars — this is the profile
            # where ONLY the manifest sha256 can catch the flip
            os.remove(crc)

    def test_bitflip_detected_only_by_deep(self, spark, tmp_path):
        from igloo_spark.sources.versioned import verify_versioned

        root = _store(spark, tmp_path, "ck_bitflip") + "/corpus"
        victim = sorted(
            glob.glob(os.path.join(root, "data", "*", "*.parquet"))
        )[0]
        self._flip_byte(victim, drop_crc=True)
        shallow = verify_versioned(root)
        assert shallow["ok"]  # the gap deep mode exists to close
        deep = verify_versioned(root, deep=True, spark=spark)
        assert not deep["ok"]
        assert deep["checksum_mismatches"] == [os.path.abspath(victim)]
        assert deep["checksums_unverified"] == 0

    def test_bitflip_with_crc_sidecar_still_reported(self, spark, tmp_path):
        """On Hadoop's CRC-checking local FS the flipped file becomes
        unreadable (ChecksumException) — deep verify must report it as
        a mismatch, not abort the whole scan."""
        from igloo_spark.sources.versioned import verify_versioned

        root = _store(spark, tmp_path, "ck_crc") + "/corpus"
        victim = sorted(
            glob.glob(os.path.join(root, "data", "*", "*.parquet"))
        )[0]
        self._flip_byte(victim, drop_crc=False)
        deep = verify_versioned(root, deep=True, spark=spark)
        assert not deep["ok"]
        assert deep["checksum_mismatches"] == [os.path.abspath(victim)]

    def test_healthy_store_passes_deep(self, spark, tmp_path):
        from igloo_spark.sources.versioned import verify_versioned

        root = _store(spark, tmp_path, "ck_ok") + "/corpus"
        deep = verify_versioned(root, deep=True, spark=spark)
        assert deep["ok"] and not deep["checksum_mismatches"]
        assert deep["checksums_unverified"] == 0

    def test_checksumless_old_manifests_stay_verifiable(
        self, spark, tmp_path
    ):
        from igloo_spark.sources.versioned import verify_versioned

        root = _store(spark, tmp_path, "ck_oldfmt") + "/corpus"
        # simulate a pre-upgrade store: strip the digests
        n_files = 0
        for mpath in glob.glob(os.path.join(root, "manifests", "v*.json")):
            with open(mpath) as f:
                m = json.load(f)
            n_files = max(n_files, len(m["files"]))
            del m["sha256"]
            with open(mpath, "w") as f:
                json.dump(m, f)
        assert verify_versioned(root)["ok"]
        deep = verify_versioned(root, deep=True, spark=spark)
        assert deep["ok"]  # unverified is reported, never failed
        assert deep["checksums_unverified"] == n_files

    def test_lifecycle_ops_keep_deep_verification(self, spark, tmp_path):
        from igloo_spark.sources.versioned import (
            compact_versioned,
            vacuum_versioned,
            verify_versioned,
        )

        root = _store(spark, tmp_path, "ck_lifecycle") + "/corpus"
        compact_versioned(spark, root, n_files=2)
        vacuum_versioned(root, keep_last=1)
        deep = verify_versioned(root, deep=True, spark=spark)
        assert deep["ok"] and deep["checksums_unverified"] == 0

    def test_deep_requires_spark(self, spark, tmp_path):
        from igloo_spark.sources.versioned import verify_versioned

        root = _store(spark, tmp_path, "ck_nospark") + "/corpus"
        with pytest.raises(ValueError, match="SparkSession"):
            verify_versioned(root, deep=True)

    def test_cli_deep_flag(self, spark, tmp_path, capsys):
        from igloo_spark.cli import main

        root = _store(spark, tmp_path, "ck_cli")
        assert main(["--verify-store", root, "--deep"]) == 0
        out = capsys.readouterr().out
        assert "deep: 0 unverified" in out
        victim = sorted(
            glob.glob(os.path.join(root, "corpus", "data", "*", "*.parquet"))
        )[0]
        with open(victim, "r+b") as f:
            f.seek(10)
            b = f.read(1)
            f.seek(10)
            f.write(bytes([b[0] ^ 0xFF]))
        assert main(["--verify-store", root]) == 0  # shallow: blind
        rc = main(["--verify-store", root, "--deep"])
        captured = capsys.readouterr()
        assert rc == 4
        assert "CORRUPT" in captured.out
        assert "checksum_mismatches" in captured.err


class TestVerifyPathNormalization:
    """Manifests record caller-form (possibly relative) paths; the
    verifier rebases them onto root-as-spelled-now, so a different
    cwd or a different spelling of the same root never yields a
    false CORRUPT verdict."""

    def test_relative_manifest_paths_absolute_verifier(
        self, spark, tmp_path, monkeypatch
    ):
        from igloo_spark.sources.versioned import verify_versioned

        root = _store(spark, tmp_path, "rel_store") + "/corpus"
        # simulate a writer that recorded paths relative to the
        # store's parent directory
        for mpath in glob.glob(os.path.join(root, "manifests", "v*.json")):
            with open(mpath) as f:
                m = json.load(f)
            m["files"] = [os.path.relpath(p, tmp_path) for p in m["files"]]
            m["sha256"] = {
                os.path.relpath(p, tmp_path): h
                for p, h in m["sha256"].items()
            }
            with open(mpath, "w") as f:
                json.dump(m, f)
        elsewhere = tmp_path / "elsewhere"
        elsewhere.mkdir()
        monkeypatch.chdir(elsewhere)  # writer-cwd-relative paths dangle
        v = verify_versioned(root)
        assert v["ok"]
        assert v["orphan_files"] == 0  # rebased paths match the walk
        deep = verify_versioned(root, deep=True, spark=spark)
        assert deep["ok"] and deep["checksums_unverified"] == 0

    def test_all_consumers_rebase(self, spark, tmp_path, monkeypatch):
        """Every manifest consumer — reads, time travel, diffs, delta
        export, vacuum — works on a store whose manifests hold paths
        relative to a cwd nobody is in anymore (the
        ``_manifest_files`` rebase, not just verify)."""
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import (
            diff_versions,
            read_version_delta,
            read_versioned,
            vacuum_versioned,
        )

        store = _store(spark, tmp_path, "rebase_store")
        root = store + "/corpus"
        for mpath in glob.glob(os.path.join(root, "manifests", "v*.json")):
            with open(mpath) as f:
                m = json.load(f)
            m["files"] = [os.path.relpath(p, tmp_path) for p in m["files"]]
            m["sha256"] = {
                os.path.relpath(p, tmp_path): h
                for p, h in m["sha256"].items()
            }
            with open(mpath, "w") as f:
                json.dump(m, f)
        elsewhere = tmp_path / "elsewhere2"
        elsewhere.mkdir()
        monkeypatch.chdir(elsewhere)
        assert read_versioned(spark, root).count() == 20
        assert read_versioned(spark, root, version=1).count() == 10
        d = diff_versions(spark, root, ["doc_id"], 1, 2)
        assert d.filter("change_type = 'insert'").count() == 10
        assert read_version_delta(spark, root, 1, 2).count() == 10
        # vacuum actually deletes the old commit's files (the literal
        # path would have silently deleted nothing from this cwd)...
        incremental_ingest(
            _mk_docs(spark, range(41, 46)), store,
            min_quality=0.0, batch_id=2,
        )
        deleted = vacuum_versioned(root, keep_last=1)
        assert deleted == []  # appends: all files still referenced
        from igloo_spark.sources.versioned import (
            compact_versioned,
            verify_versioned,
        )

        compact_versioned(spark, root, n_files=1)
        deleted = vacuum_versioned(root, keep_last=1)
        assert deleted  # ...and the pre-compaction files really go
        assert all(not os.path.exists(p) for p in deleted)
        v = verify_versioned(root, deep=True, spark=spark)
        assert v["ok"] and v["orphan_files"] == 0

    def test_dot_slash_spelling(self, spark, tmp_path, monkeypatch):
        from igloo_spark.sources.versioned import verify_versioned

        root = _store(spark, tmp_path, "spell_store")
        monkeypatch.chdir(tmp_path)
        v = verify_versioned("./spell_store/corpus")
        assert v["ok"] and v["orphan_files"] == 0
        deep = verify_versioned(
            "./spell_store/corpus/", deep=True, spark=spark
        )
        assert deep["ok"] and deep["checksums_unverified"] == 0


class TestManifestStatsAndPrunedMerge:
    """Per-file min/max stats in the commit manifest (data-skipping
    metadata), manifest-level pruned reads (read_versioned(between=)),
    and the file-pruned MERGE: only files whose recorded key range
    overlaps the delta are rewritten; everything else is CARRIED into
    the new manifest byte-identical — merge cost scales with touched
    files, not table size (the Delta/Iceberg copy-on-write shape)."""

    @staticmethod
    def _kv(spark, lo, hi, tag):
        return spark.createDataFrame(
            [(i, f"{tag}{i}") for i in range(lo, hi)], "k long, v string"
        )

    def _store(self, spark, tmp_path, name):
        from igloo_spark.sources.versioned import write_versioned

        root = str(tmp_path / name)
        write_versioned(
            self._kv(spark, 0, 100, "a").repartition(1), root,
            stats_cols=["k"],
        )
        write_versioned(
            self._kv(spark, 100, 200, "b").repartition(1), root,
            stats_cols=["k"],
        )
        write_versioned(
            self._kv(spark, 200, 300, "c").repartition(1), root,
            stats_cols=["k"],
        )
        return root

    def test_stats_recorded_per_file(self, spark, tmp_path):
        import json as _json

        root = self._store(spark, tmp_path, "st_rec")
        with open(
            sorted(glob.glob(os.path.join(root, "manifests", "v*.json")))[-1]
        ) as f:
            m = _json.load(f)
        assert set(m["stats"]) == set(m["files"])
        ranges = sorted(tuple(s["k"]) for s in m["stats"].values())
        assert ranges == [(0, 99), (100, 199), (200, 299)]

    def test_between_read_skips_files(self, spark, tmp_path):
        from igloo_spark.sources.versioned import (
            prune_manifest_files,
            read_versioned,
        )

        root = self._store(spark, tmp_path, "st_read")
        candidates, skipped = prune_manifest_files(root, "k", 120, 180)
        assert len(candidates) == 1 and skipped == 2
        pruned = read_versioned(spark, root, between=("k", 120, 180))
        assert len(pruned.inputFiles()) == 1  # the scan never sees the rest
        full = read_versioned(spark, root).filter("k between 120 and 180")
        assert sorted(r["k"] for r in pruned.collect()) == sorted(
            r["k"] for r in full.collect()
        )
        # an empty range reads zero files but keeps the schema
        assert read_versioned(spark, root, between=("k", 900, 999)).count() == 0

    def test_pruned_merge_matches_full_merge(self, spark, tmp_path):
        import json as _json

        from igloo_spark.sources.versioned import (
            merge_into_versioned,
            read_versioned,
            verify_versioned,
        )

        root_p = self._store(spark, tmp_path, "st_pruned")
        root_f = self._store(spark, tmp_path, "st_full")
        # updates confined to the middle file's [100, 199] range:
        # range pruning must rewrite ONLY that file
        delta_u = spark.createDataFrame(
            [(150, "UPDATED"), (101, "UPDATED2")], "k long, v string"
        )
        before = set(read_versioned(spark, root_p).inputFiles())
        vp = merge_into_versioned(spark, root_p, delta_u, ["k"], prune_col="k")
        merge_into_versioned(spark, root_f, delta_u, ["k"])
        got_p = sorted(map(tuple, read_versioned(spark, root_p).collect()))
        got_f = sorted(map(tuple, read_versioned(spark, root_f).collect()))
        assert got_p == got_f  # identical result, file-pruned plan
        assert (150, "UPDATED") in got_p and (101, "UPDATED2") in got_p
        with open(
            os.path.join(root_p, "manifests", f"v{vp:06d}.json")
        ) as f:
            m = _json.load(f)
        assert m["op"] == "merge"
        after = set(read_versioned(spark, root_p).inputFiles())
        # the two untouched files are carried byte-identical (same
        # paths still listed); only the 100-199 file was rewritten
        assert len(before & after) == 2
        # a pure insert whose range overlaps NO file carries everything
        delta_i = spark.createDataFrame(
            [(420, "INSERTED")], "k long, v string"
        )
        before_i = set(read_versioned(spark, root_p).inputFiles())
        merge_into_versioned(spark, root_p, delta_i, ["k"], prune_col="k")
        merge_into_versioned(spark, root_f, delta_i, ["k"])
        assert before_i <= set(read_versioned(spark, root_p).inputFiles())
        got_p = sorted(map(tuple, read_versioned(spark, root_p).collect()))
        got_f = sorted(map(tuple, read_versioned(spark, root_f).collect()))
        assert got_p == got_f and (420, "INSERTED") in got_p
        # inherited + fresh checksums/stats keep deep verify green
        v = verify_versioned(root_p, deep=True, spark=spark)
        assert v["ok"] and v["checksums_unverified"] == 0
        with open(
            sorted(glob.glob(os.path.join(root_p, "manifests", "v*.json")))[-1]
        ) as f:
            m = _json.load(f)
        assert set(m["stats"]) == set(m["files"])

    def test_pruned_merge_guards(self, spark, tmp_path):
        from igloo_spark.sources.versioned import (
            merge_into_versioned,
            snapshots,
        )

        root = self._store(spark, tmp_path, "st_guards")
        empty = self._kv(spark, 0, 0, "x")
        v = merge_into_versioned(spark, root, empty, ["k"], prune_col="k")
        assert v == snapshots(root)[-1]["version"] == 3  # no-op, no commit
        with pytest.raises(ValueError, match="key_cols"):
            merge_into_versioned(spark, root, empty, ["k"], prune_col="v")
        nullkey = spark.createDataFrame(
            [(None, "n")], "k long, v string"
        )
        with pytest.raises(ValueError, match="NULL"):
            merge_into_versioned(spark, root, nullkey, ["k"], prune_col="k")

    def test_bloom_prunes_interleaved_keys(self, spark, tmp_path):
        """Second-stage bloom pruning: two files whose key RANGES
        fully overlap (even keys vs odd keys) — range stats cannot
        skip either, the per-file bloom skips the file that cannot
        contain the delta's keys. Result stays identical to the full
        rewrite."""
        import json as _json

        from igloo_spark.sources.versioned import (
            merge_into_versioned,
            read_versioned,
            write_versioned,
        )

        def _mk(spark, keys, tag):
            return spark.createDataFrame(
                [(k, f"{tag}{k}") for k in keys], "k long, v string"
            )

        root_p = str(tmp_path / "bl_pruned")
        root_f = str(tmp_path / "bl_full")
        evens = list(range(0, 400, 2))
        odds = list(range(1, 400, 2))
        for root in (root_p, root_f):
            write_versioned(
                _mk(spark, evens, "e").repartition(1), root,
                stats_cols=["k"],
            )
            write_versioned(
                _mk(spark, odds, "o").repartition(1), root,
                stats_cols=["k"],
            )
        with open(
            sorted(glob.glob(os.path.join(root_p, "manifests", "v*.json")))[-1]
        ) as f:
            m = _json.load(f)
        assert set(m["bloom"]) == set(m["files"])
        # ranges overlap: [0, 398] vs [1, 399] — range pruning alone
        # keeps both files for an even-key delta
        delta = spark.createDataFrame(
            [(100, "UPDATED"), (200, "UPDATED2")], "k long, v string"
        )
        before = set(read_versioned(spark, root_p).inputFiles())
        merge_into_versioned(spark, root_p, delta, ["k"], prune_col="k")
        merge_into_versioned(spark, root_f, delta, ["k"])
        after = set(read_versioned(spark, root_p).inputFiles())
        # the odd-keys file survives untouched: bloom said "cannot
        # contain 100 or 200"
        assert len(before & after) == 1
        got_p = sorted(map(tuple, read_versioned(spark, root_p).collect()))
        got_f = sorted(map(tuple, read_versioned(spark, root_f).collect()))
        assert got_p == got_f
        assert (100, "UPDATED") in got_p and (200, "UPDATED2") in got_p

    def test_point_lookup_read_prunes_by_bloom(self, spark, tmp_path):
        from igloo_spark.sources.versioned import (
            read_versioned,
            read_versioned_at_keys,
            write_versioned,
        )

        root = str(tmp_path / "bl_read")
        write_versioned(
            spark.createDataFrame(
                [(k, f"e{k}") for k in range(0, 400, 2)], "k long, v string"
            ).repartition(1),
            root, stats_cols=["k"],
        )
        write_versioned(
            spark.createDataFrame(
                [(k, f"o{k}") for k in range(1, 400, 2)], "k long, v string"
            ).repartition(1),
            root, stats_cols=["k"],
        )
        got = read_versioned_at_keys(spark, root, "k", [100, 202])
        # ranges overlap, bloom prunes the odd-keys file
        assert len(got.inputFiles()) == 1
        assert sorted(map(tuple, got.collect())) == [
            (100, "e100"), (202, "e202"),
        ]
        full = read_versioned(spark, root).filter("k in (100, 202)")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, full.collect())
        )
        # absent keys: zero files scanned, schema preserved
        none = read_versioned_at_keys(spark, root, "k", [5000])
        assert none.count() == 0 and none.columns == ["k", "v"]
        assert read_versioned_at_keys(spark, root, "k", []).count() == 0

    def test_stats_inherited_by_lifecycle_ops(self, spark, tmp_path):
        """Once a store tracks stats, every later commit keeps
        recording them without re-declaring (stats_cols=None inherits
        the tracked columns): plain appends, compaction and the full
        merge all preserve data skipping."""
        import json as _json

        from igloo_spark.sources.versioned import (
            compact_versioned,
            merge_into_versioned,
            prune_manifest_files,
            write_versioned,
        )

        root = str(tmp_path / "st_inherit")
        write_versioned(
            self._kv(spark, 0, 100, "a").repartition(1), root,
            stats_cols=["k"],
        )
        # append WITHOUT declaring stats_cols: inherited
        write_versioned(self._kv(spark, 100, 200, "b").repartition(1), root)
        with open(
            sorted(glob.glob(os.path.join(root, "manifests", "v*.json")))[-1]
        ) as f:
            m = _json.load(f)
        assert set(m["stats"]) == set(m["files"])
        # compaction rewrites everything and re-records stats
        compact_versioned(spark, root, n_files=2)
        candidates, skipped = prune_manifest_files(root, "k", 0, 50)
        assert skipped >= 1  # skipping survives the rewrite
        # the FULL merge (overwrite) also keeps the metadata
        merge_into_versioned(
            spark, root,
            spark.createDataFrame([(5, "U")], "k long, v string"), ["k"],
        )
        with open(
            sorted(glob.glob(os.path.join(root, "manifests", "v*.json")))[-1]
        ) as f:
            m = _json.load(f)
        assert m["op"] == "overwrite" and set(m["stats"]) == set(m["files"])

    def test_stats_survive_append_and_prestats_files_never_skip(
        self, spark, tmp_path
    ):
        from igloo_spark.sources.versioned import (
            prune_manifest_files,
            write_versioned,
        )

        root = str(tmp_path / "st_mixed")
        # a pre-stats commit (no stats_cols) ...
        write_versioned(self._kv(spark, 0, 100, "a").repartition(1), root)
        # ... then a stats-recording append
        write_versioned(
            self._kv(spark, 100, 200, "b").repartition(1), root,
            stats_cols=["k"],
        )
        candidates, skipped = prune_manifest_files(root, "k", 500, 600)
        # the stats-less file is conservatively kept, the known
        # out-of-range file is skipped
        assert len(candidates) == 1 and skipped == 1


class TestAppendSchemaGuard:
    """Appends are schema-guarded at commit time: dropping or
    retyping a recorded column is rejected BEFORE any data lands
    (a mixed-type column corrupts every later scan); adding columns
    stays legal, allow_schema_change waives for deliberate
    migrations, and pre-guard manifests are not checked."""

    def test_retype_and_drop_rejected_before_write(self, spark, tmp_path):
        from igloo_spark.sources.versioned import write_versioned

        root = str(tmp_path / "sg_store")
        write_versioned(
            spark.createDataFrame([(1, "a")], "k long, v string"), root
        )
        n_dirs = len(glob.glob(os.path.join(root, "data", "commit-*")))
        with pytest.raises(ValueError, match="retypes"):
            write_versioned(
                spark.createDataFrame([("2", "b")], "k string, v string"),
                root,
            )
        with pytest.raises(ValueError, match="drops"):
            write_versioned(
                spark.createDataFrame([(2,)], "k long"), root
            )
        # fail-fast: no data was written by the rejected commits
        assert len(glob.glob(os.path.join(root, "data", "commit-*"))) == n_dirs

    def test_additive_and_waived_changes_pass(self, spark, tmp_path):
        import json as _json

        from pyspark.sql import functions as F

        from igloo_spark.sources.versioned import write_versioned

        root = str(tmp_path / "sg_ok")
        write_versioned(
            spark.createDataFrame([(1, "a")], "k long, v string"), root
        )
        write_versioned(
            spark.createDataFrame([(2, "b")], "k long, v string")
            .withColumn("extra", F.lit(1.5)),
            root,
        )  # additive: fine
        write_versioned(
            spark.createDataFrame([(3,)], "k long"), root,
            allow_schema_change=True,
        )  # deliberate migration: waived
        with open(
            sorted(glob.glob(os.path.join(root, "manifests", "v*.json")))[-1]
        ) as f:
            m = _json.load(f)
        # the manifest records the visible UNION across commits
        assert m["schema"] == {"k": "bigint", "v": "string", "extra": "double"}

    def test_preguard_manifests_not_checked(self, spark, tmp_path):
        import json as _json

        from igloo_spark.sources.versioned import write_versioned

        root = str(tmp_path / "sg_old")
        write_versioned(
            spark.createDataFrame([(1, "a")], "k long, v string"), root
        )
        for mpath in glob.glob(os.path.join(root, "manifests", "v*.json")):
            with open(mpath) as f:
                m = _json.load(f)
            del m["schema"]
            with open(mpath, "w") as f:
                _json.dump(m, f)
        # a pre-guard store accepts what it always accepted
        write_versioned(spark.createDataFrame([(2,)], "k long"), root)


class TestDefaultSentinelValidation:
    """mixture_sample / epoch_upsample validate class rates and the
    default SEPARATELY — a class literally named '<default>' must not
    shadow the default's validation slot (the apply_mix_rates fix,
    replicated)."""

    def test_mixture_sample_invalid_default_named_class(self, spark):
        from pyspark.sql import functions as F

        from igloo_spark.operators.packing import mixture_sample

        df = _mk_docs(spark, range(1, 6)).withColumn(
            "source", F.lit("<default>")
        )
        with pytest.raises(ValueError, match="<default>"):
            # out-of-range rate on the literally-named class: the old
            # dict-merge let the (valid) default_rate shadow it
            mixture_sample(
                df, "doc_id", "source", {"<default>": (5, 1)},
                default_rate=(1, 1),
            )
        with pytest.raises(ValueError, match="<default>"):
            mixture_sample(
                df, "doc_id", "source", {}, default_rate=(2, 1)
            )

    def test_mixture_sample_default_named_class_uses_its_own_rate(
        self, spark
    ):
        from pyspark.sql import functions as F

        from igloo_spark.operators.packing import mixture_sample

        df = _mk_docs(spark, range(1, 41)).withColumn(
            "source", F.lit("<default>")
        )
        kept = mixture_sample(
            df, "doc_id", "source", {"<default>": (0, 1)},
            default_rate=(1, 1),
        ).count()
        assert kept == 0  # the class's own 0-rate wins, not the default

    def test_epoch_upsample_invalid_default_named_class(self, spark):
        from igloo_spark.operators.packing import epoch_upsample

        df = _mk_docs(spark, range(1, 6))
        with pytest.raises(ValueError, match="<default>"):
            epoch_upsample(
                df, "source", {"<default>": -3}, default_epochs=1
            )
        with pytest.raises(ValueError, match="default_epochs"):
            epoch_upsample(df, "source", {}, default_epochs=-1)


class TestHybridSearchSyncGate:
    """--hybrid-search + --corpus-store: index freshness is checked
    BEFORE fusing (both retrievers) — warn by default, exit 4 under
    --strict-sync; --repair-index / pipelines.repair_index clears it."""

    DIM = 8

    def _setup(self, spark, tmp_path):
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq

        from igloo_spark.pipelines import incremental_ingest

        def _rows(ids):
            return [
                (
                    i,
                    f"document body {i} " + " ".join(
                        f"tok{i}word{j}" for j in range(10)
                    ) + (" vector search" if i % 3 == 0 else " stream hash"),
                    [math.sin(0.7 * i + 1.3 * j) for j in range(self.DIM)],
                )
                for i in ids
            ]

        schema = "doc_id long, text string, embedding array<double>"
        store = str(tmp_path / "sync_store")
        pidx = str(tmp_path / "sync_postings")
        vidx = str(tmp_path / "sync_ivf")
        incremental_ingest(
            spark.createDataFrame(_rows(range(1, 31)), schema), store,
            min_quality=0.0, min_shared=1, persist_embeddings=True,
            postings_index_root=pidx, ivf_index_root=vidx,
        )
        # corpus advances; the indexes do NOT — the one-ingest lag
        incremental_ingest(
            spark.createDataFrame(_rows(range(41, 51)), schema), store,
            min_quality=0.0, min_shared=1, persist_embeddings=True,
        )
        d = tmp_path / "sync_data"
        d.mkdir()
        rows = _rows(range(1, 31))
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[2] for r in rows], pa.list_(pa.float64())
                    ),
                }
            ),
            str(d / "embeddings.parquet"),
        )
        return store, str(d), pidx, vidx

    def _args(self, store, d, pidx, vidx, *extra):
        return [
            "--data-dir", d, "--hybrid-search", "vector search",
            "--hybrid-vec", "1", "--index-root", pidx,
            "--vector-index", vidx, "--index-kind", "ivf",
            "--corpus-store", store, *extra,
        ]

    def test_stale_index_warns_then_strict_fails_then_repair_clears(
        self, spark, tmp_path, capsys
    ):
        from igloo_spark.cli import main
        from igloo_spark.pipelines import repair_index

        store, d, pidx, vidx = self._setup(spark, tmp_path)
        # default: warn on BOTH stale retrievers but still fuse
        rc = main(self._args(store, d, pidx, vidx))
        captured = capsys.readouterr()
        assert rc == 0
        assert captured.err.count("warning: --hybrid-search: stale") == 2
        assert "--repair-index" in captured.err
        # strict: refuse to serve stale fusions
        rc = main(self._args(store, d, pidx, vidx, "--strict-sync"))
        captured = capsys.readouterr()
        assert rc == 4
        assert "error: --hybrid-search: stale" in captured.err
        # the existing lag-repair path clears it
        assert repair_index(
            spark, store + "/corpus", pidx, "postings"
        )["in_sync"]
        assert repair_index(
            spark, store + "/corpus", vidx, "ivf"
        )["in_sync"]
        rc = main(self._args(store, d, pidx, vidx, "--strict-sync"))
        captured = capsys.readouterr()
        assert rc == 0
        assert "--hybrid-search: stale" not in captured.err

    def test_fetch_joins_documents_to_fused_ranks(
        self, spark, tmp_path, capsys
    ):
        """--hybrid-search --fetch: the fused ids come back joined to
        the corpus store's documents (bloom-pruned point lookup) —
        the full search-then-fetch serving loop in one command."""
        from igloo_spark.cli import main
        from igloo_spark.pipelines import repair_index

        store, d, pidx, vidx = self._setup(spark, tmp_path)
        repair_index(spark, store + "/corpus", pidx, "postings")
        repair_index(spark, store + "/corpus", vidx, "ivf")
        rc = main(self._args(store, d, pidx, vidx, "--fetch"))
        out = capsys.readouterr().out
        assert rc == 0
        assert "text" in out  # the joined document column
        assert "document body" in out

    def test_fetch_docs_point_lookup(self, spark, tmp_path, capsys):
        from igloo_spark.cli import main

        store, d, pidx, vidx = self._setup(spark, tmp_path)
        rc = main(
            ["--data-dir", d, "--corpus-store", store,
             "--fetch-docs", "3,7"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        assert "document body 3" in out and "document body 7" in out

    def test_fetch_docs_validation(self):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):  # needs --corpus-store
            main(["--fetch-docs", "1,2"])
        with pytest.raises(SystemExit):  # integer ids only
            main(
                ["--fetch-docs", "1,x", "--corpus-store", "/tmp/s",
                 "--data-dir", "/tmp/d"]
            )
        with pytest.raises(SystemExit):  # --fetch needs --hybrid-search
            main(["--sql", "SELECT 1", "--fetch"])

    def test_strict_sync_validation(self):
        from igloo_spark.cli import main

        with pytest.raises(SystemExit):  # needs --hybrid-search
            main(["--sql", "SELECT 1", "--strict-sync"])
        with pytest.raises(SystemExit):  # needs --corpus-store
            main(
                ["--hybrid-search", "x", "--index-root", "/tmp/p",
                 "--vector-index", "/tmp/v", "--hybrid-vec", "1",
                 "--data-dir", "/tmp/d", "--index-kind", "ivf",
                 "--strict-sync"]
            )


class TestLuhnCardScrub:
    """The [CARD] PII class (r14): credit-card-shaped digit runs
    confirmed by the Luhn checksum — a pure in-row higher-order fold
    (extract candidates, keep Luhn-valid, literal-replace each), zero
    Python, with the DuckDB twin re-deriving the same arithmetic.
    Cards scrub LAST so [SSN]/[PHONE] claim their shapes first."""

    CASES = [
        ("card 4111 1111 1111 1111 ok", "card [CARD] ok", 1),
        ("card 4111-1111-1111-1111 ok", "card [CARD] ok", 1),
        ("pay 4111111111111111 now", "pay [CARD] now", 1),
        # fails the checksum -> NOT a card, stays verbatim
        ("invalid 4111 1111 1111 1112 stays",
         "invalid 4111 1111 1111 1112 stays", 0),
        # 13 digits but Luhn-invalid order number
        ("order 1234567890123 ship", "order 1234567890123 ship", 0),
        ("ssn 123-45-6789 and card 5500 0000 0000 0004",
         "ssn [SSN] and card [CARD]", 1),
        ("a@b.com pays with 4111111111111111", "[EMAIL] pays with [CARD]", 1),
        ("no pii here at all", "no pii here at all", 0),
    ]

    def test_spark_scrub_and_count(self, spark):
        from pyspark.sql import functions as F

        from igloo_spark.functions.text import pii_count, redact_pii

        df = spark.createDataFrame(
            [(i, t) for i, (t, _, _) in enumerate(self.CASES)],
            "i long, t string",
        )
        rows = {
            r["i"]: r
            for r in df.select(
                "i",
                redact_pii(F.col("t")).alias("scrubbed"),
                pii_count(F.col("t"), "card").alias("n_cards"),
            ).collect()
        }
        for i, (_, want, n) in enumerate(self.CASES):
            assert rows[i]["scrubbed"] == want, (i, rows[i]["scrubbed"])
            assert rows[i]["n_cards"] == n, (i, rows[i]["n_cards"])

    def test_duckdb_twin_agrees(self):
        import duckdb

        from igloo_spark.functions.text import pii_count_sql, redact_pii_sql

        con = duckdb.connect()
        for t, want, n in self.CASES:
            got = con.sql(
                f"select {redact_pii_sql('t')} r, "
                f"{pii_count_sql('t', 'card')} n from (select ? as t)",
                params=[t],
            ).fetchone()
            assert got[0] == want, (t, got[0])
            assert got[1] == n, (t, got[1])

    def test_card_scrubbed_at_admission(self, spark, tmp_path):
        from igloo_spark.pipelines import incremental_ingest
        from igloo_spark.sources.versioned import read_versioned

        docs = spark.createDataFrame(
            [(1, "charge card 4111 1111 1111 1111 for the full order"),
             (2, "plain document with no sensitive content at all")],
            "doc_id long, text string",
        )
        root = str(tmp_path / "card_store")
        incremental_ingest(
            docs, root, min_quality=0.0, min_shared=1, scrub_pii=True
        )
        texts = {
            r["doc_id"]: r["text"]
            for r in read_versioned(spark, root + "/corpus").collect()
        }
        assert "[CARD]" in texts[1]
        assert "4111" not in texts[1]

    def test_x82_matches_oracle(self, spark):
        """The extended x82 (new n_cards column + card-aware
        redaction delta) stays hash-identical to its DuckDB twin at
        the driver's own oracle scale."""
        from conftest import SF_ORACLE, assert_matches_oracle

        from igloo_spark.queries import all_queries

        spec = all_queries()["x82_pii_scrub"]
        assert_matches_oracle(
            spec.spark(spark, SF_ORACLE), spec.oracle, SF_ORACLE
        )


class TestHybridFusionAudit:
    """x156: per-retriever contribution/rank-shift audit over x154's
    own fused frame — integers only, constant-cost over the k-row
    fused list."""

    def test_invariants(self, spark):
        from igloo_spark.queries import all_queries

        qs = all_queries()
        r = qs["x156_hybrid_fusion_audit"].spark(
            spark, "/root/testdata/sf0.001"
        ).first()
        fused = qs["x154_hybrid_rrf"].spark(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert r["n_fused"] == len(fused)
        # inclusion-exclusion over the two provenance flags
        assert (
            r["n_from_bm25"] + r["n_from_ann"] - r["n_from_both"]
            == r["n_fused"]
        )
        assert r["n_bm25_only"] == r["n_from_bm25"] - r["n_from_both"]
        assert r["n_ann_only"] == r["n_from_ann"] - r["n_from_both"]
        top1 = [f["doc_id"] for f in fused if f["fused_rank"] == 1]
        assert [r["top1_doc"]] == top1


class TestSemanticDedupManifest:
    """x157: the SemDeDup keep/drop manifest — every vector gets a
    verdict, drops cite a LOWER-id representative in the SAME bucket
    within the cosine threshold."""

    def test_manifest_invariants(self, spark):
        from igloo_spark.queries import all_queries

        qs = all_queries()
        sf = "/root/testdata/sf0.001"
        rows = qs["x157_semantic_dedup"].spark(spark, sf).collect()
        n_vecs = (
            spark.read.parquet(sf + "/embeddings.parquet").count()
        )
        assert len(rows) == n_vecs  # one verdict per vector
        by_id = {r["vec_id"]: r for r in rows}
        for r in rows:
            if r["is_kept"]:
                assert r["dup_of"] is None and r["n_lower_dups"] == 0
            else:
                assert r["dup_of"] is not None
                assert r["dup_of"] < r["vec_id"]  # lowest-id convention
                assert r["n_lower_dups"] >= 1
                # the cited representative shares the bucket
                assert by_id[r["dup_of"]]["bucket"] == r["bucket"]

    def test_agrees_with_x71_pairs(self, spark):
        """The manifest's drop set is exactly the set of vec_b values
        in x71's pair list (same threshold, same buckets)."""
        from igloo_spark.queries import all_queries

        qs = all_queries()
        sf = "/root/testdata/sf0.001"
        dropped = {
            r["vec_id"]
            for r in qs["x157_semantic_dedup"].spark(spark, sf).collect()
            if not r["is_kept"]
        }
        pair_bs = {
            r["vec_b"]
            for r in qs["x71_embedding_neardup_lsh"].spark(spark, sf).collect()
        }
        assert dropped == pair_bs


class TestMmrDiversified:
    """x158: greedy MMR invariants — distinct picks, the first pick is
    the relevance argmax, and every later pick beats (or ties into
    id-order against) the candidates it was chosen over."""

    def test_invariants(self, spark):
        from igloo_spark.queries import all_queries

        sf = "/root/testdata/sf0.001"
        qs = all_queries()
        rows = sorted(
            qs["x158_mmr_diversified"].spark(spark, sf).collect(),
            key=lambda r: r["sel_rank"],
        )
        assert [r["sel_rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert len({r["doc_id"] for r in rows}) == 5
        assert rows[0]["max_sim_micro"] == 0
        # pick 1 is the plain relevance argmax = ANN rank 1 for vec 0
        ann = qs["x46_ann_bruteforce_topk"].spark(spark, sf).collect()
        top1 = [
            r["neighbor_id"] for r in ann
            if r["query_id"] == 0 and r["rank"] == 1
        ]
        assert [rows[0]["doc_id"]] == top1
        for r in rows:
            assert r["mmr_milli"] == 700 * r["rel_micro"] - 300 * r["max_sim_micro"]


class TestReadTarMalformedMember:
    """--read-tar under ANSI mode: an id member whose bytes are not
    valid UTF-8 must COUNT as bad (exit 4) — not crash the verifier
    with MALFORMED_CHARACTER_CODING."""

    def test_invalid_utf8_member_counts_as_bad(
        self, spark, tmp_path, capsys
    ):
        import hashlib
        import tarfile

        from igloo_spark.cli import main
        from igloo_spark.operators.bpe import learn_bpe_merges
        from igloo_spark.pipelines import (
            prepare_training_corpus,
            write_training_shards,
        )

        docs = _mk_docs(spark, range(1, 21)).select("doc_id", "text")
        r = prepare_training_corpus(docs, min_quality=0.0, n_shards=2)
        path = str(tmp_path / "tar_badutf8")
        merges = learn_bpe_merges(docs, n_merges=3, top_v=None)
        write_training_shards(
            docs, r, path, data_format="tar", bpe_merges=merges
        )
        shard = sorted(glob.glob(os.path.join(path, "shard-*.tar")))[0]
        rewritten = shard + ".new"
        poisoned = False
        with tarfile.open(shard) as src, tarfile.open(
            rewritten, "w"
        ) as dst:
            for member in src.getmembers():
                data = src.extractfile(member).read()
                if member.name.endswith("ids.json") and not poisoned:
                    data = b"\xff\xfe[1,2"  # invalid UTF-8, then junk
                    poisoned = True
                member.size = len(data)
                import io

                dst.addfile(member, io.BytesIO(data))
        assert poisoned
        os.replace(rewritten, shard)
        # keep the checksum manifest consistent so ONLY the member
        # decode path is under test
        sums_path = os.path.join(path, "_meta", "checksums.json")
        with open(sums_path) as f:
            sums = json.load(f)
        with open(shard, "rb") as f:
            sums["shards"][os.path.basename(shard)] = hashlib.sha256(
                f.read()
            ).hexdigest()
        with open(sums_path, "w") as f:
            json.dump(sums, f)
        rc = main(["--read-tar", path])
        captured = capsys.readouterr()
        assert rc == 4  # counted, not crashed
        assert "failed to decode" in captured.err
        assert "1 bad" in captured.out
        assert "checksums" in captured.out and "OK" in captured.out
