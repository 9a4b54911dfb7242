"""CLI: ``python -m igloo_spark.cli --sql "SELECT ..."``.

Mirrors the reference CLI (igloo-io/igloo ``crates/igloo/src/main.rs``):
``--sql`` runs a query against the registered catalog and pretty-prints;
``--explain`` shows the optimized plan (main.rs:109). The reference's
``--distributed`` flag falls back to local execution (main.rs:97-100);
here distribution is Spark's job — ``--master`` points at a cluster.
"""

from __future__ import annotations

import argparse
import sys


def _corpus_root(store: str) -> str:
    """Resolve a --corpus-store argument to its documents table root:
    the --prep-corpus/--ingest layout keeps documents under
    ``<store>/corpus``; a store created at a bare root (one
    ``write_versioned`` table) IS the table. Without the fallback a
    bare-root store hits a confusing "no versioned table at
    .../corpus" failure."""
    import os as _os

    sub = _os.path.join(store, "corpus")
    return sub if _os.path.isdir(_os.path.join(sub, "manifests")) else store


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="igloo-spark")
    parser.add_argument("--sql", default=None, help="SQL query to execute")
    parser.add_argument("--query", default=None, metavar="NAME",
                        help="run a named query from the declared corpus (needs --data-dir)")
    parser.add_argument("--list-queries", action="store_true",
                        help="list the declared query corpus and exit")
    parser.add_argument(
        "--serve", type=int, default=None, metavar="PORT",
        help="start an Arrow Flight server on PORT instead of running a query (0 = ephemeral)",
    )
    parser.add_argument(
        "--prep-corpus", default=None, metavar="OUT_DIR",
        help="run the training-corpus prep pipeline over the documents table "
        "and write per-shard training artifacts to OUT_DIR (needs --data-dir "
        "or --corpus-store)",
    )
    parser.add_argument(
        "--ingest", default=None, metavar="STORE_DIR",
        help="incrementally ingest the documents table into a versioned corpus "
        "store at STORE_DIR (exact + near-dup vs history, quality gate; "
        "needs --data-dir or --merge-from)",
    )
    parser.add_argument(
        "--min-quality", type=float, default=0.5,
        help="quality-gate threshold for --prep-corpus/--ingest (default 0.5)",
    )
    parser.add_argument(
        "--eval-docs", default=None, metavar="PARQUET",
        help="with --prep-corpus/--ingest: benchmark decontamination — "
        "documents whose bigram overlap with this eval set (parquet with "
        "doc_id/text) crosses --decon-threshold are dropped (prep) or "
        "rejected with a 'contaminated' verdict (ingest)",
    )
    parser.add_argument(
        "--decon-threshold", type=float, default=0.2,
        help="contamination fraction for --eval-docs (default 0.2)",
    )
    parser.add_argument(
        "--merge-from", default=None, metavar="SRC_STORE",
        help="with --ingest: take the batch from another corpus store's "
        "latest snapshot instead of --data-dir — merges crawl B into "
        "crawl A with the full exact/near-dup/quality gauntlet "
        "(cross-store dups are rejected against the target's history)",
    )
    parser.add_argument(
        "--bpe-merges", default=None, metavar="PATH",
        help="with --prep-corpus: encode every shard row to input_ids "
        "under a frozen BPE merge artifact (from --fit-bpe-merges) — "
        "the tokenized training handoff",
    )
    parser.add_argument(
        "--pack-budget", type=int, default=None, metavar="N",
        help="with --prep-corpus --bpe-merges: write PACKED training "
        "sequences (one row per N-id sequence with seq_ids + doc_spans "
        "loss-mask metadata) instead of per-document rows — the final "
        "loader-ready artifact",
    )
    parser.add_argument(
        "--chunk-budget", type=int, default=None, metavar="N",
        help="with --prep-corpus --pack-budget: slice over-budget "
        "documents into N-id context-window chunks BEFORE packing "
        "(chunk-then-pack) — bounds every training row; spans then "
        "describe chunks keyed doc_id*1000000+chunk_idx",
    )
    parser.add_argument(
        "--chunk-stride", type=int, default=None, metavar="N",
        help="with --chunk-budget: window stride (default = budget, "
        "disjoint splits; smaller = overlapping RAG windows)",
    )
    parser.add_argument(
        "--mix-alpha", type=float, default=None, metavar="A",
        help="with --prep-corpus: temperature-rebalance the cleaned "
        "corpus by source with per-class keep rate (n_min/n_c)^A "
        "(0 keeps everything, 1 equalizes to the smallest class, "
        "0.5 = the published sqrt temperature) — applied after "
        "dedup/quality/decon, before token-budget selection; the "
        "dataset card records the recipe",
    )
    parser.add_argument(
        "--fit-mix-rates", default=None, metavar="OUT_JSON",
        help="freeze the (n_min/n_c)^alpha temperature keep rates "
        "derived from the documents table as a mix-recipe artifact "
        "(alpha from --mix-alpha, default 0.5) — the cross-batch-"
        "stable counterpart to --mix-alpha, same pattern as "
        "--fit-bpe-merges (needs --data-dir or --corpus-store). "
        "NOTE the fit reads the RAW source table, not the prepped "
        "survivor set — cross-batch stability is the artifact's "
        "point; --mix-alpha derives from each prep run's own "
        "post-dedup/quality/decon survivors, so the two reproduce "
        "each other exactly only when prep drops nothing (fit from "
        "a prepped store's corpus view for exact parity)",
    )
    parser.add_argument(
        "--mix-rates", default=None, metavar="ART_JSON",
        help="with --prep-corpus or --ingest: apply a FROZEN "
        "mix-recipe artifact (from --fit-mix-rates). Prep: at "
        "selection instead of deriving rates from this batch — "
        "repeated exports keep the identical mix; mutually exclusive "
        "with --mix-alpha. Ingest: as the last admission gate "
        "(sampled-out docs get the mix_sampled_out verdict) — the "
        "same gate ingest_stream applies in-stream",
    )
    parser.add_argument(
        "--semantic-dedup", type=float, default=None, metavar="COSINE",
        help="with --ingest --persist-embeddings: reject batch docs "
        "whose embedding's cosine to an already-kept vector (store "
        "history or a lower-id doc in the same batch) reaches this "
        "threshold — the paraphrase duplicates the text fingerprints "
        "cannot see; rejections carry the 'semantic_dup' verdict",
    )
    parser.add_argument(
        "--scrub-pii", action="store_true",
        help="with --ingest or --prep-corpus: redact email/SSN/phone/"
        "IP matches to class tokens ([EMAIL], [SSN], [PHONE], [IP]) "
        "before anything derives from the text — the stored snapshot "
        "/ exported shards, quality scores, fingerprints and "
        "tokenization all see the scrubbed text. Keep the policy "
        "uniform per store (scrubbed and raw copies of a document "
        "do not exact-match)",
    )
    parser.add_argument(
        "--mix-default-rate", type=int, default=None, metavar="N",
        help="with --ingest --mix-rates: keep rate for classes ABSENT "
        "from the frozen recipe, as an integer in the recipe "
        "artifact's own precision units (0..precision; the default "
        "precision is 1e6, i.e. micro-units) — default keeps them all "
        "(an unseen source signals recipe staleness, not data to "
        "drop); 0 quarantines unknown classes instead",
    )
    parser.add_argument(
        "--verify-store", default=None, metavar="STORE_DIR",
        help="INTEGRITY-check an --ingest corpus store's manifests "
        "against the filesystem (missing/empty data files, version "
        "gaps, broken append lineage, a behind watermark; orphaned "
        "files reported as info) — no SparkSession, instant; exit 4 "
        "on corruption",
    )
    parser.add_argument(
        "--deep", action="store_true",
        help="with --verify-store: additionally re-hash every "
        "referenced data file (distributed binaryFile+sha2 scan, "
        "needs a SparkSession) against the sha256 digests recorded "
        "in the commit manifests — detects bitrot/tampering the "
        "shallow existence/size checks cannot; files committed "
        "before checksums existed are reported as unverified, not "
        "failed",
    )
    parser.add_argument(
        "--since-last", action="store_true",
        help="with --verify-store --deep: INCREMENTAL re-hash — skip "
        "files a previous green deep verify already hashed under the "
        "same recorded digest (state kept beside the manifests); a "
        "full re-hash stays the default without this flag",
    )
    parser.add_argument(
        "--hybrid-search", default=None, metavar="TEXT",
        help="HYBRID retrieval: BM25 over a persisted postings index "
        "(--index-root) + ANN over a persisted vector index "
        "(--vector-index, kind from --index-kind; dense query = "
        "--hybrid-vec's embedding) fused by reciprocal rank in "
        "integer nano-units (operators.retrieval.rrf_fuse) — needs "
        "--data-dir for the embeddings table",
    )
    parser.add_argument(
        "--hybrid-vec", type=int, default=None, metavar="VEC_ID",
        help="with --hybrid-search: vec_id of the dense query vector",
    )
    parser.add_argument(
        "--vector-index", default=None, metavar="PATH",
        help="with --hybrid-search: persisted vector index root "
        "(--index-root stays the postings index)",
    )
    parser.add_argument(
        "--fetch-docs", default=None, metavar="ID[,ID...]",
        help="POINT-LOOKUP fetch from a --corpus-store: read only the "
        "store files that can contain these doc ids (per-file range "
        "stats + bloom filters from the commit manifests — "
        "sources.versioned.read_versioned_at_keys), print the rows",
    )
    parser.add_argument(
        "--verify-fetch", action="store_true",
        help="with --fetch-docs or --hybrid-search --fetch: re-hash the "
        "candidate files against their manifest sha256 digests before "
        "reading (read-time bitrot detection scoped to the lookup; "
        "exit 4 on mismatch)",
    )
    parser.add_argument(
        "--delete-docs", default=None, metavar="ID[,ID...]",
        help="ROW-LEVEL DELETE from a --corpus-store (GDPR / "
        "right-to-be-forgotten): commit a new snapshot without these "
        "doc ids, rewriting only the files that can contain them "
        "(range stats + bloom pruning); older snapshots still hold "
        "the rows until --vacuum-store physically removes them",
    )
    parser.add_argument(
        "--fetch", action="store_true",
        help="with --hybrid-search --corpus-store: join the fused "
        "top-k ids back to the corpus store's documents (the same "
        "bloom-pruned point lookup as --fetch-docs) — the full "
        "search-then-fetch serving loop in one command",
    )
    parser.add_argument(
        "--diversify", action="store_true",
        help="with --hybrid-search: MMR-diversify the fused top-k "
        "(operators.retrieval.mmr_rerank — relevance = the integer "
        "RRF nano-score, redundancy = micro-cosine to the picked "
        "set; embeddings come from the corpus store when it persists "
        "them, else from --data-dir's embeddings table); composes "
        "with --fetch",
    )
    parser.add_argument(
        "--mmr-lambda", type=int, default=700, metavar="MILLI",
        help="with --diversify: relevance weight in milli-units "
        "(default 700 = 0.7 relevance / 0.3 diversity)",
    )
    parser.add_argument(
        "--mmr-k", type=int, default=None, metavar="K",
        help="with --diversify: diversified picks returned "
        "(default: --top-k)",
    )
    parser.add_argument(
        "--strict-sync", action="store_true",
        help="with --hybrid-search --corpus-store: exit 4 instead of "
        "warning when either persisted index (postings or vector) is "
        "out of sync with the corpus store — a stale index silently "
        "returns outdated fusions otherwise; repair with "
        "--repair-index",
    )
    parser.add_argument(
        "--read-tar", default=None, metavar="DIR",
        help="VERIFY a tar-shard export: parse every shard-*.tar via "
        "sources.read_tar_shards, decode the txt/ids.json (and "
        "denoise/FIM) members, report sample/shard/member counts, "
        "and check the sample count against the export's dataset "
        "card (_meta/report.json) when present — exit 4 on a card "
        "mismatch or an undecodable member",
    )
    parser.add_argument(
        "--epochs", default=None, metavar="CLS=K[,CLS=K...]",
        help="with --prep-corpus --pack-budget: replicate each source "
        "class K times before packing (the 'books see 3 epochs, web "
        "sees 1' pretraining mix); each copy packs under the unique "
        "key doc_id*K_max+epoch and the dataset card records the mix",
    )
    parser.add_argument(
        "--default-epochs", type=int, default=1, metavar="K",
        help="with --epochs: epoch count for classes not named "
        "(default 1; 0 drops them)",
    )
    parser.add_argument(
        "--batch-size", type=int, default=None, metavar="N",
        help="with --prep-corpus and ids (--bpe-merges or a tokenized "
        "store): write length-BUCKETED dynamic batches (N sequences "
        "per batch, each padded only to its batch max) instead of "
        "per-document rows — the fine-tuning/inference artifact; "
        "padding economics land in _meta/padding. Mutually exclusive "
        "with --pack-budget",
    )
    parser.add_argument(
        "--bucket-width", type=int, default=16, metavar="W",
        help="with --batch-size: length-bucket width in ids "
        "(default 16): sequences batch only with others whose length "
        "falls in the same W-id bucket",
    )
    parser.add_argument(
        "--denoise-window", type=int, default=None, metavar="W",
        help="with --prep-corpus and ids: additionally export "
        "T5-style span-corruption pairs (corrupt_ids/target_ids, "
        "deterministic hash-gated masking over W-id spans) on every "
        "per-document shard row — the seq2seq denoising artifact. "
        "Not with --pack-budget/--batch-size (pairs are per-document)",
    )
    parser.add_argument(
        "--denoise-mask-mod", type=int, default=5, metavar="M",
        help="with --denoise-window: mask ~1/M of spans (default 5)",
    )
    parser.add_argument(
        "--eos-id", type=int, default=None, metavar="ID",
        help="with --prep-corpus --pack-budget or --batch-size: "
        "append one separator id to every document. Packing: the GPT "
        "convention — boundaries recoverable from the id stream; with "
        "--chunk-budget only a doc's last chunk ends in eos. "
        "Batching: eos-terminated sequences (the SFT loader "
        "convention), appended before bucketing so batches group by "
        "true final lengths",
    )
    parser.add_argument(
        "--fim-mod", type=int, default=None, metavar="M",
        help="with --prep-corpus and ids: fill-in-the-middle — a "
        "deterministic ~1/M of docs reordered [PRE]prefix[SUF]suffix"
        "[MID]middle with hash-derived cut points. Per-document "
        "export: adds fim_ids/fim/cut columns; with --pack-budget: "
        "transforms BEFORE packing (FIM-then-pack, the code-model "
        "pretraining recipe). Not with --batch-size",
    )
    parser.add_argument(
        "--bpe-top-v", type=int, default=-1, metavar="N",
        help="vocabulary cap for --fit-bpe-merges and the --prep-corpus "
        "text-mode encode: bounds every driver-side vocab fetch; "
        "out-of-cap words fall back to the artifact's unk id. "
        "Default: cap SELF-DERIVED vocabs at 50000 but never cap a "
        "frozen --bpe-merges artifact vocab (capping one would make "
        "input_ids depend on the export batch's word frequencies, "
        "diverging from the ingest path). N caps either mode "
        "explicitly; 0 = uncapped (guarded at 1M distinct words)",
    )
    parser.add_argument(
        "--bpe-distributed", action="store_true",
        help="with --prep-corpus --bpe-merges: segment words on "
        "executors (one Arrow-batched stage, shuffle-side id join) "
        "instead of the driver-side vocab fetch — the huge-vocab "
        "mode; ignores --bpe-top-v",
    )
    parser.add_argument(
        "--max-unk-rate", type=float, default=None, metavar="RATE",
        help="with --ingest --tokenize: reject the batch when its unk "
        "fraction under the store's frozen vocab exceeds RATE "
        "(vocab-drift admission gate; exit 4)",
    )
    parser.add_argument(
        "--unk-rate-mode", choices=("fail", "warn"), default="fail",
        help="with --max-unk-rate: fail rejects the batch (default), "
        "warn commits and prints the rate to stderr",
    )
    parser.add_argument(
        "--corpus-report", default=None, metavar="OUT_JSON",
        help="write the dataset card (doc/token/dup/quality/language/"
        "source stats; id totals + fertility for a tokenized store) as "
        "JSON to OUT_JSON — needs --data-dir or --corpus-store",
    )
    parser.add_argument(
        "--compare-report", default=None, metavar="PREV_JSON",
        help="with --corpus-report: attach a vs_previous drift section "
        "(token/doc deltas, dup-rate/fertility drift, per-source and "
        "per-language mix drift in token-share micro-units) computed "
        "against a PREVIOUS card JSON — the nightly-export "
        "self-reporting loop (pairs naturally with --since-version)",
    )
    parser.add_argument(
        "--fit-bpe-merges", default=None, metavar="OUT_PATH",
        help="learn a BPE merge table from the documents table and save "
        "the frozen artifact JSON to OUT_PATH (needs --data-dir or "
        "--corpus-store)",
    )
    parser.add_argument(
        "--n-merges", type=int, default=8,
        help="merge count for --fit-bpe-merges (default 8)",
    )
    parser.add_argument(
        "--fit-quality-model", default=None, metavar="OUT_PATH",
        help="distill a quality-classifier student from the documents table "
        "(heuristic teacher at --label-threshold) and save the frozen model "
        "JSON to OUT_PATH (needs --data-dir)",
    )
    parser.add_argument(
        "--label-threshold", type=float, default=0.6,
        help="teacher label threshold for --fit-quality-model (default 0.6, "
        "x125's QCLF_LABEL_THR)",
    )
    parser.add_argument(
        "--quality-model", default=None, metavar="PATH",
        help="with --ingest: admit by a frozen quality-classifier artifact "
        "(from --fit-quality-model) instead of the heuristic gate alone",
    )
    parser.add_argument(
        "--quality-model-threshold", type=float, default=0.0,
        help="logit admission threshold for --quality-model (default 0.0)",
    )
    parser.add_argument(
        "--quality-model-root", default=None, metavar="PATH",
        help="with --ingest: distill-on-bootstrap admission model — the "
        "first ingest fits the student from its own batch and freezes "
        "the artifact at PATH; later ingests load it (mutually "
        "exclusive with --quality-model)",
    )
    parser.add_argument(
        "--postings-index", default=None, metavar="PATH",
        help="with --ingest: keep a persisted BM25 postings index at PATH "
        "synced with the corpus store (batch-sized append per ingest)",
    )
    parser.add_argument(
        "--ivf-index", default=None, metavar="PATH",
        help="with --ingest: keep a persisted IVF vector index at PATH "
        "synced with the corpus store (batch needs an 'embedding' column)",
    )
    parser.add_argument(
        "--pq-index", default=None, metavar="PATH",
        help="with --ingest: keep a persisted PQ code index at PATH synced "
        "with the corpus store",
    )
    parser.add_argument(
        "--ivfpq-index", default=None, metavar="PATH",
        help="with --ingest: keep a persisted IVFADC index at PATH synced "
        "with the corpus store",
    )
    parser.add_argument(
        "--learn-quantizers", action="store_true",
        help="with --ingest vector indexes: k-means-fit the quantizers on "
        "the first non-empty batch (frozen thereafter) instead of the "
        "deterministic defaults",
    )
    parser.add_argument(
        "--expect-unique-id", action="store_true",
        help="with --ingest: reject the whole batch atomically if doc_id "
        "is null or duplicated (batch-level contract, nothing committed); "
        "--expectation-mode warn commits anyway and reports counts",
    )
    parser.add_argument(
        "--expectation-mode", default="fail", choices=["fail", "warn"],
        help="behavior when --expect-unique-id finds violations (default fail)",
    )
    parser.add_argument(
        "--persist-embeddings", action="store_true",
        help="with --ingest: store the batch's 'embedding' column in the "
        "corpus snapshots, so vector indexes can be repaired from the "
        "store itself (--repair-index --index-kind ivf|pq|ivfpq)",
    )
    parser.add_argument(
        "--persist-source", action="store_true",
        help="with --ingest: store the batch's 'source' column in the "
        "corpus snapshots, so store views report per-source rollups "
        "and --corpus-report --since-version delta cards quantify "
        "per-night source-mix drift (the natural companion of a "
        "--mix-rates-gated store)",
    )
    parser.add_argument(
        "--tokenize", action="store_true",
        help="with --ingest: tokenize at ingest — the first batch learns "
        "BPE merges and freezes the id vocab at <store>/bpe.json; every "
        "snapshot row carries input_ids under that frozen tokenizer "
        "(training exports never re-tokenize)",
    )
    parser.add_argument(
        "--check-index-sync", default=None, metavar="STORE_DIR",
        help="report whether the index at --index-root is in sync with the "
        "corpus store (exit 0 in sync, 3 lagging)",
    )
    parser.add_argument(
        "--repair-index", default=None, metavar="STORE_DIR",
        help="rebuild the lagging index at --index-root from the corpus "
        "store's current snapshot (--index-kind picks the layout; "
        "vector kinds need a store ingested with --persist-embeddings "
        "— the rebuild reads the store's own embedding column and "
        "re-encodes against the index's frozen quantizer side tables)",
    )
    parser.add_argument(
        "--index-root", default=None, metavar="PATH",
        help="index directory for --check-index-sync/--repair-index",
    )
    parser.add_argument(
        "--optimize-store", default=None, metavar="STORE_DIR",
        help="OPTIMIZE an --ingest corpus store: compact the latest corpus "
        "and fps snapshots to --target-files files each (commits new "
        "versions; old versions stay readable until --vacuum-store)",
    )
    parser.add_argument(
        "--target-files", type=int, default=8,
        help="file count per table for --optimize-store (default 8)",
    )
    parser.add_argument(
        "--store-history", default=None, metavar="STORE_DIR",
        help="print the snapshot log (version, op, committed_at, n_files) "
        "of an --ingest corpus store's tables — the --as-of values "
        "available for time travel",
    )
    parser.add_argument(
        "--vacuum-store", default=None, metavar="STORE_DIR",
        help="VACUUM an --ingest corpus store: drop manifests older than "
        "the newest --keep-last versions of corpus and fps and delete "
        "unreferenced data files",
    )
    parser.add_argument(
        "--keep-last", type=int, default=2,
        help="versions to retain per table for --vacuum-store (default 2)",
    )
    parser.add_argument(
        "--index-kind", default="postings",
        choices=["postings", "ivf", "pq", "ivfpq"],
        help="index layout for --check-index-sync (default postings)",
    )
    parser.add_argument(
        "--token-budget", type=int, default=None,
        help="optional fixed token budget for --prep-corpus selection",
    )
    parser.add_argument(
        "--n-shards", type=int, default=8,
        help="training shard count for --prep-corpus (default 8)",
    )
    parser.add_argument(
        "--search", default=None, metavar="TEXT",
        help="BM25 top-k retrieval from a persisted postings index at "
        "--index-root (whitespace-tokenized query; bucket-pruned probe, "
        "corpus never read). Add --corpus-store to join document previews.",
    )
    parser.add_argument(
        "--top-k", type=int, default=10,
        help="result count for --search/--vector-search (default 10)",
    )
    parser.add_argument(
        "--vector-search", type=int, default=None, metavar="VEC_ID",
        help="ANN top-k from a persisted vector index at --index-root "
        "(--index-kind ivf|pq|ivfpq): the query is row VEC_ID of the "
        "--data-dir embeddings table; cell/bucket-pruned probe, corpus "
        "codes never fully scanned",
    )
    parser.add_argument(
        "--nprobe", type=int, default=2,
        help="cells probed for --vector-search with ivf/ivfpq (default 2)",
    )
    parser.add_argument("--explain", action="store_true", help="print the optimized plan")
    parser.add_argument(
        "--audit", action="store_true",
        help="print scale diagnostics (shuffles, joins, pushdown, Python stages)",
    )
    parser.add_argument(
        "--audit-runtime", action="store_true",
        help="execute and print per-operator runtime metrics (rows, shuffle bytes, spill)",
    )
    parser.add_argument("--data-dir", default=None, help="directory of <table>.parquet files to register")
    parser.add_argument(
        "--corpus-store", default=None, metavar="STORE_DIR",
        help="register an --ingest corpus store's tables as views — "
        "'corpus' (accepted documents) and 'corpus_fps' (their winnowed "
        "fingerprints) — for --sql/--query, --serve (Flight clients query "
        "the store), or --prep-corpus (shard-export the store)",
    )
    parser.add_argument(
        "--as-of", default=None, metavar="VERSION|TAG",
        help="time-travel version (integer) or snapshot tag (name) "
        "for --corpus-store (default: latest snapshot)",
    )
    parser.add_argument(
        "--tag-store", default=None, metavar="STORE_DIR",
        help="tag a store's snapshot with --tag NAME [--tag-version V] "
        "(pins it — and later versions — against --vacuum-store; "
        "re-tagging moves the ref), or drop one with --drop-tag NAME; "
        "no SparkSession",
    )
    parser.add_argument(
        "--tag", default=None, metavar="NAME",
        help="with --tag-store: the snapshot ref name to create/move",
    )
    parser.add_argument(
        "--tag-after", default=None, metavar="NAME",
        help="with --corpus-store --prep-corpus: after a successful "
        "export, move this snapshot tag to the store's current "
        "version — pairs with --since-version NAME for the nightly "
        "export-the-delta loop by name",
    )
    parser.add_argument(
        "--tag-version", type=int, default=None, metavar="V",
        help="with --tag-store --tag: version to pin (default: latest)",
    )
    parser.add_argument(
        "--drop-tag", default=None, metavar="NAME",
        help="with --tag-store: release this ref (snapshot becomes "
        "vacuumable again)",
    )
    parser.add_argument(
        "--since-version", default=None, metavar="V|TAG",
        help="with --corpus-store and --prep-corpus/--corpus-report: "
        "operate on the DELTA only — documents appended after store "
        "version V, an integer or a snapshot tag (manifest file diff, "
        "scans only the new files; requires an append-only range). "
        "0 = everything (bootstrap)",
    )
    parser.add_argument("--master", default=None, help="Spark master URL (default local[ncpus])")
    parser.add_argument("--limit", type=int, default=20, help="max rows to display")
    parser.add_argument("--output", default=None, help="write result to this path instead of printing")
    parser.add_argument(
        "--output-format", default="parquet", choices=["parquet", "csv", "json"],
        help="sink format for --output",
    )
    args = parser.parse_args(argv)
    if args.list_queries:
        from igloo_spark.queries import all_queries

        for spec in all_queries().values():
            print(f"{spec.name:32s} {spec.description}")
        return 0
    modes = [
        m for m, on in (
            ("--sql", args.sql is not None),
            ("--query", args.query is not None),
            ("--serve", args.serve is not None),
            ("--prep-corpus", args.prep_corpus is not None),
            ("--ingest", args.ingest is not None),
            ("--check-index-sync", args.check_index_sync is not None),
            ("--repair-index", args.repair_index is not None),
            ("--fit-quality-model", args.fit_quality_model is not None),
            ("--fit-bpe-merges", args.fit_bpe_merges is not None),
            ("--fit-mix-rates", args.fit_mix_rates is not None),
            ("--corpus-report", args.corpus_report is not None),
            ("--optimize-store", args.optimize_store is not None),
            ("--vacuum-store", args.vacuum_store is not None),
            ("--store-history", args.store_history is not None),
            ("--tag-store", args.tag_store is not None),
            ("--search", args.search is not None),
            ("--vector-search", args.vector_search is not None),
            ("--hybrid-search", args.hybrid_search is not None),
            ("--fetch-docs", args.fetch_docs is not None),
            ("--delete-docs", args.delete_docs is not None),
            ("--read-tar", args.read_tar is not None),
            ("--verify-store", args.verify_store is not None),
        ) if on
    ]
    if not modes:
        parser.error(
            "one of --sql, --query, --serve, --prep-corpus, --ingest, "
            "--check-index-sync, --repair-index, --fit-quality-model, "
            "--fit-bpe-merges, --fit-mix-rates, --corpus-report, --optimize-store, "
            "--vacuum-store, --store-history, --tag-store, --search, "
            "--vector-search, --fetch-docs, --delete-docs, --read-tar, "
            "or --verify-store is required"
        )
    # fail loudly on conflicting modes rather than silently ignoring one
    if len(modes) > 1:
        parser.error(f"{' and '.join(modes)} are mutually exclusive")
    if args.query is not None and not args.data_dir:
        parser.error("--query needs --data-dir (tables to run against)")
    if args.prep_corpus is not None and not (args.data_dir or args.corpus_store):
        parser.error(
            "--prep-corpus needs a documents source: --data-dir or --corpus-store"
        )
    if args.ingest is not None and not (args.data_dir or args.merge_from):
        parser.error(
            "--ingest needs a documents source: --data-dir or --merge-from"
        )
    if args.merge_from is not None and args.ingest is None:
        parser.error("--merge-from only applies to --ingest")
    if args.bpe_merges is not None and args.prep_corpus is None:
        parser.error("--bpe-merges only applies to --prep-corpus")
    if args.pack_budget is not None and (
        args.prep_corpus is None
        or (args.bpe_merges is None and args.corpus_store is None)
    ):
        parser.error(
            "--pack-budget needs --prep-corpus and either --bpe-merges "
            "or a tokenized --corpus-store"
        )
    if args.bpe_distributed and args.bpe_merges is None:
        parser.error("--bpe-distributed needs --prep-corpus --bpe-merges")
    if args.chunk_budget is not None and args.pack_budget is None:
        parser.error("--chunk-budget needs --pack-budget (chunk-then-pack)")
    if args.chunk_stride is not None and args.chunk_budget is None:
        parser.error("--chunk-stride needs --chunk-budget")
    if args.mix_alpha is not None and not (
        args.prep_corpus is not None or args.fit_mix_rates is not None
    ):
        parser.error("--mix-alpha only applies to --prep-corpus/--fit-mix-rates")
    if args.mix_rates is not None and args.prep_corpus is None and args.ingest is None:
        parser.error("--mix-rates only applies to --prep-corpus/--ingest")
    if args.mix_default_rate is not None and (
        args.ingest is None or args.mix_rates is None
    ):
        parser.error("--mix-default-rate needs --ingest --mix-rates")
    if args.scrub_pii and args.ingest is None and args.prep_corpus is None:
        parser.error("--scrub-pii only applies to --ingest/--prep-corpus")
    if args.semantic_dedup is not None:
        if args.ingest is None:
            parser.error("--semantic-dedup only applies to --ingest")
        if not args.persist_embeddings:
            parser.error(
                "--semantic-dedup needs --persist-embeddings (the gate "
                "probes the store's own kept vectors)"
            )
    if args.mix_rates is not None and args.mix_alpha is not None:
        parser.error(
            "--mix-alpha (derive from this batch) and --mix-rates "
            "(frozen artifact) are mutually exclusive"
        )
    if args.fit_mix_rates is not None and not (args.data_dir or args.corpus_store):
        parser.error(
            "--fit-mix-rates needs a documents source: --data-dir or "
            "--corpus-store"
        )
    if args.compare_report is not None and args.corpus_report is None:
        parser.error("--compare-report needs --corpus-report")
    if args.epochs is not None and args.pack_budget is None:
        parser.error("--epochs needs --pack-budget (epoch copies feed packing)")
    if args.eos_id is not None and args.pack_budget is None and args.batch_size is None:
        parser.error(
            "--eos-id needs --pack-budget (separators feed packing) "
            "or --batch-size (eos-terminated batched sequences)"
        )
    if args.batch_size is not None and args.pack_budget is not None:
        parser.error(
            "--batch-size and --pack-budget are mutually exclusive "
            "(padded batches vs packed sequences)"
        )
    if args.batch_size is not None and (
        args.prep_corpus is None
        or (args.bpe_merges is None and args.corpus_store is None)
    ):
        parser.error(
            "--batch-size needs --prep-corpus and either --bpe-merges "
            "or a tokenized --corpus-store"
        )
    if args.denoise_window is not None and (
        args.pack_budget is not None or args.batch_size is not None
    ):
        parser.error(
            "--denoise-window exports per-document pairs — not with "
            "--pack-budget/--batch-size"
        )
    if args.fim_mod is not None and args.batch_size is not None:
        parser.error(
            "--fim-mod composes with per-document rows or --pack-budget "
            "(FIM-then-pack, the code-model recipe) — not --batch-size"
        )
    for flag, val in (
        ("--denoise-window", args.denoise_window),
        ("--fim-mod", args.fim_mod),
    ):
        if val is None:
            continue
        if args.prep_corpus is None or (
            args.bpe_merges is None and args.corpus_store is None
        ):
            parser.error(
                f"{flag} needs --prep-corpus and either --bpe-merges "
                f"or a tokenized --corpus-store"
            )
    if args.max_unk_rate is not None and not (
        args.ingest is not None and args.tokenize
    ):
        parser.error("--max-unk-rate needs --ingest --tokenize")
    if args.fit_quality_model is not None and not args.data_dir:
        parser.error("--fit-quality-model needs --data-dir (documents table source)")
    if args.fit_bpe_merges is not None and not (args.data_dir or args.corpus_store):
        parser.error(
            "--fit-bpe-merges needs a documents source: --data-dir or --corpus-store"
        )
    if args.corpus_report is not None and not (args.data_dir or args.corpus_store):
        parser.error(
            "--corpus-report needs a documents source: --data-dir or --corpus-store"
        )
    if args.since_version is not None and not (
        args.corpus_store is not None
        and (args.prep_corpus is not None or args.corpus_report is not None)
    ):
        parser.error(
            "--since-version needs --corpus-store with --prep-corpus "
            "or --corpus-report"
        )
    if args.since_version is not None and args.since_version.lstrip(
        "-"
    ).isdigit():
        args.since_version = int(args.since_version)
    if args.tag_after is not None and not (
        args.corpus_store is not None and args.prep_corpus is not None
    ):
        parser.error("--tag-after needs --corpus-store with --prep-corpus")
    if args.tokenize and args.ingest is None:
        parser.error("--tokenize only applies to --ingest")
    if args.eval_docs is not None and (
        args.prep_corpus is None and args.ingest is None
    ):
        parser.error("--eval-docs only applies to --prep-corpus/--ingest")
    if args.quality_model is not None and args.ingest is None:
        parser.error("--quality-model only applies to --ingest")
    if args.quality_model_root is not None and args.ingest is None:
        parser.error("--quality-model-root only applies to --ingest")
    if args.quality_model is not None and args.quality_model_root is not None:
        parser.error("--quality-model and --quality-model-root are mutually exclusive")
    if args.as_of is not None and args.corpus_store is None:
        parser.error("--as-of only applies to --corpus-store")
    if args.as_of is not None and args.as_of.lstrip("-").isdigit():
        args.as_of = int(args.as_of)
    if args.tag_store is not None:
        if (args.tag is None) == (args.drop_tag is None):
            parser.error("--tag-store needs exactly one of --tag / --drop-tag")
    elif args.tag is not None or args.drop_tag is not None or (
        args.tag_version is not None
    ):
        parser.error("--tag/--tag-version/--drop-tag only apply to --tag-store")
    if args.search is not None and not args.index_root:
        parser.error("--search needs --index-root (a persisted postings index)")
    if args.vector_search is not None:
        if not args.index_root:
            parser.error("--vector-search needs --index-root (a persisted vector index)")
        if not args.data_dir:
            parser.error("--vector-search needs --data-dir (embeddings table for the query vector)")
        if args.index_kind == "postings":
            parser.error("--vector-search needs --index-kind ivf|pq|ivfpq")
    if args.hybrid_search is not None:
        if not args.index_root or not args.vector_index:
            parser.error(
                "--hybrid-search needs --index-root (postings) AND "
                "--vector-index (ivf|pq|ivfpq root)"
            )
        if args.hybrid_vec is None:
            parser.error("--hybrid-search needs --hybrid-vec (dense query vec_id)")
        if not args.data_dir:
            parser.error("--hybrid-search needs --data-dir (embeddings table)")
        if args.index_kind == "postings":
            parser.error("--hybrid-search needs --index-kind ivf|pq|ivfpq for --vector-index")
    if args.strict_sync:
        if args.hybrid_search is None:
            parser.error("--strict-sync only applies to --hybrid-search")
        if args.corpus_store is None:
            parser.error(
                "--strict-sync needs --corpus-store (the store the "
                "indexes must be in sync with)"
            )
    if args.fetch:
        if args.hybrid_search is None:
            parser.error("--fetch only applies to --hybrid-search")
        if args.corpus_store is None:
            parser.error("--fetch needs --corpus-store (the documents)")
    if args.diversify and args.hybrid_search is None:
        parser.error("--diversify only applies to --hybrid-search")
    if args.since_last and not (args.verify_store is not None and args.deep):
        parser.error("--since-last only applies to --verify-store --deep")
    if args.fetch_docs is not None:
        if args.corpus_store is None:
            parser.error("--fetch-docs needs --corpus-store")
        try:
            [int(x) for x in args.fetch_docs.split(",") if x.strip()]
        except ValueError:
            parser.error(
                f"--fetch-docs expects comma-separated integer doc ids, "
                f"got {args.fetch_docs!r}"
            )
    if args.verify_fetch and args.fetch_docs is None and not args.fetch:
        parser.error(
            "--verify-fetch only applies to --fetch-docs or "
            "--hybrid-search --fetch"
        )
    if args.delete_docs is not None:
        if args.corpus_store is None:
            parser.error("--delete-docs needs --corpus-store")
        try:
            [int(x) for x in args.delete_docs.split(",") if x.strip()]
        except ValueError:
            parser.error(
                f"--delete-docs expects comma-separated integer doc ids, "
                f"got {args.delete_docs!r}"
            )
    if args.corpus_store is not None and not (
        args.sql is not None
        or args.query is not None
        or args.serve is not None
        or args.prep_corpus is not None
        or args.search is not None
        or args.hybrid_search is not None
        or args.fetch_docs is not None
        or args.delete_docs is not None
        or args.fit_bpe_merges is not None
        or args.fit_mix_rates is not None
        or args.corpus_report is not None
    ):
        parser.error(
            "--corpus-store only applies to --sql/--query/--serve/"
            "--prep-corpus/--search/--hybrid-search/--fetch-docs/"
            "--delete-docs/--fit-bpe-merges/--fit-mix-rates/"
            "--corpus-report"
        )
    if (args.check_index_sync or args.repair_index) and not args.index_root:
        parser.error("--check-index-sync/--repair-index need --index-root")
    # --repair-index supports all four kinds: postings rebuilds from the
    # store's text; vector kinds rebuild from the store's own embedding
    # column when it was ingested with --persist-embeddings (otherwise
    # repair_index raises and we exit 2 with its message)

    if args.tag_store is not None:
        # ref metadata only — no SparkSession (instant, scriptable)
        import os as _os

        from igloo_spark.sources.versioned import delete_tag, tag_versioned

        store = args.tag_store
        roots = [
            f"{store}/{t}" for t in ("corpus", "fps")
            if _os.path.isdir(f"{store}/{t}/manifests")
        ] or ([store] if _os.path.isdir(f"{store}/manifests") else [])
        if not roots:
            print(f"error: no versioned tables under {store}", file=sys.stderr)
            return 2
        try:
            for troot in roots:
                if args.tag is not None:
                    v = tag_versioned(troot, args.tag, args.tag_version)
                    print(f"{troot}: tag {args.tag!r} -> v{v}")
                else:
                    delete_tag(troot, args.drop_tag)
                    print(f"{troot}: dropped tag {args.drop_tag!r}")
        except (FileNotFoundError, ValueError) as e:
            print(f"error: --tag-store: {e}", file=sys.stderr)
            return 2
        return 0

    if args.store_history is not None:
        # manifest metadata only — no SparkSession (instant, scriptable)
        import os as _os

        from igloo_spark.sources.versioned import snapshots

        store = args.store_history
        roots = {
            t: f"{store}/{t}" for t in ("corpus", "fps")
            if _os.path.isdir(f"{store}/{t}/manifests")
        } or (
            {"store": store} if _os.path.isdir(f"{store}/manifests") else {}
        )
        if not roots:
            print(f"error: no versioned tables under {store}", file=sys.stderr)
            return 2
        for t, troot in roots.items():
            print(f"{t}:")
            for s in snapshots(troot):
                tags = (
                    "  tags=" + ",".join(s["tags"]) if s["tags"] else ""
                )
                print(
                    f"  v{s['version']}  {s['op']:<10s} "
                    f"files={s['n_files']}  committed_at={s['committed_at']}"
                    f"{tags}"
                )
        return 0

    if args.verify_store is not None:
        # manifest-vs-filesystem integrity — no SparkSession (instant,
        # scriptable), the --store-history posture; --deep adds a
        # distributed content re-hash and so does spin up a session
        import os as _os

        from igloo_spark.sources.versioned import verify_versioned

        store = args.verify_store
        # accept the --prep-corpus layout (<root>/corpus, <root>/fps)
        # AND a bare single-table root (a store created directly with
        # write_versioned)
        tables = [
            t for t in ("corpus", "fps")
            if _os.path.isdir(f"{store}/{t}/manifests")
        ]
        roots = (
            {t: f"{store}/{t}" for t in tables}
            if tables
            else ({"store": store} if _os.path.isdir(f"{store}/manifests") else {})
        )
        if not roots:
            print(f"error: no versioned tables under {store}", file=sys.stderr)
            return 2

        def _check(spark=None) -> int:
            rc = 0
            for t, troot in roots.items():
                v = verify_versioned(
                    troot, deep=args.deep, spark=spark,
                    since_last=args.since_last,
                )
                status = "OK" if v["ok"] else "CORRUPT"
                extra = (
                    f" deep: {v['checksums_unverified']} unverified, "
                    f"{v['deep_files_hashed']} hashed, "
                    f"{v['deep_files_skipped']} already-verified"
                    if args.deep else ""
                )
                print(
                    f"{t}: {status}  versions={v['n_versions']} "
                    f"latest=v{v['latest']} orphans={v['orphan_files']}"
                    f"{extra}"
                )
                for key in (
                    "missing_files", "empty_files", "version_gaps",
                    "lineage_breaks", "checksum_mismatches",
                ):
                    if v[key]:
                        print(f"  {key}: {v[key]}", file=sys.stderr)
                if v["watermark_behind"]:
                    print(
                        "  watermark behind newest batch_id",
                        file=sys.stderr,
                    )
                if not v["ok"]:
                    rc = 4
            return rc

        if not args.deep:
            return _check()
        from igloo_spark import IglooSession

        with IglooSession(master=args.master) as session:
            return _check(session.spark)

    from igloo_spark import IglooSession

    with IglooSession(master=args.master) as session:
        if args.data_dir:
            import os

            if not os.path.isdir(args.data_dir):
                print(f"error: --data-dir not found: {args.data_dir}", file=sys.stderr)
                return 2
            session.register_parquet_dir(args.data_dir)
            if not session.table_names():
                print(f"warning: no <table>.parquet files under {args.data_dir}", file=sys.stderr)
        else:
            _register_demo_tables(session)
        if args.corpus_store is not None:
            from igloo_spark.sources.versioned import read_versioned

            try:
                session.register_table(
                    "corpus",
                    read_versioned(
                        session.spark, _corpus_root(args.corpus_store),
                        version=args.as_of,
                    ),
                )
                # fingerprints ride along for dedup forensics; older
                # as-of versions may predate the fp store — skip quietly
                try:
                    session.register_table(
                        "corpus_fps",
                        read_versioned(
                            session.spark, args.corpus_store + "/fps",
                            version=args.as_of,
                        ),
                    )
                except (FileNotFoundError, ValueError):
                    pass
            except (FileNotFoundError, ValueError) as e:
                print(f"error: --corpus-store: {e}", file=sys.stderr)
                return 2
        if args.prep_corpus is not None:
            from igloo_spark.pipelines import (
                prepare_training_corpus,
                write_training_shards,
            )

            def _export_done() -> int:
                # move the named ref to the version just exported so
                # the next --since-version NAME picks up from here
                if args.tag_after is not None:
                    from igloo_spark.sources.versioned import tag_versioned

                    v = tag_versioned(
                        _corpus_root(args.corpus_store), args.tag_after
                    )
                    print(f"tagged corpus v{v} as {args.tag_after!r}")
                return 0

            # ingest → store → export is the production loop: prefer the
            # versioned store's accepted corpus when one is given
            docs = session.spark.table(
                "corpus" if args.corpus_store is not None else "documents"
            )
            if args.since_version is not None:
                # incremental export: only the rows appended after the
                # named version — a manifest file-set diff, so the
                # scan cost is the delta's, not the history's
                from igloo_spark.sources.versioned import read_version_delta

                try:
                    docs = read_version_delta(
                        session.spark, _corpus_root(args.corpus_store),
                        from_version=args.since_version,
                        to_version=args.as_of,
                    )
                except (FileNotFoundError, ValueError) as e:
                    print(f"error: --since-version: {e}", file=sys.stderr)
                    return 2
            if args.scrub_pii:
                # scrub at the SOURCE so selection, fingerprints and
                # the export text join all see the redacted text
                from pyspark.sql import functions as _F

                from igloo_spark.functions.text import redact_pii

                docs = docs.withColumn("text", redact_pii(_F.col("text")))
            eval_frame = None
            if args.eval_docs is not None:
                try:
                    eval_frame = session.spark.read.parquet(args.eval_docs)
                except Exception as e:
                    print(f"error: --eval-docs: {e}", file=sys.stderr)
                    return 2
            if (
                args.mix_alpha is not None or args.mix_rates is not None
            ) and "source" not in docs.columns:
                print(
                    "error: --mix-alpha/--mix-rates need a 'source' "
                    "column on the documents source",
                    file=sys.stderr,
                )
                return 2
            mix_rates = None
            mix_precision = 1_000_000
            if args.mix_rates is not None:
                from igloo_spark.operators.packing import load_mix_rates

                try:
                    mix_rates, mix_precision, _ = load_mix_rates(
                        args.mix_rates
                    )
                except (FileNotFoundError, ValueError, KeyError) as e:
                    print(f"error: --mix-rates: {e}", file=sys.stderr)
                    return 2
            result = prepare_training_corpus(
                docs, "doc_id", "text",
                min_quality=args.min_quality,
                token_budget=args.token_budget,
                n_shards=args.n_shards,
                eval_docs=eval_frame,
                decon_threshold=args.decon_threshold,
                mix_alpha=args.mix_alpha,
                mix_rates=mix_rates,
                mix_precision=mix_precision,
            )
            # --bpe-top-v: -1 (the default) = the pipeline sentinel
            # (cap self-derived vocabs at 50k, never cap a frozen
            # artifact vocab); 0 = uncapped; N = explicit cap
            cli_top_v = None if args.bpe_top_v == 0 else args.bpe_top_v
            bpe_merges = None
            bpe_vocab = None
            bpe_word_ids = None
            if args.bpe_merges is not None:
                from igloo_spark.operators.bpe import (
                    load_bpe_merges,
                    load_bpe_vocab,
                    load_bpe_word_ids,
                )

                try:
                    bpe_merges = load_bpe_merges(args.bpe_merges)
                    bpe_vocab = load_bpe_vocab(args.bpe_merges)
                    bpe_word_ids = load_bpe_word_ids(args.bpe_merges)
                except (FileNotFoundError, ValueError) as e:
                    print(f"error: --bpe-merges: {e}", file=sys.stderr)
                    return 2
            if args.pack_budget is not None:
                from igloo_spark.pipelines import write_packed_token_shards

                if bpe_merges is None and not {"input_ids", "n_ids"} <= set(docs.columns):
                    print(
                        "error: --pack-budget without --bpe-merges needs a "
                        "TOKENIZED --corpus-store (corpus lacks input_ids; "
                        "ingest with --tokenize or pass --bpe-merges)",
                        file=sys.stderr,
                    )
                    return 2
                epochs = None
                if args.epochs is not None:
                    try:
                        epochs = _parse_epochs(args.epochs)
                    except ValueError as e:
                        print(f"error: --epochs: {e}", file=sys.stderr)
                        return 2
                    if "source" not in docs.columns:
                        print(
                            "error: --epochs needs a 'source' column on "
                            "the documents source",
                            file=sys.stderr,
                        )
                        return 2
                try:
                    info = write_packed_token_shards(
                        docs, result, args.prep_corpus,
                        bpe_merges, bpe_vocab=bpe_vocab,
                        budget=args.pack_budget, n_shards=args.n_shards,
                        bpe_top_v=cli_top_v,
                        bpe_distributed=args.bpe_distributed,
                        bpe_word_ids=bpe_word_ids,
                        chunk_budget=args.chunk_budget,
                        chunk_stride=args.chunk_stride,
                        epochs=epochs,
                        default_epochs=args.default_epochs,
                        eos_id=args.eos_id,
                        fim_rate_mod=args.fim_mod,
                    )
                except ValueError as e:
                    # contract violations (eos/sentinel/vocab id
                    # collisions, key-overflow guards) exit cleanly
                    # like every other CLI input error
                    print(f"error: --pack-budget: {e}", file=sys.stderr)
                    return 2
                counts = result.counts.first().asDict()
                chunked = (
                    f" (chunk budget {info['chunk_budget']}/"
                    f"stride {info['chunk_stride']})"
                    if "chunk_budget" in info else ""
                )
                mixed = (
                    f" (epochs {info['epochs']}, default "
                    f"{info['default_epochs']})"
                    if "epochs" in info else ""
                )
                fimmed = (
                    f" ({info['n_fim']} docs FIM-reordered at ~1/"
                    f"{info['fim_rate_mod']})"
                    if "fim_rate_mod" in info else ""
                )
                print(
                    f"prepared corpus: {counts} -> {info['n_docs']} docs "
                    f"packed into {info['n_rows']} sequences "
                    f"({info['n_ids']} ids, budget {info['budget']})"
                    f"{chunked}{mixed}{fimmed} in "
                    f"{info['n_shards']} shards at {args.prep_corpus}"
                )
                return _export_done()
            if args.batch_size is not None:
                from igloo_spark.pipelines import write_batched_token_shards

                if bpe_merges is None and not {"input_ids", "n_ids"} <= set(docs.columns):
                    print(
                        "error: --batch-size without --bpe-merges needs a "
                        "TOKENIZED --corpus-store (corpus lacks input_ids; "
                        "ingest with --tokenize or pass --bpe-merges)",
                        file=sys.stderr,
                    )
                    return 2
                try:
                    info = write_batched_token_shards(
                        docs, result, args.prep_corpus,
                        bpe_merges, bpe_vocab=bpe_vocab,
                        bucket_width=args.bucket_width,
                        batch_size=args.batch_size,
                        n_shards=args.n_shards,
                        bpe_top_v=cli_top_v,
                        bpe_distributed=args.bpe_distributed,
                        bpe_word_ids=bpe_word_ids,
                        eos_id=args.eos_id,
                    )
                except ValueError as e:
                    print(f"error: --batch-size: {e}", file=sys.stderr)
                    return 2
                counts = result.counts.first().asDict()
                print(
                    f"prepared corpus: {counts} -> {info['n_seqs']} "
                    f"sequences in {info['n_batches']} batches "
                    f"(batch {info['batch_size']}, bucket width "
                    f"{info['bucket_width']}, pad waste "
                    f"{info['pad_waste_micro']}ppm) in "
                    f"{info['n_shards']} shards at {args.prep_corpus}"
                )
                return _export_done()
            if (
                args.denoise_window is not None or args.fim_mod is not None
            ) and (bpe_merges is None and not {"input_ids", "n_ids"} <= set(docs.columns)):
                print(
                    "error: --denoise-window/--fim-mod without "
                    "--bpe-merges need a TOKENIZED --corpus-store "
                    "(corpus lacks input_ids; ingest with --tokenize "
                    "or pass --bpe-merges)",
                    file=sys.stderr,
                )
                return 2
            info = write_training_shards(
                docs, result, args.prep_corpus,
                bpe_merges=bpe_merges, bpe_vocab=bpe_vocab,
                bpe_top_v=cli_top_v,
                bpe_distributed=args.bpe_distributed,
                bpe_word_ids=bpe_word_ids,
                denoise_window=args.denoise_window,
                denoise_mask_mod=args.denoise_mask_mod,
                fim_rate_mod=args.fim_mod,
            )
            counts = result.counts.first().asDict()
            denoised = (
                f" ({info['n_masked']} spans masked at window "
                f"{info['denoise_window']})"
                if "denoise_window" in info else ""
            )
            fimmed = (
                f" ({info['n_fim']} docs FIM-reordered at ~1/"
                f"{info['fim_rate_mod']})"
                if "fim_rate_mod" in info else ""
            )
            print(
                f"prepared corpus: {counts} -> {info['n_docs']} docs in "
                f"{info['n_shards']} shards{denoised}{fimmed} at "
                f"{args.prep_corpus}"
            )
            return _export_done()
        if args.optimize_store is not None or args.vacuum_store is not None:
            import os as _os

            from igloo_spark.sources.versioned import (
                compact_versioned,
                vacuum_versioned,
            )

            store = args.optimize_store or args.vacuum_store
            tables = [
                t for t in ("corpus", "fps")
                if _os.path.isdir(f"{store}/{t}/manifests")
            ]
            if not tables:
                print(f"error: no versioned tables under {store}", file=sys.stderr)
                return 2
            if args.optimize_store is not None:
                for t in tables:
                    v = compact_versioned(
                        session.spark, f"{store}/{t}", n_files=args.target_files
                    )
                    print(f"optimized {t} -> v{v} ({args.target_files} files)")
            else:
                for t in tables:
                    deleted = vacuum_versioned(
                        f"{store}/{t}", keep_last=args.keep_last
                    )
                    print(
                        f"vacuumed {t}: {len(deleted)} data files reclaimed "
                        f"(kept last {args.keep_last} versions)"
                    )
            return 0
        if args.delete_docs is not None:
            from igloo_spark.sources.versioned import delete_from_versioned

            ids = [
                int(x) for x in args.delete_docs.split(",") if x.strip()
            ]
            try:
                v = delete_from_versioned(
                    session.spark, _corpus_root(args.corpus_store),
                    "doc_id", ids,
                )
            except (FileNotFoundError, ValueError) as e:
                print(f"error: --delete-docs: {e}", file=sys.stderr)
                return 2
            print(
                f"deleted {len(ids)} doc id(s) -> corpus v{v} "
                f"(older snapshots retain them until --vacuum-store)"
            )
            return 0
        if args.check_index_sync is not None:
            from igloo_spark.pipelines import check_index_sync

            status = check_index_sync(
                session.spark, _corpus_root(args.check_index_sync),
                args.index_root, kind=args.index_kind,
            )
            print(f"index sync ({args.index_kind}): {status}")
            return 0 if status["in_sync"] else 3
        if args.repair_index is not None:
            from igloo_spark.pipelines import repair_index

            try:
                out = repair_index(
                    session.spark, _corpus_root(args.repair_index),
                    args.index_root, args.index_kind,
                )
            except ValueError as e:
                print(f"error: --repair-index: {e}", file=sys.stderr)
                return 2
            print(f"repair ({args.index_kind}): {out}")
            return 0 if out["in_sync"] else 3
        if args.corpus_report is not None:
            import json as _json

            from igloo_spark.pipelines import corpus_report

            docs = session.spark.table(
                "corpus" if args.corpus_store is not None else "documents"
            )
            if args.since_version is not None:
                # card for last night's batch alone: the delta view
                from igloo_spark.sources.versioned import read_version_delta

                try:
                    docs = read_version_delta(
                        session.spark, _corpus_root(args.corpus_store),
                        from_version=args.since_version,
                        to_version=args.as_of,
                    )
                except (FileNotFoundError, ValueError) as e:
                    print(f"error: --since-version: {e}", file=sys.stderr)
                    return 2
            report = corpus_report(docs)
            if args.compare_report is not None:
                from igloo_spark.pipelines import compare_dataset_cards

                try:
                    with open(args.compare_report) as fh:
                        previous = _json.load(fh)
                except (FileNotFoundError, ValueError) as e:
                    print(f"error: --compare-report: {e}", file=sys.stderr)
                    return 2
                report["vs_previous"] = compare_dataset_cards(
                    report, previous
                )
                report["vs_previous"]["previous_card"] = args.compare_report
            with open(args.corpus_report, "w") as fh:
                _json.dump(report, fh, indent=1, sort_keys=True)
            drift = ""
            if "vs_previous" in report:
                d = report["vs_previous"].get("n_tokens", {})
                drift = f", token delta {d.get('delta', 0):+d} vs previous"
            print(
                f"dataset card: {report['n_docs']} docs, "
                f"{report['n_tokens']} tokens, "
                f"dup_rate {report['exact_dup_rate']}, "
                f"{len(report.get('sources', {}))} sources{drift} -> "
                f"{args.corpus_report}"
            )
            return 0
        if args.fit_mix_rates is not None:
            from igloo_spark.operators.packing import (
                save_mix_rates,
                temperature_rates,
            )

            docs = session.spark.table(
                "corpus" if args.corpus_store is not None else "documents"
            )
            if "source" not in docs.columns:
                print(
                    "error: --fit-mix-rates needs a 'source' column on "
                    "the documents source",
                    file=sys.stderr,
                )
                return 2
            alpha = args.mix_alpha if args.mix_alpha is not None else 0.5
            from pyspark.sql import functions as _F

            classes = docs.select(
                _F.coalesce(_F.col("source").cast("string"), _F.lit("<null>"))
                .alias("__mix_cls")
            )
            rates = temperature_rates(classes, "__mix_cls", alpha=alpha)
            save_mix_rates(
                rates, args.fit_mix_rates, alpha=alpha, mix_col="source"
            )
            print(
                f"froze {len(rates)} class rates (alpha {alpha}) -> "
                f"{args.fit_mix_rates}"
            )
            return 0
        if args.fit_bpe_merges is not None:
            from igloo_spark.operators.bpe import (
                bpe_token_id_map,
                learn_bpe_merges,
                save_bpe_merges,
            )

            docs = session.spark.table(
                "corpus" if args.corpus_store is not None else "documents"
            )
            # the id map freezes under the SAME cap the merges were
            # learned with: both driver-side fetches are then bounded
            # at --bpe-top-v, and out-of-cap symbols hit the frozen
            # artifact's reserved unk_id at encode time (0 = uncapped,
            # still guarded by the structural MAX_VOCAB_ROWS take()).
            # Fitting always SELF-derives the vocab, so the -1 default
            # resolves to the 50k self-derived cap here.
            from igloo_spark.pipelines import DEFAULT_SELF_TOP_V

            top_v = (
                DEFAULT_SELF_TOP_V
                if args.bpe_top_v == -1
                else (args.bpe_top_v or None)
            )
            from igloo_spark.operators.bpe import corpus_vocab

            # one vocab fetch shared by training and id assignment
            # (both use the same top_v cap, so the rows are identical)
            vocab_rows = corpus_vocab(docs, top_v=top_v)
            merges = learn_bpe_merges(
                docs, n_merges=args.n_merges, top_v=top_v,
                vocab_rows=vocab_rows,
            )
            # freeze the id vocab with the merges: ids then come from
            # the artifact, not from whichever corpus is encoded later
            vocab = bpe_token_id_map(
                docs, merges, top_v=top_v, vocab_rows=vocab_rows
            )
            # persist the word -> id-sequence derivation too: the
            # vocab rows are already in hand, so the table is pure
            # driver-side segmentation (zero extra Spark jobs) and
            # every later frozen-artifact encode skips ITS corpus
            # vocabulary pass entirely (guide §1.2)
            from igloo_spark.operators.bpe import frozen_word_ids

            word_ids = frozen_word_ids(
                docs, merges, top_v=top_v, token_ids=vocab,
                unk_id=len(vocab), vocab_rows=vocab_rows,
            )
            save_bpe_merges(
                merges, args.fit_bpe_merges, vocab=vocab,
                word_ids=word_ids,
            )
            print(
                f"learned {len(merges)} BPE merges "
                f"({len(vocab)} vocab ids, top_v "
                f"{top_v if top_v is not None else 'uncapped'}) "
                f"-> {args.fit_bpe_merges}"
            )
            return 0
        if args.fit_quality_model is not None:
            from igloo_spark.operators.classifier import (
                distill_quality_classifier,
                save_quality_classifier,
            )

            clf = distill_quality_classifier(
                session.spark.table("documents"),
                label_threshold=args.label_threshold,
            )
            save_quality_classifier(clf, args.fit_quality_model)
            print(
                f"fit quality classifier ({clf.n_buckets} buckets, "
                f"bias={clf.bias:.6f}) -> {args.fit_quality_model}"
            )
            return 0
        if args.ingest is not None:
            from igloo_spark.pipelines import incremental_ingest

            quality_model = None
            if args.quality_model is not None:
                from igloo_spark.operators.classifier import (
                    load_quality_classifier,
                )

                quality_model = load_quality_classifier(args.quality_model)
            if args.merge_from is not None:
                from igloo_spark.sources.versioned import read_versioned

                try:
                    src = read_versioned(
                        session.spark, args.merge_from + "/corpus"
                    )
                    cols = ["doc_id", "text"] + (
                        ["embedding"] if "embedding" in src.columns else []
                    ) + (
                        # a source-persisting store merges its class
                        # column along (the target may persist it too)
                        ["source"] if "source" in src.columns else []
                    )
                    batch = src.select(*cols)
                except (FileNotFoundError, ValueError) as e:
                    print(f"error: --merge-from: {e}", file=sys.stderr)
                    return 2
            else:
                batch = session.spark.table("documents")
            eval_frame = None
            if args.eval_docs is not None:
                try:
                    eval_frame = session.spark.read.parquet(args.eval_docs)
                except Exception as e:
                    print(f"error: --eval-docs: {e}", file=sys.stderr)
                    return 2
            expectations = None
            if args.expect_unique_id:
                from igloo_spark.operators.expectations import (
                    expect_not_null,
                )

                expectations = {
                    "row_rules": [expect_not_null("doc_id")],
                    "unique_keys": [["doc_id"]],
                }
            mix_rates = None
            mix_precision = 1_000_000
            if args.mix_rates is not None:
                from igloo_spark.operators.packing import load_mix_rates

                try:
                    mix_rates, mix_precision, _ = load_mix_rates(
                        args.mix_rates
                    )
                except (FileNotFoundError, ValueError, KeyError) as e:
                    print(f"error: --mix-rates: {e}", file=sys.stderr)
                    return 2
                if "source" not in batch.columns:
                    print(
                        "error: --mix-rates needs a 'source' column "
                        "on the ingest batch",
                        file=sys.stderr,
                    )
                    return 2
            try:
                result = incremental_ingest(
                    batch, args.ingest,
                    min_quality=args.min_quality,
                    mix_rates=mix_rates,
                    mix_precision=mix_precision,
                    mix_default_rate=args.mix_default_rate,
                    scrub_pii=args.scrub_pii,
                    postings_index_root=args.postings_index,
                    quality_model=quality_model,
                    quality_model_threshold=args.quality_model_threshold,
                    quality_model_root=args.quality_model_root,
                    persist_embeddings=args.persist_embeddings,
                    persist_source=args.persist_source,
                    tokenize=args.tokenize,
                    max_unk_rate=args.max_unk_rate,
                    unk_rate_mode=args.unk_rate_mode,
                    eval_docs=eval_frame,
                    decon_threshold=args.decon_threshold,
                    ivf_index_root=args.ivf_index,
                    pq_index_root=args.pq_index,
                    ivfpq_index_root=args.ivfpq_index,
                    learn_quantizers=args.learn_quantizers,
                    expectations=expectations,
                    expectation_mode=args.expectation_mode,
                    semantic_dedup_threshold=args.semantic_dedup,
                )
            except Exception as e:
                from igloo_spark.pipelines import (
                    BatchExpectationError,
                    UnkRateError,
                )

                if isinstance(e, (BatchExpectationError, UnkRateError)):
                    # batch-level gate rejection: nothing committed
                    print(f"error: --ingest: {e}", file=sys.stderr)
                    return 4
                if isinstance(e, ValueError):
                    # contract violations (mixed persist_embeddings /
                    # tokenize stores, conflicting model args) exit
                    # cleanly like every other CLI input error
                    print(f"error: --ingest: {e}", file=sys.stderr)
                    return 2
                raise
            verdicts = {
                r["verdict"]: r["count"]
                for r in result.verdicts.groupBy("verdict").count().collect()
            }
            unk_note = (
                f"; unk rate {result.unk_rate:.4%}"
                if result.unk_rate is not None else ""
            )
            print(
                f"ingested batch -> corpus v{result.corpus_version} "
                f"(fp store v{result.fp_version}); verdicts: {verdicts}"
                f"{unk_note}"
            )
            if result.expectation_violations is not None:
                # warn-mode contract violations committed anyway — say
                # so loudly (fail mode never reaches here: it raised)
                from pyspark.sql import functions as F

                for r in (
                    result.expectation_violations
                    .filter(F.col("n_violations") > 0)
                    .collect()
                ):
                    print(
                        f"warning: expectation {r['rule']}="
                        f"{r['n_violations']} violations (committed; "
                        f"--expectation-mode warn)",
                        file=sys.stderr,
                    )
            return 0
        if args.read_tar is not None:
            # loader-side verification of the WebDataset roundtrip:
            # every member the exporters write is requested (absent
            # families read as all-NULL columns and are skipped in the
            # report), id-family members must decode as a JSON bigint
            # array or be the exporters' NULL-member skip signal (the
            # literal ``null``), and the recovered sample count is
            # checked against the dataset card the export shipped
            import glob as _glob
            import json as _json
            import os as _os

            from pyspark.sql import functions as F

            from igloo_spark.sources import read_tar_shards

            tar_dir = args.read_tar
            if not _glob.glob(_os.path.join(tar_dir, "shard-*.tar")):
                print(
                    f"error: --read-tar: no shard-*.tar under {tar_dir}",
                    file=sys.stderr,
                )
                return 2
            id_members = {
                "ids.json": "ids_json",
                "corrupt.json": "corrupt_json",
                "target.json": "target_json",
                "fim.json": "fim_json",
            }
            samples = read_tar_shards(
                session.spark, tar_dir,
                members=("txt", *id_members),
            )
            aggs = [
                F.count("*").alias("n_samples"),
                F.countDistinct("shard").alias("n_shards"),
                F.sum(F.col("txt").isNotNull().cast("bigint")).alias("n_txt"),
            ]
            for c in id_members.values():
                # binary->string CAST, not decode(): under ANSI mode
                # (PySpark 4 default) decode() raises
                # MALFORMED_CHARACTER_CODING on invalid UTF-8, which
                # would crash the verifier on exactly the corrupted
                # member it exists to count. cast("string") wraps the
                # bytes unvalidated; from_json on garbage returns
                # null, so a malformed member lands in n_bad instead.
                as_text = F.col(c).cast("string")
                decoded = F.from_json(as_text, "array<bigint>")
                is_null_literal = F.trim(as_text) == "null"
                aggs.extend(
                    [
                        F.sum(F.col(c).isNotNull().cast("bigint")).alias(f"n_{c}"),
                        F.sum(
                            (
                                F.col(c).isNotNull()
                                & decoded.isNull()
                                & ~is_null_literal
                            ).cast("bigint")
                        ).alias(f"n_bad_{c}"),
                        F.coalesce(
                            F.sum(F.size(decoded)), F.lit(0)
                        ).alias(f"n_ids_{c}"),
                    ]
                )
            o = samples.agg(*aggs).first()
            member_notes = [f"txt {o['n_txt']}/{o['n_samples']}"]
            n_bad_total = 0
            for ext, c in id_members.items():
                if o[f"n_{c}"] == 0:
                    continue
                n_bad_total += o[f"n_bad_{c}"]
                member_notes.append(
                    f"{ext} {o[f'n_{c}']}/{o['n_samples']} "
                    f"({o[f'n_ids_{c}']} ids, {o[f'n_bad_{c}']} bad)"
                )
            print(
                f"read-tar {tar_dir}: {o['n_samples']} samples in "
                f"{o['n_shards']} shards; " + ", ".join(member_notes)
            )
            rc = 0
            if n_bad_total:
                print(
                    f"error: --read-tar: {n_bad_total} member(s) failed "
                    f"to decode as a JSON id array",
                    file=sys.stderr,
                )
                rc = 4
            card_path = _os.path.join(tar_dir, "_meta", "report.json")
            if _os.path.exists(card_path):
                with open(card_path) as f:
                    card = _json.load(f)
                card_n = card.get("n_docs")
                if card_n == o["n_samples"]:
                    print(f"card: n_docs {card_n} == samples OK")
                else:
                    print(
                        f"error: --read-tar: card n_docs {card_n} != "
                        f"{o['n_samples']} samples recovered from shards",
                        file=sys.stderr,
                    )
                    rc = 4
            else:
                print("card: _meta/report.json absent (check skipped)")
            sums_path = _os.path.join(tar_dir, "_meta", "checksums.json")
            if _os.path.exists(sums_path):
                # release integrity: re-hash every shard (distributed,
                # the writer's own scan shape) against the manifest —
                # catches truncation/bitrot/tampering without parsing
                # a single member (tars are byte-deterministic)
                with open(sums_path) as f:
                    want = _json.load(f).get("shards", {})
                got = {
                    r["shard"]: r["sha256"]
                    for r in session.spark.read.format("binaryFile")
                    .load(_os.path.join(tar_dir, "shard-*.tar"))
                    .select(
                        F.element_at(F.split("path", "/"), -1).alias("shard"),
                        F.sha2("content", 256).alias("sha256"),
                    )
                    .collect()
                }
                missing = sorted(set(want) - set(got))
                extra = sorted(set(got) - set(want))
                bad = sorted(
                    s for s in set(want) & set(got) if want[s] != got[s]
                )
                if missing or extra or bad:
                    print(
                        f"error: --read-tar: checksum manifest mismatch "
                        f"(missing={missing}, unexpected={extra}, "
                        f"corrupted={bad})",
                        file=sys.stderr,
                    )
                    rc = 4
                else:
                    print(f"checksums: {len(got)} shards sha256 OK")
            else:
                print("checksums: _meta/checksums.json absent (check skipped)")
            return rc
        if args.serve is not None:
            # serving path: the coordinator's Flight endpoint
            # (reference: crates/coordinator/src/main.rs:19-78)
            from igloo_spark.serving import IglooFlightServer

            server = IglooFlightServer(session, f"grpc://127.0.0.1:{args.serve}")
            print(f"igloo-spark Flight server listening on grpc://127.0.0.1:{server.port}", flush=True)
            server.serve()
            return 0
        if args.search is not None or args.vector_search is not None:
            import os as _os

            if not _os.path.isdir(args.index_root):
                print(
                    f"error: --index-root {args.index_root}: not a "
                    f"directory (no persisted index there)",
                    file=sys.stderr,
                )
                return 2
        try:
            if args.search is not None:
                from pyspark.sql import functions as F

                from igloo_spark.operators.retrieval import (
                    probe_postings_index,
                )

                terms = args.search.split()
                try:
                    df = probe_postings_index(
                        session.spark, args.index_root, terms, k=args.top_k
                    )
                except (FileNotFoundError, ValueError) as e:
                    print(f"error: --search: {e}", file=sys.stderr)
                    return 2
                if args.corpus_store is not None:
                    corpus = session.spark.table("corpus")
                    df = df.join(
                        corpus.select(
                            "doc_id",
                            F.substring("text", 1, 80).alias("preview"),
                        ),
                        "doc_id",
                        "left",
                    )
                df = df.orderBy("rank")
            elif args.vector_search is not None:
                from pyspark.sql import functions as F

                from igloo_spark.operators import similarity as _sim

                try:
                    emb = session.spark.table("embeddings")
                except Exception as e:
                    # --data-dir without embeddings.parquet: clean exit
                    # 2 (bad input), never an AnalysisException traceback
                    msg = str(e).strip().split("\n")[0]
                    print(
                        f"error: --vector-search: no 'embeddings' table "
                        f"in --data-dir ({msg})",
                        file=sys.stderr,
                    )
                    return 2
                queries = emb.filter(
                    F.col("vec_id") == args.vector_search
                ).select("vec_id", "embedding")
                if queries.limit(1).count() == 0:
                    print(
                        f"error: vec_id {args.vector_search} not in the "
                        f"embeddings table",
                        file=sys.stderr,
                    )
                    return 1
                probe = {
                    "ivf": lambda: _sim.probe_ivf_index(
                        session.spark, args.index_root, queries,
                        k=args.top_k, nprobe=args.nprobe,
                    ),
                    "pq": lambda: _sim.probe_pq_index(
                        session.spark, args.index_root, queries, k=args.top_k,
                    ),
                    "ivfpq": lambda: _sim.probe_ivfpq_index(
                        session.spark, args.index_root, queries,
                        k=args.top_k, nprobe=args.nprobe,
                    ),
                }[args.index_kind]
                try:
                    df = probe().orderBy("rank")
                except (FileNotFoundError, ValueError) as e:
                    print(f"error: --vector-search: {e}", file=sys.stderr)
                    return 2
            elif args.hybrid_search is not None:
                from pyspark.sql import functions as F

                from igloo_spark.operators import similarity as _sim
                from igloo_spark.operators.retrieval import (
                    probe_postings_index,
                    rrf_fuse,
                )

                try:
                    emb = session.spark.table("embeddings")
                except Exception as e:
                    msg = str(e).strip().split("\n")[0]
                    print(
                        f"error: --hybrid-search: no 'embeddings' table "
                        f"in --data-dir ({msg})",
                        file=sys.stderr,
                    )
                    return 2
                queries = emb.filter(
                    F.col("vec_id") == args.hybrid_vec
                ).select("vec_id", "embedding")
                if queries.limit(1).count() == 0:
                    print(
                        f"error: vec_id {args.hybrid_vec} not in the "
                        f"embeddings table",
                        file=sys.stderr,
                    )
                    return 1
                if args.corpus_store is not None:
                    # freshness gate BEFORE fusing: a stale index
                    # silently returns outdated fusions — check both
                    # retrievers against the store (O(1)-ish counts),
                    # warn by default, fail under --strict-sync; the
                    # repair is the existing --repair-index path
                    from igloo_spark.pipelines import check_index_sync

                    stale = []
                    for label, root, kind in (
                        ("postings", args.index_root, "postings"),
                        ("vector", args.vector_index, args.index_kind),
                    ):
                        s = check_index_sync(
                            session.spark,
                            _corpus_root(args.corpus_store), root, kind=kind,
                        )
                        if not s["in_sync"]:
                            stale.append(
                                f"{label} index {root}: "
                                f"{s['index_docs']} docs vs corpus "
                                f"{s['corpus_docs']}"
                            )
                    if stale:
                        sev = "error" if args.strict_sync else "warning"
                        for line in stale:
                            print(
                                f"{sev}: --hybrid-search: stale {line} "
                                f"(--repair-index to rebuild)",
                                file=sys.stderr,
                            )
                        if args.strict_sync:
                            return 4
                probe = {
                    "ivf": lambda: _sim.probe_ivf_index(
                        session.spark, args.vector_index, queries,
                        k=args.top_k, nprobe=args.nprobe,
                    ),
                    "pq": lambda: _sim.probe_pq_index(
                        session.spark, args.vector_index, queries,
                        k=args.top_k,
                    ),
                    "ivfpq": lambda: _sim.probe_ivfpq_index(
                        session.spark, args.vector_index, queries,
                        k=args.top_k, nprobe=args.nprobe,
                    ),
                }[args.index_kind]
                try:
                    bm = probe_postings_index(
                        session.spark, args.index_root,
                        args.hybrid_search.split(), k=args.top_k,
                    ).select("doc_id", "rank")
                    ann = probe().select(
                        F.col("neighbor_id").alias("doc_id"), "rank"
                    )
                except (FileNotFoundError, ValueError) as e:
                    print(f"error: --hybrid-search: {e}", file=sys.stderr)
                    return 2
                fused = rrf_fuse(
                    {"bm25": bm, "ann": ann}, "doc_id", k=args.top_k
                )
                order_col = "fused_rank"
                if args.diversify:
                    # search -> fuse -> DIVERSIFY: MMR over the fused
                    # top-k (relevance = the integer RRF nano-score,
                    # redundancy = micro-cosine to the picked set).
                    # The fused frame is checkpointed first — it is
                    # the k-row pool and feeds the embedding join,
                    # the id collect AND the final rank join, and its
                    # lineage embeds both index probes.
                    from igloo_spark.operators.retrieval import mmr_rerank

                    fused = fused.localCheckpoint(eager=False)
                    emb_side = None
                    if args.corpus_store is not None:
                        # prefer the store's own persisted embeddings
                        # (bloom-pruned point lookup, k ids)
                        from igloo_spark.sources.versioned import (
                            read_versioned,
                            read_versioned_at_keys,
                        )

                        croot = _corpus_root(args.corpus_store)
                        if "embedding" in read_versioned(
                            session.spark, croot
                        ).columns:
                            ids = [
                                r["doc_id"]
                                for r in fused.select("doc_id").collect()
                            ]
                            emb_side = read_versioned_at_keys(
                                session.spark, croot, "doc_id", ids
                            ).select("doc_id", "embedding")
                    if emb_side is None:
                        emb_side = emb.select(
                            F.col("vec_id").alias("doc_id"), "embedding"
                        )
                    pool = fused.select("doc_id", "rrf_nano").join(
                        emb_side, "doc_id"
                    )
                    picks = mmr_rerank(
                        pool, "doc_id", "embedding", "rrf_nano",
                        k=args.mmr_k or args.top_k,
                        lambda_milli=args.mmr_lambda,
                    )
                    fused = picks.join(
                        fused.select("doc_id", "fused_rank"), "doc_id"
                    )
                    order_col = "sel_rank"
                df = fused.orderBy(order_col)
                if args.fetch:
                    # the full serving loop: fused ids -> bloom-pruned
                    # point lookup of the documents (k ids, so the
                    # collect is k rows by construction)
                    from igloo_spark.sources.versioned import (
                        read_versioned_at_keys,
                    )

                    ids = [r["doc_id"] for r in df.collect()]
                    try:
                        docs = read_versioned_at_keys(
                            session.spark, _corpus_root(args.corpus_store),
                            "doc_id", ids, verify=args.verify_fetch,
                        ).select("doc_id", "text")
                    except ValueError as e:
                        print(f"error: --fetch: {e}", file=sys.stderr)
                        return 4
                    df = df.join(docs, "doc_id", "left").orderBy(order_col)
            elif args.fetch_docs is not None:
                from igloo_spark.sources.versioned import (
                    read_versioned_at_keys,
                )

                ids = [
                    int(x) for x in args.fetch_docs.split(",") if x.strip()
                ]
                try:
                    df = read_versioned_at_keys(
                        session.spark, _corpus_root(args.corpus_store),
                        "doc_id", ids, verify=args.verify_fetch,
                    )
                except ValueError as e:
                    print(f"error: --fetch-docs: {e}", file=sys.stderr)
                    return 4
            elif args.query is not None:
                from igloo_spark.queries import all_queries

                specs = all_queries()
                if args.query not in specs:
                    print(f"error: unknown query {args.query!r}; see --list-queries", file=sys.stderr)
                    return 1
                df = specs[args.query].spark(session.spark, args.data_dir)
                if args.explain:
                    import contextlib
                    import io

                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain(mode="formatted")
                    print(buf.getvalue())
            else:
                if args.explain:
                    print(session.explain(args.sql))
                df = session.execute(args.sql)
            if args.audit:
                from igloo_spark.plans import audit_report

                print(audit_report(df))
            if args.audit_runtime:
                from igloo_spark.plans import runtime_report

                print(runtime_report(df))
            if args.output:
                from igloo_spark import sinks

                writer = {"parquet": sinks.write_parquet, "csv": sinks.write_csv, "json": sinks.write_json}
                writer[args.output_format](df, args.output)
                print(f"wrote {args.output_format} to {args.output}")
            else:
                df.show(args.limit, truncate=False)
        except Exception as e:  # surface a clean one-line SQL error, not a traceback
            msg = str(e).strip().split("\n")[0]
            print(f"error: {msg}", file=sys.stderr)
            return 1
    return 0


def _parse_epochs(spec: str) -> dict[str, int]:
    """Parse ``--epochs books=3,web=1`` into {"books": 3, "web": 1}.
    Counts must be non-negative integers (0 drops the class)."""
    out: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(
                f"bad epoch spec {part!r} — expected CLASS=COUNT"
            )
        cls, _, count = part.partition("=")
        cls = cls.strip()
        try:
            k = int(count)
        except ValueError:
            raise ValueError(
                f"bad epoch count {count!r} for class {cls!r} — "
                f"expected a non-negative integer"
            ) from None
        if k < 0 or not cls:
            raise ValueError(
                f"bad epoch spec {part!r} — class must be non-empty "
                f"and count non-negative"
            )
        out[cls] = k
    if not out:
        raise ValueError("empty --epochs spec")
    return out


def _register_demo_tables(session) -> None:
    """The reference CLI's in-memory ``users`` demo table
    (``crates/igloo/src/main.rs:56-77``, rows from
    ``crates/engine/tests/integration_test.rs:27-29``)."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("name", StringType(), False),
            StructField("age", IntegerType(), False),
        ]
    )
    rows = [(1, "Alice", 25), (2, "Bob", 30), (3, "Charlie", 35), (4, "Diana", 28), (5, "Eve", 32)]
    session.register_table("users", session.spark.createDataFrame(rows, schema))


if __name__ == "__main__":
    sys.exit(main())
