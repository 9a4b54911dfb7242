"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Spark treats media as ``BinaryType`` columns with a metadata struct
(the lakehouse-standard layout: bytes + {mime, size, checksum}).
The *plumbing* here is real and tested — schema, Arrow batching,
``mapInPandas`` signature, partition sizing. Decoding is two-tier:

- ``decode_pixels`` is a REAL decoder for the uncompressed formats
  (PPM P6, PGM P5, 24-bit BMP) — pure numpy over the raw bytes, no codec
  library — emitting geometry + per-channel means through the same
  Arrow path (pixel math verified against numpy in tests).
- ``decode_wav`` is a REAL decoder for 16-bit PCM WAV (RIFF chunk
  walk + numpy sample math): rate/channels/duration + RMS amplitude.
- compressed formats (JPEG/PNG/mp3/video) need codec libraries not
  present in this container, so ``decode_media`` raises
  ``NotImplementedError`` unless ``fake=True``, which applies a
  deterministic fake decode (size/leading-byte arithmetic) that the
  DuckDB oracle can reproduce.

Scale notes: payloads dominate row width → keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so a
partition holds ~hundreds of images, and never groupBy the binary
column itself (hash the checksum instead). ``mapInPandas`` streams
Arrow batches (here capped via arrow.maxRecordsPerBatch) so a batch
of decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "doc_id bigint, mime string, byte_size bigint, width bigint, height bigint, n_pixels bigint"
RESIZED_SCHEMA = DECODED_SCHEMA + ", out_w bigint, out_h bigint, scale double"
FRAMES_SCHEMA = "doc_id bigint, n_frames bigint, frame_idx bigint, frame_ts double"
FEATURES_SCHEMA = "doc_id bigint, features array<double>"
FEATURE_DIM = 8
FRAME_BYTES = 16  # fake codec: one "frame" per 16 payload bytes
FPS = 30.0


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize an opaque binary payload column + metadata struct
    from a text column (stand-in for real image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        F.length(payload).cast("bigint").alias("byte_size"),
        F.md5(F.col(text_col)).alias("checksum"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("media_meta"))


def from_binary_files(files_df: DataFrame, mime: str = "application/octet-stream") -> DataFrame:
    """Adapt a ``binaryFile``-source frame (path, modificationTime,
    length, content) to the multimodal layout (doc_id, payload,
    media_meta) so the decode/frames/features operators run unchanged
    on real files from disk/object storage. doc_id is a stable 63-bit
    hash of the path (deterministic across clusters)."""
    doc_id = F.abs(F.xxhash64(F.col("path")))
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.col("length").cast("bigint").alias("byte_size"),
        F.md5(F.col("content")).alias("checksum"),
    )
    return files_df.select(
        doc_id.alias("doc_id"),
        F.col("content").alias("payload"),
        meta.alias("media_meta"),
    )


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake codec: dimensions derived from payload bytes.

    Stands in for PIL/libav decode; arithmetic is chosen to be
    reproducible in SQL for the correctness oracle.
    """
    sizes = batch["payload"].map(len)
    first = batch["payload"].map(lambda b: b[0] if len(b) else 0)
    width = (sizes % 640) + 1
    height = first.astype("int64") + 1
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "mime": batch["media_meta"].map(lambda m: m["mime"]),
            "byte_size": sizes.astype("int64"),
            "width": width.astype("int64"),
            "height": height.astype("int64"),
            "n_pixels": (width * height).astype("int64"),
        }
    )


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads to typed features via mapInPandas.

    ``fake=False`` is a REAL decode: uncompressed formats (PPM P6,
    PGM P5, 24-bit BMP) parse via the module's pure-numpy parsers —
    no codec library, works in this sandbox end-to-end; compressed
    formats (JPEG/PNG/...) need a codec and fall through to PIL when
    installed, else raise ``NotImplementedError`` per payload (the
    documented environment gate, now scoped to exactly the formats
    that need it). ``fake=True`` runs the deterministic fake decoder
    through the identical Arrow/mapInPandas path, so the distributed
    plumbing is exercised for real and the DuckDB oracle can
    reproduce the arithmetic.
    """
    if not fake:

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                yield _real_decode(batch)

        return df.mapInPandas(run_real, schema=DECODED_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _fake_decode(batch)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def _real_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-payload real decode: uncompressed formats via the
    pure-numpy parsers, compressed formats via PIL when present."""
    import io

    try:
        from PIL import Image
    except ImportError:
        Image = None
    rows = []
    for doc_id, payload, meta in zip(
        batch["doc_id"], batch["payload"], batch["media_meta"]
    ):
        buf = bytes(payload)
        if buf.startswith((b"P6", b"P5")):
            w, h, _ = _parse_ppm(buf)
        elif buf.startswith(b"BM"):
            w, h, _ = _parse_bmp(buf)
        elif Image is not None:
            with Image.open(io.BytesIO(buf)) as im:
                w, h = int(im.width), int(im.height)
        else:
            raise NotImplementedError(
                f"doc {doc_id}: compressed/unknown media format needs a "
                f"codec library (PIL); not available in this environment "
                f"— uncompressed PPM/PGM/BMP decode natively, or use "
                f"fake=True for the deterministic stub"
            )
        rows.append((doc_id, meta["mime"], len(buf), w, h, w * h))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "mime", "byte_size", "width", "height", "n_pixels"],
    )


def _pil_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Real codec decode (PIL) through the identical Arrow batch
    shape as the fake path. Only runs where PIL is installed — this
    container ships no codec, so the function is exercised by the
    ``pytest.importorskip('PIL')``-gated tests that activate
    automatically the moment an image refresh adds the library
    (same pattern as the jar-gated Avro/Iceberg sources)."""
    import io

    from PIL import Image

    widths, heights = [], []
    for payload in batch["payload"]:
        with Image.open(io.BytesIO(payload)) as im:
            widths.append(int(im.width))
            heights.append(int(im.height))
    w = pd.Series(widths, index=batch.index, dtype="int64")
    h = pd.Series(heights, index=batch.index, dtype="int64")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "mime": batch["media_meta"].map(lambda m: m["mime"]),
            "byte_size": batch["payload"].map(len).astype("int64"),
            "width": w,
            "height": h,
            "n_pixels": (w * h).astype("int64"),
        }
    )


def resize_media(decoded: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Aspect-preserving resize (1→1 batch shape). Real path would call
    the codec's scaler; the deterministic stand-in computes the output
    geometry only — which is exactly what the *plumbing* needs to carry
    (the resized bytes would ride a binary column, never a groupBy key).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            scale = pd.concat(
                [target_w / b["width"], target_h / b["height"]], axis=1
            ).min(axis=1)
            out = b.copy()
            out["out_w"] = (b["width"] * scale).astype("int64")
            out["out_h"] = (b["height"] * scale).astype("int64")
            out["scale"] = scale
            yield out

    return decoded.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling (1→many batch shape): treat the payload as a
    video of ``byte_size // FRAME_BYTES + 1`` frames and keep every
    ``every_n``-th frame. mapInPandas lets one input row emit many
    output rows without an explode + re-shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            sizes = b["payload"].map(len).astype("int64")
            n_frames = sizes // FRAME_BYTES + 1
            rows = {"doc_id": [], "n_frames": [], "frame_idx": []}
            for doc_id, nf in zip(b["doc_id"], n_frames):
                for idx in range(0, int(nf), every_n):
                    rows["doc_id"].append(doc_id)
                    rows["n_frames"].append(nf)
                    rows["frame_idx"].append(idx)
            out = pd.DataFrame(rows, dtype="int64")
            out["frame_ts"] = out["frame_idx"] / FPS
            yield out

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction (1→vector batch shape): payload → fixed-dim
    ``array<double>``, the hand-off point into the embedding/ANN path
    (x46/x47/x55). Deterministic integer arithmetic stands in for a
    real encoder so the oracle reproduces it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            sizes = b["payload"].map(len).astype("int64")
            first = b["payload"].map(lambda x: x[0] if len(x) else 0).astype("int64")
            feats = [
                [float(((int(s) * (j + 1) + int(f)) % 1000) / 1000.0) for j in range(dim)]
                for s, f in zip(sizes, first)
            ]
            yield pd.DataFrame({"doc_id": b["doc_id"], "features": feats})

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


DECODED_PIXELS_SCHEMA = (
    "doc_id bigint, mime string, width bigint, height bigint, "
    "n_pixels bigint, mean_r double, mean_g double, mean_b double"
)


def _parse_ppm(buf: bytes):
    """Binary PNM: 'P6' (RGB triplets) or 'P5' (grayscale, PGM) —
    ASCII header '<magic> <w> <h> <maxval>' with comment support, then
    raw samples. Grayscale expands to 3 identical channels so every
    caller sees (h, w, 3). Pure numpy — no codec library."""
    import numpy as np

    if not (buf.startswith(b"P6") or buf.startswith(b"P5")):
        raise ValueError("not a binary PNM (P5/P6)")
    channels = 3 if buf.startswith(b"P6") else 1
    # tokenize the header: three ints after the magic, skipping
    # whitespace and '#' comments
    vals, i = [], 2
    while len(vals) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        vals.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        # maxval > 255 means 2-byte samples; reading them as uint8
        # would silently produce corrupt pixels
        raise ValueError(f"only 8-bit PNM supported (maxval={maxval})")
    px = np.frombuffer(buf, dtype=np.uint8, count=w * h * channels, offset=i)
    img = px.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return w, h, img


def _parse_bmp(buf: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): little-endian
    header fields, 4-byte-aligned bottom-up BGR rows. Pure numpy."""
    import struct

    import numpy as np

    if not buf.startswith(b"BM"):
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    comp = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flipped = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if flipped:
        img = img[::-1]
    return w, h, img


def decode_pixels(df: DataFrame) -> DataFrame:
    """REAL image decode for the uncompressed formats (PPM P6, PGM P5,
    24-bit BMP) — no codec library involved, just numpy over the raw bytes —
    through the identical Arrow-batched ``mapInPandas`` plumbing the
    fake codec uses. Emits geometry plus per-channel means (the
    standard cheap image-quality features). Compressed formats (JPEG/
    PNG/...) still require a codec and stay behind ``decode_media``'s
    documented gate.

    Scale shape: one narrow Python stage over the payload column;
    payload bytes never become a join/group key, and per-batch memory
    is payload-bounded by arrow.maxRecordsPerBatch exactly like the
    fake path."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, payload, meta in zip(
                batch["doc_id"], batch["payload"], batch["media_meta"]
            ):
                buf = bytes(payload)
                if buf.startswith(b"P6") or buf.startswith(b"P5"):
                    w, h, img = _parse_ppm(buf)
                elif buf.startswith(b"BM"):
                    w, h, img = _parse_bmp(buf)
                else:
                    raise ValueError(f"doc {doc_id}: unsupported format")
                means = img.reshape(-1, 3).mean(axis=0) if w * h else np.zeros(3)
                out.append(
                    (doc_id, meta["mime"], w, h, w * h,
                     round(float(means[0]), 4), round(float(means[1]), 4),
                     round(float(means[2]), 4))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "mime", "width", "height", "n_pixels",
                         "mean_r", "mean_g", "mean_b"],
            )

    return df.mapInPandas(run, schema=DECODED_PIXELS_SCHEMA)


DECODED_AUDIO_SCHEMA = (
    "doc_id bigint, mime string, sample_rate bigint, channels bigint, "
    "n_samples bigint, duration_s double, rms double"
)


def _parse_wav(buf: bytes):
    """RIFF/WAVE with 16-bit PCM: walk the chunk list to the fmt and
    data chunks (ignoring LIST/fact/etc.), decode samples with numpy.
    Pure stdlib struct + numpy — no audio library."""
    import struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, sample_rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only 16-bit PCM WAV supported")
    if channels == 0 or sample_rate == 0:
        raise ValueError("invalid fmt chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
    n_frames = len(samples) // channels
    return sample_rate, channels, n_frames, samples


def decode_wav(df: DataFrame) -> DataFrame:
    """REAL audio decode for 16-bit PCM WAV — RIFF chunk walk + numpy
    sample math, no codec library — emitting rate/geometry/duration
    and RMS amplitude (the cheap audio-quality gate: silence and
    clipped files fall out of the RMS distribution). Same Arrow-
    batched ``mapInPandas`` tier as :func:`decode_pixels`; compressed
    audio (mp3/ogg/...) stays behind the documented codec gate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            out = []
            for doc_id, payload, meta in zip(
                batch["doc_id"], batch["payload"], batch["media_meta"]
            ):
                rate, ch, n, samples = _parse_wav(bytes(payload))
                rms = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
                out.append(
                    (doc_id, meta["mime"], rate, ch, n,
                     round(n / rate, 6) if rate else 0.0, round(rms, 4))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "mime", "sample_rate", "channels",
                         "n_samples", "duration_s", "rms"],
            )

    return df.mapInPandas(run, schema=DECODED_AUDIO_SCHEMA)


NPY_SCHEMA = "src_file string, row_idx bigint, embedding array<float>"


def read_npy_embeddings(spark, path: str) -> DataFrame:
    """Ingest NumPy ``.npy`` matrix files as embedding rows —
    (src_file, row_idx, embedding: array<float>) — the format
    embedding dumps actually arrive in before they become a parquet
    column. One output row per matrix row; 1-D files read as a single
    vector.

    Plumbing: the binaryFile source streams whole files (so a file's
    matrix is parsed exactly once, on one executor), and the parse is
    ``np.load(allow_pickle=False)`` over an in-memory buffer — numpy
    is the codec here, no external library, and pickle execution is
    disabled so a hostile file cannot run code. Files are independent
    ⇒ parallelism = file count; shard big dumps into many .npy files
    (the standard layout) and the read scales linearly.
    """
    import io

    import numpy as np

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.npy")
        .load(path)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"src_file": [], "row_idx": [], "embedding": []}
            for pth, content in zip(b["path"], b["content"]):
                arr = np.load(io.BytesIO(bytes(content)), allow_pickle=False)
                if arr.ndim == 1:
                    arr = arr[None, :]
                if arr.ndim != 2:
                    raise ValueError(f"{pth}: expected 1-D or 2-D array, got {arr.ndim}-D")
                for i, v in enumerate(arr):
                    out["src_file"].append(pth)
                    out["row_idx"].append(i)
                    out["embedding"].append(v.astype("float32"))
            yield pd.DataFrame(out)

    return files.mapInPandas(run, schema=NPY_SCHEMA)
