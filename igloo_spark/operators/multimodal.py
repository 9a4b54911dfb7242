"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Spark treats media as ``BinaryType`` columns with a metadata struct
(the lakehouse-standard layout: bytes + {mime, size, checksum}).
The *plumbing* here is real and tested — schema, Arrow batching,
``mapInPandas`` signature, partition sizing. The actual codec step is
STUBBED: image/audio libraries are not in this container, so
``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, which applies a deterministic fake decode
(size/leading-byte arithmetic) that the DuckDB oracle can reproduce.

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

    ``fake=False`` requires a real codec library (PIL etc.) — not
    present in this environment → NotImplementedError (clearly marked
    stub). ``fake=True`` runs the deterministic fake decoder through
    the identical Arrow/mapInPandas path, so the distributed plumbing
    is exercised for real.
    """
    if not fake:
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real media decode needs an image codec (PIL); not available "
                "in this environment — use fake=True for the deterministic stub"
            ) from e

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _fake_decode(batch)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)
