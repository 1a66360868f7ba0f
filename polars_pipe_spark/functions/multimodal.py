"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata structs.

Schema convention (the part that matters at 100 TB):

    media: struct<
        payload: binary,          -- the raw bytes (or null if externalised)
        uri: string,              -- source locator when payload is offloaded
        mime: string,
        n_bytes: long,
        content_hash: string      -- md5 of payload, for exact dedup
    >

Decode / feature-extraction runs as Arrow-batched Pandas UDFs over
``mapInPandas`` — the real shape of a media pipeline stage (per-partition
batch iterator, bounded memory, no driver involvement). The actual codec
calls are STUBBED (image/audio libraries are not in this container):
``decode_image_stub`` raises ``NotImplementedError`` when asked for real
decoding, and offers a deterministic fake (seeded from the content hash)
so the plumbing — schema, batching, partitioning — is fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.BinaryType()),
        T.StructField("uri", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def pack_media(payload: Column, uri: Column, mime: Column) -> Column:
    """Build a media struct from raw bytes + locator + mime."""
    return F.struct(
        payload.alias("payload"),
        uri.alias("uri"),
        mime.alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
    )


def media_from_text_column(df: DataFrame, text_col: str, media_col: str = "media") -> DataFrame:
    """Testdata helper: fake a binary payload from a text column (UTF-8
    bytes), mime tagged by payload size class."""
    payload = F.encode(F.col(text_col), "UTF-8")
    mime = F.when(F.octet_length(payload) > 300, "image/png").otherwise("image/jpeg")
    return df.withColumn(media_col, pack_media(payload, F.lit(None).cast("string"), mime))


IMAGE_FEATURES_SCHEMA = (
    "doc_id long, content_hash string, n_bytes long, mime string, "
    "width int, height int, n_channels int, mean_luma double"
)


def extract_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Image decode + feature extraction over ``mapInPandas``.

    Arrow-batched; each batch decodes payload bytes and emits fixed-width
    features. ``use_fake_decoder=True`` derives deterministic fake
    dimensions from the content hash (plumbing test); ``False`` requires
    a real codec and raises ``NotImplementedError`` here.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf[media_col]
            hashes = media.map(lambda m: m["content_hash"])
            n_bytes = media.map(lambda m: m["n_bytes"])
            mimes = media.map(lambda m: m["mime"])
            if not use_fake_decoder:
                raise NotImplementedError(
                    "real image decoding needs an image codec library "
                    "(PIL/opencv) — not available in this environment; "
                    "pass use_fake_decoder=True for the deterministic stub"
                )
            seed = hashes.map(lambda h: int(h[:8], 16))
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content_hash": hashes,
                    "n_bytes": n_bytes,
                    "mime": mimes,
                    "width": (seed % 1920 + 1).astype("int32"),
                    "height": (seed // 1920 % 1080 + 1).astype("int32"),
                    "n_channels": (seed % 2 * 1 + 3).astype("int32"),
                    "mean_luma": ((seed % 256) / 255.0).astype("float64"),
                }
            )
            yield out

    return df.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_hash string"


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_n: int = 10,
    max_frames: int = 3,
) -> DataFrame:
    """Video frame sampling shape: one output row per sampled frame.
    Frame bytes are faked as hash-of-(content_hash, idx) — the row
    explosion + schema is the real part."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                h = r[media_col]["content_hash"]
                n = min(max_frames, max(1, int(r[media_col]["n_bytes"]) // every_n))
                for i in range(n):
                    rows.append(
                        (r[id_col], i, hashlib.md5(f"{h}:{i}".encode()).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_hash"])

    return df.mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)
