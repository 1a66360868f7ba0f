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

    # Flatten struct fields (and derive the fake-decoder seed) JVM-side so
    # the Arrow batch carries flat columns — zero per-row Python dict
    # access inside the UDF. In fake mode the payload bytes are NOT
    # selected at all: a decode stub must not drag 100 TB of payload
    # through Arrow just to read metadata (column pruning reaches the
    # parquet scan).
    meta_cols = [
        F.col(id_col),
        F.col(f"{media_col}.content_hash").alias("content_hash"),
        F.col(f"{media_col}.n_bytes").alias("n_bytes"),
        F.col(f"{media_col}.mime").alias("mime"),
    ]
    if use_fake_decoder:
        seed = (
            F.conv(F.substring(F.col(f"{media_col}.content_hash"), 1, 8), 16, 10)
            .cast("long")
            .alias("__seed")
        )
        flat = df.select(*meta_cols, seed)
    else:
        flat = df.select(*meta_cols, F.col(f"{media_col}.payload").alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "real image decoding needs an image codec library "
                    "(PIL/opencv) — not available in this environment; "
                    "pass use_fake_decoder=True for the deterministic stub"
                )
            seed = pdf["__seed"].to_numpy()
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content_hash": pdf["content_hash"],
                    "n_bytes": pdf["n_bytes"],
                    "mime": pdf["mime"],
                    "width": (seed % 1920 + 1).astype("int32"),
                    "height": (seed // 1920 % 1080 + 1).astype("int32"),
                    "n_channels": (seed % 2 * 1 + 3).astype("int32"),
                    "mean_luma": ((seed % 256) / 255.0).astype("float64"),
                }
            )
            yield out

    return flat.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


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

    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.content_hash").alias("content_hash"),
        F.col(f"{media_col}.n_bytes").alias("n_bytes"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in it:
            # vectorised row explosion: per-row frame count n, then
            # np.repeat for ids/hashes and an arange-minus-offsets trick
            # for the within-row frame index — no iterrows
            n = np.minimum(
                max_frames, np.maximum(1, pdf["n_bytes"].to_numpy() // every_n)
            ).astype("int64")
            ids = np.repeat(pdf[id_col].to_numpy(), n)
            hashes = np.repeat(pdf["content_hash"].to_numpy(), n)
            idx = (np.arange(n.sum()) - np.repeat(np.cumsum(n) - n, n)).astype("int32")
            fh = [
                hashlib.md5(f"{h}:{i}".encode()).hexdigest()
                for h, i in zip(hashes, idx)
            ]  # md5 has no vector API; this comprehension is the floor
            yield pd.DataFrame({id_col: ids, "frame_idx": idx, "frame_hash": fh})

    return flat.mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, content_hash string, n_bytes long, "
    "n_windows int, rms_energy double, peak_byte int, zero_crossings long"
)


def extract_audio_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    window_bytes: int = 64,
    use_real_codec: bool = False,
) -> DataFrame:
    """Audio feature extraction over ``mapInPandas``: treats the payload
    as a raw PCM-ish byte stream and computes windowed energy statistics
    with pure numpy — unlike the image path, this one has NO stub: byte
    arithmetic needs no codec library, so the full payload→features path
    runs for real (the pattern for any byte-level featurizer: checksum,
    entropy, magic-byte sniffing). A real container format (wav/mp3)
    would need a decode step first — that seam is ``use_real_codec``,
    which raises here like the image stub.

    Scale: payload bytes DO flow through Arrow in this one (the features
    need them); keep upstream filters tight. All per-row work is numpy
    over a concatenated byte buffer — no per-row Python loop.
    """
    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.content_hash").alias("content_hash"),
        F.col(f"{media_col}.n_bytes").alias("n_bytes"),
        F.col(f"{media_col}.payload").alias("payload"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if use_real_codec:
                raise NotImplementedError(
                    "container decode (wav/mp3) needs an audio library — "
                    "not in this environment; raw-byte features run without it"
                )
            payloads = pdf["payload"]
            lens = payloads.str.len().fillna(0).astype("int64").to_numpy()
            buf = np.frombuffer(b"".join(payloads.fillna(b"")), dtype="uint8")
            starts = np.cumsum(lens) - lens
            # per-row reductions via np.add.reduceat over the flat buffer
            # (reduceat needs non-empty rows — guard zero-length payloads)
            safe = lens > 0
            sq = buf.astype("float64") ** 2
            sums = np.zeros(len(lens))
            peaks = np.zeros(len(lens), dtype="int64")
            zc = np.zeros(len(lens), dtype="int64")
            if safe.any():
                idx = starts[safe]
                sums[safe] = np.add.reduceat(sq, idx)[: safe.sum()] if len(idx) else 0
                # reduceat quirk: it reduces [idx[k], idx[k+1]) — with our
                # contiguous layout that IS each row's span
                peaks[safe] = np.maximum.reduceat(buf, idx)[: safe.sum()]
                diffs = np.diff((buf >= 128).astype("int8"))
                # don't count crossings across row boundaries (vectorised
                # boolean scatter, no per-row loop)
                boundary = np.zeros(max(len(buf) - 1, 0), dtype=bool)
                s_idx = starts[safe][1:]
                s_idx = s_idx[(s_idx > 0) & (s_idx <= len(boundary))]
                boundary[s_idx - 1] = True
                cross = (diffs != 0) & ~boundary
                cum = np.concatenate([[0], np.cumsum(cross)])
                ends = starts[safe] + lens[safe]
                zc[safe] = cum[np.minimum(ends - 1, len(cum) - 1)] - cum[starts[safe]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content_hash": pdf["content_hash"],
                    "n_bytes": pdf["n_bytes"],
                    "n_windows": np.maximum(1, lens // window_bytes).astype("int32"),
                    "rms_energy": np.sqrt(sums / np.maximum(lens, 1)),
                    "peak_byte": peaks.astype("int32"),
                    "zero_crossings": zc,
                }
            )

    return flat.mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, content_hash string, mime string, "
    "target_w int, target_h int, resized_hash string, resized_n_bytes long"
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    media_col: str = "media",
    id_col: str = "doc_id",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Image resize over ``mapInPandas`` — the transform-shaped multimodal
    stage (decode → resize → re-encode): output rows carry the target
    dimensions plus the resized payload's hash/size. ``use_fake_decoder``
    derives a deterministic fake resized payload (md5 of
    (content_hash, w, h), byte size scaled by target/1024² area ratio) so
    schema, batching, and downstream joins are fully testable; the real
    branch raises until a codec library exists — dropping one in changes
    ONLY the body of ``batches``, never the schema or the callers.
    """
    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.content_hash").alias("content_hash"),
        F.col(f"{media_col}.mime").alias("mime"),
        F.col(f"{media_col}.n_bytes").alias("n_bytes"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "real image resize needs a codec library (PIL/opencv) — "
                    "not available in this environment; "
                    "pass use_fake_decoder=True for the deterministic stub"
                )
            rh = [
                hashlib.md5(f"{h}:{target_w}x{target_h}".encode()).hexdigest()
                for h in pdf["content_hash"]
            ]
            scale = (target_w * target_h) / (1024.0 * 1024.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content_hash": pdf["content_hash"],
                    "mime": pdf["mime"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized_hash": rh,
                    "resized_n_bytes": (pdf["n_bytes"] * scale).astype("int64") + 1,
                }
            )

    return flat.mapInPandas(batches, schema=RESIZE_SCHEMA)
