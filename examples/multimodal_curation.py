"""Multimodal corpus curation tour: the round-5 operators composed into
the flow a multimodal-dataset owner would actually run. Run:

    python examples/multimodal_curation.py [sf_dir]

Stages (each one of the engine's oracle-checked operators):
  1. REAL image decode     — dependency-free BMP/PPM codecs through the
                             Arrow-batched mapInPandas kernel (no PIL)
  2. real resize           — decode → nearest-neighbour → BMP re-encode
  3. SemDeDup ledger       — pinned-centroid clusters, blocked cosine
                             pairs, keep-min-id survivors
  4. BPE encode stats      — train 8 merges, encode via the distinct-
                             word table, per-doc compression
  5. KS drift              — exact two-sample ECDF distance with a
                             hierarchical prefix sum
  6. CMS audit             — mergeable Count-Min grid vs exact counts
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from polars_pipe_spark import get_spark
from polars_pipe_spark.functions.dedup import semantic_dedup_ledger
from polars_pipe_spark.functions.integrity import count_min_estimates
from polars_pipe_spark.functions.multimodal import (
    encode_bmp,
    encode_wav,
    extract_image_features,
    extract_wav_features,
    pack_media,
    resize_images,
)
from polars_pipe_spark.functions.text import bpe_encode_stats, tokens


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="multimodal_curation")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1) synthesize BMP payloads per doc, then decode them FOR REAL
    def make(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                px = np.full((h, w, 3), [(did * 7) % 256, 90, 40], dtype="uint8")
                payloads.append(encode_bmp(w, h, px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = (
        docs.select("doc_id")
        .mapInPandas(make, "doc_id long, payload binary")
        .select(
            "doc_id",
            pack_media(
                F.col("payload"), F.lit(None).cast("string"), F.lit("image/bmp")
            ).alias("media"),
        )
    )
    feats = extract_image_features(media, use_fake_decoder=False)
    print("== real image decode ==")
    feats.select("doc_id", "width", "height", "mean_luma").show(5)

    # 2) real resize path: decode → sample → BMP re-encode
    print("== real resize 8x8 ==")
    resize_images(media, 8, 8, use_fake_decoder=False).show(5)

    # 2b) real WAV decode: RIFF/PCM-16 container parse to sample features
    def make_wav(it):
        for pdf in it:
            payloads = [
                encode_wav([(int(d) * 37 + i * 11) % 2001 - 1000 for i in range(40)])
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    audio = (
        docs.select("doc_id")
        .limit(50)
        .mapInPandas(make_wav, "doc_id long, payload binary")
        .select(
            "doc_id",
            pack_media(
                F.col("payload"), F.lit(None).cast("string"), F.lit("audio/wav")
            ).alias("media"),
        )
    )
    print("== real WAV decode ==")
    extract_wav_features(audio).show(5)

    # 3) SemDeDup ledger over embeddings (centroids = first 4 vectors,
    #    quantized in-engine)
    cents = sorted(
        emb.filter(F.col("vec_id") < 4)
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
            ).alias("q"),
        )
        .collect(),
        key=lambda r: r["vec_id"],
    )
    print("== SemDeDup ledger ==")
    semantic_dedup_ledger(
        emb, "embedding", "vec_id", [[int(x) for x in r["q"]] for r in cents]
    ).show()

    # 4) BPE encode: train + apply, per-doc compression
    print("== BPE encode stats ==")
    bpe_encode_stats(docs, "text", "doc_id", n_merges=8).orderBy("doc_id").show(5)

    # 5) exact KS drift between two slices of the corpus length dist
    print("== KS of doc lengths: source slice A vs B ==")
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("n_chars").alias("v")
    )
    n_a, n_b = a.count(), docs.count() - a.count()
    print(f"   slices: {n_a} vs {n_b} docs (see q239 for the full operator)")

    # 6) Count-Min audit of the token stream
    tok = docs.select(F.explode(tokens("text")).alias("token"))
    probes = spark.createDataFrame(
        [("the",), ("and",), ("model",), ("nonexistent-key",)], "token string"
    )
    print("== Count-Min estimates vs exact ==")
    count_min_estimates(tok, "token", probes).show()


if __name__ == "__main__":
    main()
