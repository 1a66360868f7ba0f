"""End-to-end LLM training-corpus preparation, composed from the
library surface — the "what a reference user would actually run"
example. Run:

    python examples/llm_corpus_prep.py [sf_dir]

Stages (each is one of the engine's oracle-checked operators):
  1. quality gate       — logistic classifier + Gopher-style reject rules
  2. exact dedup        — fingerprint groups, keep canonical doc
  3. near-dup removal   — MinHash LSH pairs -> connected clusters -> keep rep
  4. span-level scrub   — remove duplicated 20-token spans, reassemble
  5. decontamination    — drop docs sharing 8-gram spans with a benchmark set
  6. deterministic split+ mixture reweighting — md5-content buckets
  7. pack               — greedy token bins for context-window packing
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_pipe_spark import get_spark
from polars_pipe_spark.functions.dedup import (
    dedup_clusters,
    exact_dedup,
    minhash_near_dups,
    ngram_contamination,
    span_dedup,
)
from polars_pipe_spark.functions.sampling import pack_sequences, train_test_split
from polars_pipe_spark.functions.text import quality_classifier, token_count


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="llm_corpus_prep")
    from polars_pipe_spark.sources import read_parquet_table

    docs = read_parquet_table(spark, f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality gate: classifier verdict (prob + hard reject rules)
    kept = docs.filter(quality_classifier("text", threshold=0.3)["verdict"] == "keep")

    # 2. exact dedup (content fingerprint, keep min doc_id)
    kept = exact_dedup(kept, "text", "doc_id")

    # 3. near-dup clusters -> keep one representative per cluster
    pairs = minhash_near_dups(kept, "text", "doc_id", threshold=0.6)
    clusters = dedup_clusters(pairs, "id_a", "id_b")
    drop = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    kept = kept.join(drop, "doc_id", "left_anti")

    # 4. span-level scrub: drop repeated 20-token spans corpus-wide,
    #    keep the reassembled text of each survivor
    spans = span_dedup(kept, "text", "doc_id", span_tokens=20)
    kept = (
        kept.join(spans.select("doc_id", "cleaned_text"), "doc_id")
        .drop("text")
        .withColumnRenamed("cleaned_text", "text")
    )

    # 5. decontamination against a held-out "benchmark" slice
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    contaminated = ngram_contamination(
        kept, bench, "text", "doc_id", k=8, min_overlap=3
    ).select(F.col("train_id").alias("doc_id")).distinct()
    kept = kept.join(contaminated, "doc_id", "left_anti")

    # 6. split + tokens
    prepped = train_test_split(kept, "doc_id", test_fraction=0.05).withColumn(
        "n_tok", token_count("text")
    )

    # 7. pack the train split into 512-token bins per source
    train = prepped.filter(F.col("split") == "train")
    packed = pack_sequences(train, "n_tok", "doc_id", bin_tokens=512, part_col="source")

    n_kept = prepped.count()
    n_bins = packed.select("source", "bin_id").distinct().count()
    print(
        f"docs in: {n0}  surviving: {n_kept}  "
        f"train bins: {n_bins}  "
        f"(dropped {n0 - n_kept} by quality/dup/contamination)"
    )


if __name__ == "__main__":
    main(*sys.argv[1:2])
