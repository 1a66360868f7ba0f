"""Sparse lexical retrieval over a document table.

BM25 the Spark-native way: the corpus-side statistics (document
frequency, document length, corpus size / average length) are plain
aggregations; the query side is a handful of terms, so every join that
touches per-term metadata broadcasts. The only shuffles that scale with
the corpus are the tokenize→explode term-frequency aggregation and the
per-document score reduction — both keyed on doc id, both map-side
combinable.

Determinism policy (oracle parity): each per-term partial score is
rounded to 6 decimals and summed as DECIMAL, so the per-document total
is independent of partitioning/addition order and matches DuckDB's SQL
evaluation exactly. (Raw double accumulation would be order-dependent.)

No reference implementation (`/root/reference` has no retrieval surface);
this is part of the LLM-data-pipeline extension alongside
``functions/text.py`` tokenisation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_pipe_spark.functions.text import token_count, tokens


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    idf uses the Lucene-style non-negative form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Scale notes: the explode is filtered to the query's terms before any
    aggregation, so the shuffled volume is ``O(matching tokens)``, not
    corpus size; df/avgdl/N are one aggregate each, broadcast to the
    scorers; the final top-k plans as TakeOrderedAndProject.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term").isin(list(query_terms)))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = docs.select(F.col(id_col), token_count(text_col).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    term_score = F.round(idf * norm, 6).cast("decimal(14,6)")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy(id_col)
        # DECIMAL out, not double: decimal cells hash identically under
        # any canonicaliser (the q13 lesson), and the sum of scale-6
        # decimals is already exact.
        .agg(F.sum(term_score).cast("decimal(18,6)").alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), id_col).limit(k)
