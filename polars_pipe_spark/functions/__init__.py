"""LLM-data-pipeline function library (the beyond-the-reference surface):

- ``text``: tokenisation, quality scoring, language-ID, fingerprinting,
  PII scrubbing, repetition (Gopher-style) signals — pure expressions.
- ``dedup``: exact, MinHash+LSH, SimHash, connected-component clusters,
  embedding near-dup — banded/bucketed joins, never all-pairs.
- ``similarity``: brute-force / LSH / IVF / int8-quantized top-k.
- ``retrieval``: batch BM25 scoring and two-stage feature rerank.
- ``sampling``: content-hash deterministic sampling, train/test split,
  source mixing, context-window packing.
- ``multimodal``: binary media columns + Arrow-batched decode stubs.
- ``integrity``: table checksums, split-leakage and referential audits.
"""

from polars_pipe_spark.functions import (
    dedup,
    integrity,
    multimodal,
    retrieval,
    sampling,
    similarity,
    text,
)

__all__ = ["dedup", "integrity", "multimodal", "retrieval", "sampling", "similarity", "text"]
