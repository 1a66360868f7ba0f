"""polars_pipe_spark — a PySpark-native rebuild of the capabilities of
``second-ed/polars-pipe`` (config-driven data-engineering pipelines), plus
large-scale LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal columns, streaming).

Design (see SURVEY.md):
- DataFrame-first: every stage is ``Callable[[DataFrame, ...], DataFrame]``
  chained with ``DataFrame.transform`` — the Spark analogue of the
  reference's ``LazyFrame.pipe`` chain
  (reference: src/polars_pipe/services/basic_pipeline.py:30-77).
- Catalyst does all planning: no RDDs, no row-level Python UDFs in the core;
  Pandas UDFs only where built-ins cannot express the semantics.
- Declared engine semantics (differences from the reference are deliberate,
  documented per-module): xxhash64 row hashes, exact percentiles at test
  scale with approx variants for the 100 TB path, null-preserving clip,
  whitespace-strip parity via regexp.
"""

from polars_pipe_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
