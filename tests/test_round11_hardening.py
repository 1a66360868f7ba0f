"""Round-11 hardening: the four r10 ADVICE items + the `_t_par` probe
cheapening (r10 verdict task 5).

- `_stack_vectors`: ragged or null vector columns used to pass the
  single-row dim probe (`_rows_dim` / `_corpus_fits_closure`) and then
  die inside ``np.stack`` with an opaque shape error; the dense-vector
  contract is now raised as a named ValueError at the materialization
  site.
- decode_wav's unsupported-format diagnostic now lists G.711 u-law/
  A-law (fmt 7/6), which the decoder has supported since r10.
- fuzzy_join documents its call-time guard jobs + the
  localCheckpoint lineage-truncation tradeoff (the brute_force_topk
  'Eagerness note' pattern).
- q283 no longer threads a dead 'law' column through the mapInPandas
  schema (it is a pure function of doc_id, re-derived in the final
  select).
- `_t_par`'s under-parallelism gate uses file-split arithmetic over
  ``inputFiles()`` instead of ``df.rdd.getNumPartitions()`` (which
  built the Java RDD graph for every table read).
"""

from __future__ import annotations

import pytest

from polars_pipe_spark.functions import similarity as sim


class TestStackVectorsContract:
    def test_ragged_raises_named_error(self):
        with pytest.raises(ValueError, match="ragged vector widths"):
            sim._stack_vectors([[1.0, 2.0], [1.0, 2.0, 3.0]], "cv")

    def test_null_raises_named_error(self):
        with pytest.raises(ValueError, match="null vector"):
            sim._stack_vectors([[1.0, 2.0], None], "cv")

    def test_uniform_stacks_float64(self):
        import numpy as np

        m = sim._stack_vectors([[1, 2], [3, 4]], "cv")
        assert m.dtype == np.float64 and m.shape == (2, 2)

    def test_gemm_path_ragged_corpus_is_diagnosable(self, spark):
        """A ragged corpus passes the rows×dim×8 byte budget (dim probed
        from ONE row) — the failure must be the named contract error,
        not np.stack's 'all input arrays must have the same shape'."""
        corpus = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        q = spark.createDataFrame(
            [(10, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        # max_collected_queries=0 forces the corpus-closure GEMM path,
        # whose driver-side collect materializes ALL corpus rows at once
        # (the small-query path streams per-batch, where a ragged corpus
        # can hide across batches — validated there too, best-effort)
        with pytest.raises(ValueError, match="ragged vector widths"):
            sim.brute_force_topk(
                corpus, q, vec_col="embedding", id_col="vec_id",
                query_id_col="vec_id", k=2, max_collected_queries=0,
            )


class TestWavDiagnosticListsG711:
    def test_unsupported_tag_message(self):
        from polars_pipe_spark.functions.multimodal import decode_wav, encode_wav

        wav = bytearray(encode_wav(b"\x00\x01" * 40, sample_rate=8000))
        # format tag lives at offset 20 in the canonical fmt chunk
        wav[20:22] = (85).to_bytes(2, "little")  # 0x55 = MPEG Layer 3
        with pytest.raises(NotImplementedError) as ei:
            decode_wav(bytes(wav))
        msg = str(ei.value)
        assert "G.711 u-law/A-law (fmt 7/6)" in msg
        assert "tag=85" in msg


class TestFuzzyJoinEagernessDocumented:
    def test_docstring_names_the_tradeoff(self):
        from polars_pipe_spark.operators.joins import fuzzy_join

        doc = fuzzy_join.__doc__
        assert "Eagerness note" in doc
        assert "localCheckpoint" in doc


class TestQ283SchemaHasNoDeadColumn:
    def test_law_not_in_mapinpandas_schema(self):
        import inspect

        import __spark_entry__ as entry

        src = inspect.getsource(entry._q283_g711_decode)
        assert "doc_id long, payload binary, law string" not in src
        # the output still carries law, derived from doc_id
        assert '"law"' in src or "'law'" in src


class TestTParProbe:
    def test_no_rdd_probe_in_entry(self):
        import ast
        import inspect
        import textwrap

        import __spark_entry__ as entry

        for fn in (entry._t_par, entry._estimated_scan_splits):
            tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
            rdd_attrs = [
                n for n in ast.walk(tree)
                if isinstance(n, ast.Attribute) and n.attr == "rdd"
            ]
            assert not rdd_attrs, f"{fn.__name__} still touches .rdd"

    def test_small_table_still_repartitions(self, spark):
        import __spark_entry__ as entry

        df = entry._t_par(spark, "/root/testdata/sf0.001", "nation")
        par = spark.sparkContext.defaultParallelism
        # the gate must classify a one-file 25-row table as
        # under-parallel and round-robin it to full parallelism
        assert df.rdd.getNumPartitions() == par

    def test_estimate_matches_gate_semantics(self, spark):
        import __spark_entry__ as entry

        df = entry._t(spark, "/root/testdata/sf0.001", "lineitem")
        est = entry._estimated_scan_splits(spark, df)
        par = spark.sparkContext.defaultParallelism
        assert 1 <= est < par  # tiny file: both old and new gates fire

    def test_estimate_zero_on_unreadable_files(self, spark):
        import __spark_entry__ as entry

        df = spark.range(4)  # no input files at all
        assert entry._estimated_scan_splits(spark, df) == 0
