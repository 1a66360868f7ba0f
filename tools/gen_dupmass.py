#!/usr/bin/env python
"""Generate the DUP-MASS sf1 fixture (r12 review finding 4).

The plain gen_testdata sf1 corpus has essentially zero near-dup mass —
at sf1 the minhash family's pair queries return 0 rows, so the sf1
oracle rung was vacuous for exactly the DROP-class caps it exists to
check, and the band cap (1000) could never bind on it. This script
derives ``<out>/documents.parquet`` from an existing sf1 fixture by
appending, with doc_ids >= 1_000_000 (far above the base range):

- an IDENTICAL boilerplate cluster of ``n_boiler`` copies (default
  1500 > the production band cap of 1000): every one of its minhash
  band buckets saturates, so the capped candidate path DROPS them —
  the first fixture where ``_cap_band_buckets`` binds at rung scale —
  while exact-dedup still groups them;
- ``n_clusters`` near-dup clusters of ``cluster_size`` docs each: a
  base sentence with per-member small edits, engineered to share LSH
  bands and pass jaccard >= 0.2 (nonzero verified pair mass).

Every other table is hard-linked/copied from the base fixture so the
directory is a complete SF_DIR for tools/check_oracle.py:

    python tools/gen_dupmass.py /tmp/pps_scale/sf1 /tmp/pps_scale/sf1dup
    SF_DIR=/tmp/pps_scale/sf1dup python tools/check_oracle.py \
        --json CORRECTNESS_SF1DUP_r12.json q25_minhash_neardup ...

Deterministic (no RNG): edits are index-derived.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BOILER = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied "
    "warranties of merchantability and fitness for a particular purpose"
)

# 12-word base sentences; each cluster member drops ONE word by index,
# so consecutive members share most 3-shingles (jaccard ~0.6-0.8) and
# nearly always at least one full LSH band.
CLUSTER_BASES = [
    "the quick brown fox jumps over the lazy dog near the riverbank",
    "data pipelines shuffle partition and aggregate records across many executor nodes",
    "language models learn token distributions from large deduplicated web text corpora",
    "spark catalyst optimizes logical plans into efficient physical execution stages automatically",
]


def build_documents(base_path: str, n_boiler: int, cluster_size: int) -> pa.Table:
    base = pq.read_table(base_path)
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []

    def add(i: int, text: str) -> None:
        doc_ids.append(1_000_000 + i)
        texts.append(text)
        langs.append("en")
        sources.append(f"dupsrc{i % 4}")
        n_chars.append(len(text))

    i = 0
    for _ in range(n_boiler):
        add(i, BOILER)
        i += 1
    for base_sent in CLUSTER_BASES:
        words = base_sent.split()
        for k in range(cluster_size):
            kept = [w for j, w in enumerate(words) if j != (k % len(words))]
            add(i, " ".join(kept))
            i += 1

    extra = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    return pa.concat_tables([base.select(extra.column_names), extra])


def main() -> int:
    if len(sys.argv) != 3:
        sys.stderr.write("usage: gen_dupmass.py BASE_SF_DIR OUT_DIR\n")
        return 2
    base_dir, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t == "documents":
            pq.write_table(build_documents(src, 1500, 12), dst)
        elif not os.path.exists(dst):
            try:
                os.link(src, dst)
            except OSError:
                shutil.copyfile(src, dst)
    n = pq.read_table(os.path.join(out_dir, "documents.parquet")).num_rows
    print(f"wrote {out_dir}/documents.parquet ({n} rows: base + 1500 "
          f"identical + {len(CLUSTER_BASES)}x12 near-dup)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
