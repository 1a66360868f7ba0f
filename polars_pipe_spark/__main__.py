"""CLI: run a config-driven pipeline from a YAML file.

    python -m polars_pipe_spark path/to/config.yaml
    python -m polars_pipe_spark path/to/config.yaml --master local[8]

The YAML holds the same dict `services.run_pipeline` accepts (the
reference's config surface; reference has an empty __main__ — this CLI is
the natural service entry for a standalone engine).
"""

from __future__ import annotations

import argparse
import sys

import yaml

from polars_pipe_spark.adapters.io import IOWrapper
from polars_pipe_spark.services import run_pipeline
from polars_pipe_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="polars_pipe_spark")
    parser.add_argument("config", help="YAML pipeline config path")
    parser.add_argument("--master", default=None, help="Spark master override")
    parser.add_argument(
        "--shuffle-partitions", type=int, default=None, help="shuffle partition override"
    )
    args = parser.parse_args(argv)

    with open(args.config) as fh:
        config = yaml.safe_load(fh)

    spark = get_spark(
        app_name=f"polars_pipe_spark:{config.get('process_name', 'run')}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    parsed = run_pipeline(IOWrapper(spark), config)
    print(f"run {parsed.guid} complete -> {parsed.dst_root}/{parsed.guid}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
