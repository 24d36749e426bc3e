#!/usr/bin/env python
"""spark-submit entrypoint for the flagship parse->enrich->route->aggregate
pipeline (north_rule launch shape).

Cluster launch (N and 4N executors; the library ships via --py-files)::

    python -m vector_spark.package                       # builds dist/vector_spark.zip
    spark-submit --master <cluster> --py-files dist/vector_spark.zip \
        --num-executors 32  jobs/run_pipeline.py --sf 1.0 --out s3://.../run1
    spark-submit --master <cluster> --py-files dist/vector_spark.zip \
        --num-executors 128 jobs/run_pipeline.py --sf 1.0 --out s3://.../run2

Sandbox launch (local[N] stands in for N executors)::

    SPARK_GRAFT_CPUS=8  python jobs/run_pipeline.py --sf 0.1
    SPARK_GRAFT_CPUS=32 python jobs/run_pipeline.py --sf 0.1

Resumable: re-running with the same --run-id and --out skips sinks already
committed in the manifest (per-partition lineage + throughput metrics are
recorded there).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--mode", choices=["partitioned", "per_route"], default="partitioned")
    ap.add_argument("--source-format", choices=["parquet", "iceberg"], default="parquet",
                    help="iceberg: read the corpus through the jar-free Iceberg layer")
    ap.add_argument("--sink-format", choices=["parquet", "iceberg"], default="parquet",
                    help="iceberg: register per-route Iceberg sink tables over the write")
    ap.add_argument(
        "--master",
        default=None,
        help="'submit' to defer to spark-submit --master; default local[$SPARK_GRAFT_CPUS]",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from vector_spark.pipeline import run_pipeline
    from vector_spark.session import get_spark

    spark = get_spark(
        "vector_spark_pipeline",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")
    result = run_pipeline(
        spark, args.sf, out_dir=args.out, run_id=args.run_id, mode=args.mode,
        source_format=args.source_format, sink_format=args.sink_format,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
