#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: throughput efficiency >=0.8 from
N to 4N executors).

A real multi-executor cluster is unavailable in this sandbox, so the same
headline job (parse -> enrich -> route -> aggregate over the tokenized-log
corpus) runs at two parallelism levels — local[8] and local[32] — in
separate JVMs on the same input, mirroring a spark-submit at N and 4N
executors.  Throughput at both levels plus the scaling efficiency
( (rows/s @32) / (rows/s @8) / 4 ) are appended to BENCH.md.

Input splits are forced fine-grained (spark.sql.files.maxPartitionBytes)
so the 32-thread run is not starved by row-group granularity — on a real
cluster the 10^12-row table has millions of files and this is moot.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
SF = float(os.environ.get("SPARK_GRAFT_SCALING_SF", "0.1"))
RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from vector_spark.session import get_spark
from vector_spark import pipeline as P

cpus = int(sys.argv[1]); sf = float(sys.argv[2]); runs = int(sys.argv[3])
spark = get_spark(f"scaling_{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)}})
spark.sparkContext.setLogLevel("ERROR")
src = P.load_corpus(spark, sf)
src.count()  # warm page cache + JVM
best = float("inf"); rows = 0
for _ in range(runs):
    t0 = time.time()
    routed = P.route_stage(P.parsed_enriched(spark, src))
    agg = P.sink_aggregates(routed).collect()
    dt = time.time() - t0
    rows = sum(r["n_rows"] for r in agg)
    best = min(best, dt)
print(json.dumps({{"cpus": cpus, "sec": best, "rows": rows,
                   "rows_per_sec": rows / best}}))
"""


def run_level(cpus: int) -> dict:
    code = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(SF), str(RUNS)],
        capture_output=True, text=True, timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo = run_level(8)
    hi = run_level(32)
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / 4.0
    result = {"sf": SF, "n8": lo, "n32": hi, "scaling_efficiency_8_to_32": round(eff, 3)}
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run (sf={SF}, best of {RUNS})\n\n"
            f"| cores | wall sec | routed rows | rows/sec |\n|---|---|---|---|\n"
            f"| local[8] (N) | {lo['sec']:.2f} | {lo['rows']} | {lo['rows_per_sec']:.0f} |\n"
            f"| local[32] (4N) | {hi['sec']:.2f} | {hi['rows']} | {hi['rows_per_sec']:.0f} |\n\n"
            f"Scaling efficiency N->4N: **{eff:.2f}** "
            f"(ideal 1.0; north-rule gate >=0.8)\n"
        )


if __name__ == "__main__":
    main()
