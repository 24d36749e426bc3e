#!/usr/bin/env python
"""Separate the 1->8-core per-core throughput decay from JVM internals
(VERDICT r4 Next #6).

Round 4 falsified the SMT-sibling theory (pinning changed nothing) and
left two candidate explanations for the smooth 303k->210k rows/s/core
decay from 1 to 8 active cores:

  (a) host-wide shared-resource ceiling (LLC / memory controller /
      co-tenancy) — the decay follows TOTAL active cores on the host,
      regardless of how they are grouped into JVMs;
  (b) in-JVM contention (GC, allocation, shared runtime structures) —
      one 8-thread JVM loses throughput that four 2-thread JVMs with
      the same total core count would keep.

Discriminating experiment: the corpus' parquet files are split
round-robin into 4 balanced groups, and the SAME headline pipeline
(parse -> enrich -> route -> aggregate) runs as

  * 1 x local[8] over all files, vs
  * 4 x local[2] JVMs CONCURRENTLY, one group each,

both measured as sustained aggregate throughput over a fixed wall
window (file-barrier start sync; each child loops the pipeline and
reports completed rows/sec).  If 4x2 ~= 1x8 the ceiling is host-wide
and (a) stands; if 4x2 wins clearly, there is an in-JVM lever.

Result lands as a table + conclusion in BENCH.md.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF = float(os.environ.get("SPARK_GRAFT_SCALING_SF", "1.0"))
WINDOW = float(os.environ.get("SPARK_GRAFT_MJ_WINDOW", "45"))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from vector_spark.session import get_spark
from vector_spark import pipeline as P

cpus = int(sys.argv[1])
files = json.loads(sys.argv[2])
barrier_dir = sys.argv[3]
child_id = sys.argv[4]
window = float(sys.argv[5])

spark = get_spark(f"mj_{{child_id}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8),
                  extra_conf={{"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)}})
spark.sparkContext.setLogLevel("ERROR")
src = spark.read.parquet(*files)
# warm: page cache, JIT, codegen — one full untimed pipeline pass
P.sink_aggregates(P.route_stage(P.parsed_enriched(spark, src))).collect()
open(os.path.join(barrier_dir, f"ready_{{child_id}}"), "w").close()
while not os.path.exists(os.path.join(barrier_dir, "go")):
    time.sleep(0.05)
t0 = time.time()
rows = 0
iters = 0
while time.time() - t0 < window:
    agg = P.sink_aggregates(P.route_stage(P.parsed_enriched(spark, src))).collect()
    rows += sum(r["n_rows"] for r in agg)
    iters += 1
dt = time.time() - t0  # includes the overshoot of the last iteration
print(json.dumps({{"child": child_id, "cpus": cpus, "rows": rows,
                   "iters": iters, "sec": round(dt, 2),
                   "rows_per_sec": rows / dt}}))
"""


def _run_config(label: str, jvms: list[tuple[int, list[str]]]) -> dict:
    """Launch one JVM per (cpus, files) concurrently with a file-barrier
    synchronized measurement window; returns aggregate throughput."""
    barrier = tempfile.mkdtemp(prefix="mj_barrier_")
    code = CHILD.format(repo=REPO)
    procs = []
    err_files = []
    for i, (cpus, files) in enumerate(jvms):
        ef = open(os.path.join(barrier, f"stderr_{label}_{i}"), "w")
        err_files.append(ef)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code, str(cpus), json.dumps(files),
             barrier, f"{label}_{i}", str(WINDOW)],
            stdout=subprocess.PIPE, stderr=ef, text=True))
    deadline = time.time() + 900
    while time.time() < deadline:
        ready = glob.glob(os.path.join(barrier, "ready_*"))
        if len(ready) == len(jvms):
            break
        if any(p.poll() is not None for p in procs):
            raise RuntimeError(f"{label}: a child exited before the barrier")
        time.sleep(0.2)
    open(os.path.join(barrier, "go"), "w").close()
    results = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=WINDOW + 600)
        err_files[i].close()
        lines = [l for l in out.splitlines() if l.startswith("{")]
        if not lines:  # child died mid-window: surface ITS error, not ours
            tail = open(os.path.join(
                barrier, f"stderr_{label}_{i}")).read()[-2000:]
            raise RuntimeError(
                f"{label} child {i} produced no result (rc={p.returncode}); "
                f"stderr tail:\n{tail}")
        results.append(json.loads(lines[-1]))
    total = sum(r["rows_per_sec"] for r in results)
    return {"label": label, "children": results,
            "agg_rows_per_sec": round(total, 1)}


def _ensure_slices(corpus: str) -> list[str]:
    """Split the single-file corpus into 4 cached on-disk quarters by
    row-group (pyarrow copy — deterministic, no Spark job), so each
    4x-config child reads its own files and total bytes match the
    1x config exactly."""
    import pyarrow.parquet as pq

    slice_dir = corpus + ".slices4"
    done = os.path.join(slice_dir, "_DONE")
    paths = [os.path.join(slice_dir, f"slice-{i}.parquet") for i in range(4)]
    if os.path.exists(done):
        return paths
    os.makedirs(slice_dir, exist_ok=True)
    f = pq.ParquetFile(corpus)
    n_rg = f.metadata.num_row_groups
    if n_rg >= 4:
        for i, path in enumerate(paths):
            rgs = [g for g in range(n_rg) if g % 4 == i]
            with pq.ParquetWriter(path, f.schema_arrow, compression="zstd") as w:
                for g in rgs:
                    w.write_table(f.read_row_group(g))
    else:  # small corpus: split by row ranges instead
        t = f.read()
        n = t.num_rows
        for i, path in enumerate(paths):
            lo = n * i // 4
            pq.write_table(t.slice(lo, n * (i + 1) // 4 - lo), path,
                           compression="zstd")
    open(done, "w").close()
    return paths


def main() -> None:
    sys.path.insert(0, REPO)
    from vector_spark import datagen

    corpus = datagen.ensure_corpus(SF)
    if os.path.isdir(corpus):
        files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    else:
        files = _ensure_slices(corpus)
    if len(files) < 4:
        raise SystemExit(f"need >=4 corpus files, found {len(files)}")
    groups: list[list[str]] = [[], [], [], []]
    for i, f in enumerate(files):  # round-robin keeps group bytes balanced
        groups[i % 4].append(f)

    # interleave the two configurations twice and keep the best of each,
    # the same anti-noise methodology as bench_scaling.py
    best = {}
    for _ in range(2):
        for label, jvms in (
            ("1x_local8", [(8, files)]),
            ("4x_local2", [(2, g) for g in groups]),
        ):
            r = _run_config(label, jvms)
            print(f"{label}: {r['agg_rows_per_sec']:.0f} rows/s aggregate",
                  file=sys.stderr, flush=True)
            if label not in best or r["agg_rows_per_sec"] > best[label]["agg_rows_per_sec"]:
                best[label] = r

    one = best["1x_local8"]["agg_rows_per_sec"]
    four = best["4x_local2"]["agg_rows_per_sec"]
    ratio = four / one
    if ratio > 1.15:
        conclusion = (
            "4x local[2] clearly beats 1x local[8] — there IS an in-JVM "
            "contention lever (GC/allocator/shared runtime) worth chasing.")
    elif ratio < 0.85:
        conclusion = (
            "1x local[8] clearly beats 4x local[2] — per-JVM overheads "
            "(4 warm JVM heaps, 4 copies of broadcast state) dominate; "
            "no in-JVM contention lever.")
    else:
        conclusion = (
            "4x local[2] ~= 1x local[8] (within 15%): the 1->8-core "
            "per-core decay follows TOTAL active cores regardless of JVM "
            "grouping, so the ceiling is host-wide (LLC/memory "
            "bandwidth/co-tenancy), not JVM-internal.  Case closed: no "
            "in-JVM contention lever exists for this workload.")
    result = {"sf": SF, "window_sec": WINDOW, "ratio_4x2_over_1x8": round(ratio, 3),
              "best": best, "conclusion": conclusion}
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Multi-JVM grouping experiment (sf={SF}, {WINDOW:.0f}s "
            f"sustained windows, best of 2 interleaved runs)\n\n"
            f"Discriminates host-wide vs in-JVM causes of the 1->8-core "
            f"per-core decay (VERDICT r4 Next #6): same total cores, same "
            f"input files, different JVM grouping.\n\n"
            f"| configuration | aggregate rows/sec |\n|---|---|\n"
            f"| 1 x local[8], all files | {one:.0f} |\n"
            f"| 4 x local[2], quarter each, concurrent | {four:.0f} |\n\n"
            f"Ratio (4x2 / 1x8): **{ratio:.2f}**.  {conclusion}\n"
        )


if __name__ == "__main__":
    main()
