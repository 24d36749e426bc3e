"""``vector test`` command twin: load a TOML config carrying ``[[tests]]``
blocks and execute them (reference src/unit_test.rs:62-90 entry point;
harness semantics in vector_spark/config_tests.py).

    python jobs/vector_test.py path/to/vector.toml

Exit code 0 when every test passes, 1 otherwise — same contract as the
reference CLI, so it drops into CI the same way.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from vector_spark.config import load_config
    from vector_spark.config_tests import run_config_tests
    from vector_spark.session import get_spark

    if len(sys.argv) != 2:
        print("usage: python jobs/vector_test.py <config.toml>", file=sys.stderr)
        return 2
    spark = get_spark("vector_test", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    results = run_config_tests(spark, load_config(sys.argv[1]))
    n_failed = 0
    for r in results:
        print(f"test {r.name} ... {'passed' if r.passed else 'FAILED'}")
        for e in r.errors:
            print(f"  {e}")
        n_failed += 0 if r.passed else 1
    print(f"{len(results) - n_failed} passed, {n_failed} failed")
    return 1 if n_failed else 0


if __name__ == "__main__":
    sys.exit(main())
