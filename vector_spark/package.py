"""Build dist/vector_spark.zip for ``spark-submit --py-files``.

Usage: ``python -m vector_spark.package [dest_dir]``

Executors import the library from the zip; no install step (the cluster
analogue of Vector shipping one static binary).
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(dest_dir: str | None = None) -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(pkg_dir)
    dest_dir = dest_dir or os.path.join(repo, "dist")
    os.makedirs(dest_dir, exist_ok=True)
    out = os.path.join(dest_dir, "vector_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join("vector_spark", os.path.relpath(full, pkg_dir))
                z.write(full, rel)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
