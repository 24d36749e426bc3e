"""--py-files packaging (vector_spark/package.py): the zip must be
importable under zipimport, which (unlike filesystem imports) requires a
real __init__.py in every package directory — a missing one broke
executor-side imports of vector_spark.functions in the spark-submit run."""

from __future__ import annotations

import os
import zipfile

from vector_spark.package import build


def test_zip_has_init_for_every_package(tmp_path):
    out = build(str(tmp_path))
    names = set(zipfile.ZipFile(out).namelist())
    dirs = {os.path.dirname(n) for n in names if "/" in n}
    for d in sorted(dirs):
        assert f"{d}/__init__.py" in names, f"zipimport needs {d}/__init__.py"
    # every library module made it in
    for mod in ("pipeline", "retrieval", "functions/grok", "functions/avro",
                "operators/core"):
        assert f"vector_spark/{mod}.py" in names
