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


def test_contract_queries_ship_package(spark):
    """The driver contract must work when the harness launches from a cwd
    other than the repo root: pandas-UDF closures pickle by reference to
    vector_spark.* modules, so queries() has to addPyFile the package zip
    (CORRECTNESS pre-flight regression: ModuleNotFoundError on workers)."""
    import __spark_entry__ as E

    df = E.queries()["media_features"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
    assert any(
        f.endswith("vector_spark.zip") for f in spark.sparkContext.listFiles
    ), "queries() must ship dist/vector_spark.zip to workers via addPyFile"
