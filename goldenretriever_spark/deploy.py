"""Packaging for spark-submit --py-files deployment (north_rule requirement).

``package_zip()`` zips the goldenretriever_spark package; pass the result to
``spark-submit --py-files`` or ``sparkContext.addPyFile``. Required whenever
executors are separate processes (any real cluster, or local-cluster[...]
mode) — UDF closures reference module-level functions that workers must
import (local[N] mode hides this because workers fork from the driver).
"""

from __future__ import annotations

import os
import zipfile


def package_zip(out_path: str = "/tmp/goldenretriever_spark.zip") -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_root)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, parent))
    return out_path


def attach_package(spark) -> str:
    """addPyFile the package zip to a running session (idempotent per path)."""
    path = package_zip()
    spark.sparkContext.addPyFile(path)
    return path
