"""Ship the engine package to executor Python workers.

In production this is ``spark-submit --py-files engine.zip`` (north rule);
in-sandbox (and under the driver's verify harness, which builds its own
SparkSession from any cwd) we zip the package at runtime and
``addPyFile`` it, so pandas-UDF closures that reference engine modules
unpickle on workers regardless of where the driver process started.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)
_shipped: set[str] = set()


def package_zip() -> str:
    """Build (once) a zip of the engine package; return its path."""
    out = os.path.join("/tmp", f"{_PKG_NAME}-pyfiles.zip")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(_PKG_DIR):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            _PKG_NAME, os.path.relpath(full, _PKG_DIR)
                        )
                        zf.write(full, rel)
        os.replace(tmp, out)
    return out


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently attach the engine zip to this session's SparkContext."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _shipped:
        return
    sc.addPyFile(package_zip())
    _shipped.add(key)
