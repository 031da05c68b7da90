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


def _content_digest() -> str:
    """Digest of all .py files (path+mtime+size) so edits invalidate the
    cached zip — a stale zip ships old modules to executors."""
    import hashlib

    h = hashlib.md5()
    for root, _dirs, files in sorted(os.walk(_PKG_DIR)):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                st = os.stat(full)
                h.update(f"{os.path.relpath(full, _PKG_DIR)}:{st.st_mtime_ns}:{st.st_size};".encode())
    return h.hexdigest()[:12]


def package_zip() -> str:
    """Build (once per content state) a zip of the engine package."""
    out = os.path.join("/tmp", f"{_PKG_NAME}-pyfiles-{_content_digest()}.zip")
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
