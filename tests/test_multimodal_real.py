"""Real-codec seam gate (round-4 verdict ask #7, mirroring the
openpyxl cross-check pattern): skipped wherever PIL is absent, but any
environment that ships it immediately runs `decode_media_real` over a
tiny generated PNG — so the deployment seam is exercised the moment the
dependency appears, not on the first production incident."""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL")
import PIL.Image  # noqa: E402


def _png_bytes(w: int, h: int, color=(200, 10, 30)) -> bytes:
    buf = io.BytesIO()
    PIL.Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_media_real_reads_true_dimensions(spark):
    from pdf_table_extractor_spark.operators import multimodal

    rows = [
        ("a", "image", _png_bytes(13, 7)),
        ("b", "image", _png_bytes(2, 31)),
        ("c", "image", b"not a png"),  # undecodable -> NULL dims, no crash
        ("d", "image", None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["id"]: r for r in multimodal.decode_media_real(df).collect()}
    assert (got["a"]["width"], got["a"]["height"]) == (13, 7)
    assert (got["b"]["width"], got["b"]["height"]) == (2, 31)
    assert got["c"]["width"] is None and got["c"]["height"] is None
    assert got["d"]["n_bytes"] == 0
    import hashlib

    assert got["a"]["checksum"] == hashlib.md5(rows[0][2]).hexdigest()
