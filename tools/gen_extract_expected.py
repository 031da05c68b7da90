"""Precompute the extraction flagship's expected output for the driver gate.

Runs the independent pure-pandas golden oracle (tests/oracle.py — never
imports engine code) over the SAME seeded 120-doc corpus that
``q_extract_pipeline`` synthesises, and writes the expected
``(url, profile, csv_md5)`` table to
``tests/golden/extract_expected_120.parquet``. The contract's DuckDB oracle
is then just ``SELECT ... FROM read_parquet(<that file>)``, which turns the
flagship from a rows-only check into a full byte-level (md5 per url) gate.

Re-run whenever synth.py, tests/oracle.py, or the corpus size changes::

    python tools/gen_extract_expected.py
"""

from __future__ import annotations

import hashlib
import pathlib
import sys

sys.path.insert(0, "/root/repo")

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from pdf_table_extractor_spark import synth  # noqa: E402
from tests import oracle  # noqa: E402

N_DOCS = 120
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden" / "extract_expected_120.parquet"


def main() -> None:
    urls, profiles, md5s = [], [], []
    for profile, doc_id in synth.doc_plan(N_DOCS):
        doc = synth.make_doc(profile, doc_id)
        if profile == "noise":
            golden = None
            out_profile = ""  # engine's unknown-profile passthrough
        else:
            golden = oracle.golden(profile, doc["text"], bytes(doc["html"]))
            out_profile = profile
        urls.append(doc["url"])
        profiles.append(out_profile)
        md5s.append(None if golden is None else hashlib.md5(golden).hexdigest())
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table({"url": urls, "profile": profiles, "csv_md5": md5s}), OUT
    )
    n_null = sum(m is None for m in md5s)
    print(f"wrote {OUT}: {len(urls)} urls, {n_null} with no csv (noise/empty)")


if __name__ == "__main__":
    main()
