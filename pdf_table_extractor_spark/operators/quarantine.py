"""Poison-pill isolation for the extraction data plane.

At 10^12 documents some inputs WILL be malformed — truncated WARC payloads
(invalid UTF-8 in the markup), garbage coordinate fields, multi-GB pages.
Without isolation one such document fails its task, Spark retries the task
(hitting the same row), and the whole job dies after N attempts. The
reference has no notion of this (GUI, one file at a time, a dialog box per
error — Conversor.py's per-file try/except); a cluster engine needs the
failure contained to the ROW, surfaced in lineage, and the job to finish.

Two complementary layers:

1. ``validate_pages`` — declarative pre-filter, pure Catalyst. Splits a
   pages frame into (ok, quarantined(url, warc_ts, reason)) on structural
   checks that don't need parsing: null/empty url, no payload at all,
   oversized text/html (the OOM class — a 2 GiB page must not reach an
   Arrow batch: Arrow's per-cell limit and the executor heap are both
   finite). The quarantine side projects only (url, warc_ts, reason), so
   at scan time it prunes to the url column plus the byte columns' lengths
   — both plans stay bucket-partition-pruned in job.py.

2. ``guard_doc`` — per-document try/except INSIDE the Arrow UDFs, for the
   poison that type-checks but still throws (undecodable bytes, malformed
   coordinate lines). A failing document degrades to the parser's
   null/empty output — one url with n_rows=0 in the committed table, job
   unaffected — and bumps the ``parse_failures`` accumulator, which
   job.py snapshots into each bucket's lineage row. Accumulator counts
   are Spark-at-least-once (task retries may double-count) — they are a
   health metric, not an exactness contract; the exact quarantine TABLE
   is layer 1's job.

Layer 2 is deliberately NOT a row-level error side-channel: threading
(url, error) structs through every branch schema would put an error column
into every exchange for the one-in-a-billion bad row. The cheap global
count locates the bucket; rerunning that bucket's urls through
``validate_pages`` + a debug parse locates the document.
"""

from __future__ import annotations

from typing import Callable, TypeVar

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

T = TypeVar("T")

# Defaults sized for Arrow/executor safety, not policy: a cell must fit an
# Arrow batch comfortably and a handful of docs must fit a task's heap
# share. Policy-level length filtering (Gopher etc.) lives in textquality.
MAX_TEXT_BYTES = 16 * 1024 * 1024
MAX_HTML_BYTES = 64 * 1024 * 1024

_FAILED = None  # process-wide accumulator, created lazily on the driver


def parse_failures(sc=None):
    """Get-or-create the process-wide parse-failure accumulator (None when
    no SparkContext is alive — e.g. pure-python unit use of guard_doc)."""
    global _FAILED
    if _FAILED is None:
        if sc is None:
            from pyspark import SparkContext

            sc = SparkContext._active_spark_context
        if sc is not None:
            _FAILED = sc.accumulator(0)
    return _FAILED


def guard_doc(fn: Callable[..., T], default: T | None = None) -> Callable[..., T | None]:
    """Wrap a per-document parser: exceptions become ``default`` plus one
    tick of the parse_failures accumulator, instead of a task failure.

    Call at UDF-build time (driver side) so the accumulator is captured
    into the cloudpickled closure; worker-side ticks flow back with each
    task's status update. KeyboardInterrupt/SystemExit/MemoryError are NOT
    swallowed — only data-shaped errors are."""
    acc = parse_failures()

    def guarded(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (MemoryError, KeyboardInterrupt, SystemExit):
            raise
        except Exception:
            if acc is not None:
                acc.add(1)
            return default

    return guarded


def quarantine_reason(
    max_text_bytes: int = MAX_TEXT_BYTES,
    max_html_bytes: int = MAX_HTML_BYTES,
) -> Column:
    """NULL for a structurally-sound page row, else a stable reason token.
    First matching rule wins; all checks are codegen (no UDF)."""
    return (
        F.when(F.col("url").isNull() | (F.col("url") == ""), F.lit("null_url"))
        .when(F.col("text").isNull() & F.col("html").isNull(), F.lit("no_payload"))
        .when(F.octet_length("text") > max_text_bytes, F.lit("text_too_large"))
        .when(F.length("html") > max_html_bytes, F.lit("html_too_large"))
    )


def validate_pages(
    pages: DataFrame,
    max_text_bytes: int = MAX_TEXT_BYTES,
    max_html_bytes: int = MAX_HTML_BYTES,
) -> tuple[DataFrame, DataFrame]:
    """Split pages into (ok, quarantined). ``ok`` keeps the input schema;
    ``quarantined`` is (url, warc_ts, reason) — small enough to commit
    next to the data as the per-bucket quarantine table."""
    reason = quarantine_reason(max_text_bytes, max_html_bytes)
    ok = pages.filter(reason.isNull())
    quarantined = pages.select(
        "url", "warc_ts", reason.alias("reason")
    ).filter(F.col("reason").isNotNull())
    return ok, quarantined
