"""Window-function rewrites of the reference's carried-state loops.

Every sequential loop in the reference that carries state across ordered
lines (SURVEY §2.5) maps onto one of four window shapes, all partitioned by
document and ordered by a deterministic in-doc position — so after the
pipeline repartitions by url-hash, every window here is partition-local and
adds NO extra shuffle (EnsureRequirements sees the child distribution
satisfies `Window.partitionBy(url)`).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def doc_window(part_cols: list[str], order_col: str) -> WindowSpec:
    return Window.partitionBy(*part_cols).orderBy(order_col)


def ffill(col: Column, part_cols: list[str], order_col: str) -> Column:
    """Forward-fill: lines without a value inherit the last one above
    (date carry: conversor_bradesco.py:142-164, conversor_banestes.py:63-64,
    conversor_sicoobmod1.py:32-34, conversor_itau.py:146-152)."""
    w = doc_window(part_cols, order_col).rowsBetween(Window.unboundedPreceding, 0)
    return F.last(col, ignorenulls=True).over(w)


def bfill(col: Column, part_cols: list[str], order_col: str) -> Column:
    """Backward-fill (conversor_itau.py:154-167 — name says 'remove repeats',
    body bfills; we reproduce the body)."""
    w = doc_window(part_cols, order_col).rowsBetween(0, Window.unboundedFollowing)
    return F.first(col, ignorenulls=True).over(w)


def doc_scalar(col: Column, part_cols: list[str]) -> Column:
    """Broadcast a doc-level scalar (e.g. sniffed year,
    conversor_c6.py:38-44) to every row of the doc: unordered max/first over
    the whole partition."""
    w = Window.partitionBy(*part_cols)
    return F.max(col).over(w)


def section_gate(
    marker_start: Column, marker_stop: Column, part_cols: list[str], order_col: str
) -> Column:
    """Keep-predicate for rows strictly between a start and stop marker
    (conversor_santander.py:84,96-113 `start_extract` flag).

    Cumulative max of the start flag turns on at the start marker; cumulative
    max of the stop flag turns on at the stop marker. Keep rows where start
    has fired and stop has not (markers themselves excluded).

    Window expressions are not allowed in WHERE — materialize with
    ``withColumn('keep', ...)`` then ``filter('keep')``.
    """
    w = doc_window(part_cols, order_col).rowsBetween(Window.unboundedPreceding, 0)
    started = F.max(marker_start.cast("int")).over(w) == 1
    stopped = F.max(marker_stop.cast("int")).over(w) == 1
    return started & ~stopped & ~marker_start & ~marker_stop


def segment_id(is_start: Column, part_cols: list[str], order_col: str) -> Column:
    """Cumulative-sum segmentation: each record-start line opens a new
    segment; following lines belong to it (buffer-until-value assembly,
    conversor_bbmod1.py:64-103; dated-line flush, conversor_bbmod2.py:36-65;
    gap sessionization on `events`)."""
    w = doc_window(part_cols, order_col).rowsBetween(Window.unboundedPreceding, 0)
    return F.sum(is_start.cast("bigint")).over(w)
