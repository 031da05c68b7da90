"""pdf_table_extractor_spark — a PySpark-native web-scale extraction engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference repo (DanBessa/pdf-table-extractor, studied read-only at
/root/reference) as an idiomatic Spark DataFrame pipeline:

- config-driven layout heuristics replace the 14 per-bank hardcoded extractors
  (reference: ``Conversor.py:20-47`` dispatch registry),
- carried-state Python loops become window functions / cumulative-sum
  segmentation (reference: e.g. ``conversor_bbmod1.py:64-103``),
- positioned-word parsing and per-doc state machines run inside Arrow-
  vectorized pandas UDFs (never per-row Python at the Spark level),
- output is a deterministic byte serializer gated on byte-identical text per
  url versus pure-pandas golden oracles (``tests/oracle.py``).

Designed for 10^12-doc scale: explicit url-hash salt partitioning, partial
aggregation, broadcast-only small joins, checkpoint-resumable commits with
per-partition lineage.
"""

__version__ = "0.1.0"
