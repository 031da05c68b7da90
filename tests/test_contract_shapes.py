"""Driver-shape guard: contract outputs must be scalar columns only.

Round-4 lesson: the driver's correctness harness canonicalizes results
with a pandas sort, which raises ``TypeError: unhashable type: 'list'``
on array/map/struct cells — q_html_tables was red on the authoritative
gate while 178/178 green locally, because tools/check_contract.py used
to stringify object columns before sorting. check_contract now rejects
non-scalar output columns outright; this file regression-tests that
rejection with deliberately bad fixtures so the divergence cannot
silently return.
"""

import sys

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo/tools")


def test_scalar_violations_flags_array_map_struct(spark):
    from check_contract import scalar_violations

    df = spark.range(3).select(
        F.col("id"),
        F.array(F.lit("a"), F.lit("b")).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("mp"),
        F.struct(F.lit(1).alias("x")).alias("st"),
        F.lit("ok").alias("s"),
    )
    assert scalar_violations(df) == ["arr", "mp", "st"]


def test_scalar_violations_passes_scalar_frame(spark):
    from check_contract import scalar_violations

    df = spark.range(3).select(
        "id",
        F.lit("s").alias("s"),
        F.lit(1.5).alias("f"),
        F.current_date().alias("d"),
    )
    assert scalar_violations(df) == []


def test_flattened_contracts_emit_scalars(spark):
    """The two round-4 offenders, pinned scalar-only at plan level (no
    job run — schema analysis is lazy)."""
    from pdf_table_extractor_spark import contracts_curation as cc

    sys.path.insert(0, "/root/repo/tools")
    from check_contract import scalar_violations

    sf = "/root/testdata/sf0.001"
    assert scalar_violations(cc.q_html_tables(spark, sf)) == []
    assert scalar_violations(cc.q_random_projection(spark, sf)) == []
