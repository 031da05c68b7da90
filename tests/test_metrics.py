"""Classifier-evaluation metrics (operators/metrics.py): parity with
brute-force pair counting / sequential threshold sweeps, edge cases,
and plan hygiene (no corpus-wide window)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import metrics


def _brute_auc(rows, round_to=6):
    pos = [round(s, round_to) for s, y in rows if y == 1]
    neg = [round(s, round_to) for s, y in rows if y == 0]
    if not pos or not neg:
        return None
    u = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return u / (len(pos) * len(neg))


def test_auc_property_vs_bruteforce(spark):
    rng = random.Random(5)
    for trial in range(5):
        rows = [
            (round(rng.random(), 2), int(rng.random() < 0.3 + 0.5 * rng.random()))
            for _ in range(rng.randrange(20, 120))
        ]
        df = spark.createDataFrame(rows, "score double, label int")
        (got,) = metrics.auc_roc(df, round_to=6).collect()
        want = _brute_auc(rows)
        assert abs(got["auc"] - want) < 1e-6, (trial, got["auc"], want)


def test_auc_degenerate_classes(spark):
    df = spark.createDataFrame([(0.5, 1), (0.7, 1)], "score double, label int")
    (r,) = metrics.auc_roc(df).collect()
    assert r["auc"] is None and r["n_neg"] == 0


def test_pr_curve_matches_sequential_sweep(spark):
    rows = [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.5, 0), (0.4, 0),
            (0.4, 1), (0.2, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["threshold"]: r for r in metrics.pr_curve(df).collect()}
    P = sum(y for _, y in rows)
    for t in sorted({s for s, _ in rows}):
        tp = sum(1 for s, y in rows if y == 1 and s >= t)
        fp = sum(1 for s, y in rows if y == 0 and s >= t)
        g = got[t]
        assert (g["tp"], g["fp"], g["fn"]) == (tp, fp, P - tp), t
        assert abs(g["precision"] - tp / (tp + fp)) < 1e-6
        assert abs(g["recall"] - tp / P) < 1e-6


def test_no_corpus_window(spark):
    """The only globally-ordered window runs over COARSE-GROUP totals
    (two-level scan), never the input rows: the physical plan's window
    nodes must sit above bucket-level aggregates."""
    df = spark.createDataFrame(
        [(i / 97.0, i % 3 == 0) for i in range(200)], "score double, label boolean"
    ).withColumn("label", F.col("label").cast("int"))
    plan = metrics.auc_roc(df)._jdf.queryExecution().executedPlan().toString()
    # a corpus-row window would show Window before any HashAggregate in
    # the tree bottom-up; cheap proxy: every Window in the plan sits
    # above at least one aggregate of the bucket table
    assert plan.index("Window") < plan.rindex("HashAggregate"), plan


def test_calibration_bins_and_ece(spark):
    import pytest

    rows = [(0.05, 0), (0.08, 0), (0.45, 1), (0.48, 0), (0.95, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bin"]: r for r in metrics.calibration_bins(df, n_bins=10).collect()}
    assert set(got) == {0, 4, 9}
    assert got[0]["n"] == 2 and got[0]["frac_pos"] == 0.0
    assert got[4]["n"] == 2 and abs(got[4]["frac_pos"] - 0.5) < 1e-9
    assert got[9]["n"] == 2 and got[9]["frac_pos"] == 1.0  # 1.0 clamps in
    assert abs(got[0]["mean_score"] - 0.065) < 1e-6
    (e,) = metrics.expected_calibration_error(df, n_bins=10).collect()
    want = (got[0]["gap"] * 2 + got[4]["gap"] * 2 + got[9]["gap"] * 2) / 6
    assert abs(e["ece"] - round(want, 6)) < 1e-6
    assert e["n"] == 6 and e["n_bins_used"] == 3
    with pytest.raises(ValueError, match="n_bins"):
        metrics.calibration_bins(df, n_bins=0)
