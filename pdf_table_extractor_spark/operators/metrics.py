"""Classifier-evaluation metrics at corpus scale: ROC-AUC and
precision/recall curves for the quality-classifier stack
(textquality.linear_quality / training.train_linear_quality — the models
that decide what survives into a training corpus deserve the same
distributed rigor as the filters themselves).

Replaces the reference's eyeball-the-output validation
(/root/reference/Conversor.py has no evaluation path at all) with the
standard rank statistics, computed WITHOUT a global sort of the corpus:

- Scores round to ``round_to`` decimals and aggregate to a BUCKET table
  (one row per distinct rounded score — resolution-bounded, orders of
  magnitude smaller than the corpus).
- AUC is the tie-aware Mann-Whitney statistic over buckets: a positive
  beats every negative in strictly-lower buckets and half of the
  negatives tied with it, so
  AUC = Σ_b n_pos_b · (cum_neg_below_b + n_neg_b / 2) / (P · N)
  — no per-row ranks, no global window over the data.
- The bucket prefix sums use the assign_shards two-level scan shape:
  per-coarse-group totals take the only globally-ordered window (tiny),
  the within-group cumsum is partitioned — never all buckets on one task
  even at extreme score resolutions.

Everything is integer/dyadic arithmetic until the final division, so a
SQL oracle replays it exactly (no ln/exp drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _score_buckets(
    df: DataFrame, score_col: str, label_col: str, round_to: int
) -> DataFrame:
    """(score, n_pos, n_neg) per distinct rounded score."""
    s = F.round(F.col(score_col).cast("double"), round_to)
    lab = F.col(label_col).cast("int")
    return df.select(s.alias("score"), lab.alias("__y")).groupBy("score").agg(
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("__y")).cast("long").alias("n_neg"),
    )


def _with_cum_below(buckets: DataFrame, col: str, out: str) -> DataFrame:
    """Two-level exclusive prefix sum of ``col`` over buckets in ascending
    score order (assign_shards' scan shape at bucket granularity)."""
    coarse = buckets.withColumn("__g", F.round(F.col("score"), 1))
    totals = coarse.groupBy("__g").agg(F.sum(col).alias("__gt"))
    w_off = Window.orderBy("__g").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__g", F.coalesce(F.sum("__gt").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = (
        Window.partitionBy("__g")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        coarse.join(F.broadcast(offsets), "__g")
        .withColumn(
            out,
            F.col("__off") + F.coalesce(F.sum(col).over(w_in), F.lit(0)),
        )
        .drop("__g", "__off")
    )


def auc_roc(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """One row: (auc, n_pos, n_neg, n_buckets). Tie-aware (ties at a
    rounded score contribute half), exactly the probability a random
    positive outscores a random negative. NULL auc when either class is
    empty. ``round_to`` controls SCORE bucketing; the auc itself always
    rounds to 6 decimals (the repo's cross-engine float rule)."""
    b = _with_cum_below(
        _score_buckets(df, score_col, label_col, round_to), "n_neg", "__cnb"
    )
    # U as an exact integer: 2·U = Σ n_pos·(2·cum_neg_below + n_neg) — but
    # accumulated as decimal(38,0), NOT long: at the 100-TB envelope 2·P·N
    # passes int64 once each class exceeds ~2.1e9 rows, and ANSI mode
    # would throw ARITHMETIC_OVERFLOW exactly where this module promises
    # scale (review finding; DuckDB's SUM(BIGINT) widens to HUGEINT on
    # its own, so both engines still agree bit-for-bit).
    agg = b.agg(
        F.sum(
            (F.col("n_pos") * (2 * F.col("__cnb") + F.col("n_neg"))).cast(
                "decimal(38,0)"
            )
        ).alias("__u2"),
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
        F.count("*").alias("n_buckets"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            F.col("__u2").cast("double")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ),
    )
    return agg.select(
        auc.alias("auc"), "n_pos", "n_neg", F.col("n_buckets").cast("long").alias("n_buckets")
    )


def pr_curve(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    round_to: int = 3,
) -> DataFrame:
    """Per-threshold confusion counts: one row per distinct rounded score
    t with predictions ``score >= t`` — (threshold, tp, fp, fn,
    precision, recall, f1). The operating-point table a filter pipeline
    reads to pick its quality cutoff; counts are exact integers, ratios
    round to 6 (cross-engine float rule).

    Same bucket table as `auc_roc`: tp(t) = P − cum_pos_below(t),
    fp(t) = N − cum_neg_below(t) — two prefix scans, no corpus window."""
    buckets = _score_buckets(df, score_col, label_col, round_to)
    # totals from the RAW bucket frame, not the post-window one: the
    # 1-row broadcast agg duplicates only the scan→bucket-aggregate
    # subtree (house precedent, sampling.weighted_topk), never the
    # window+join stages on top (review finding)
    tot = buckets.agg(
        F.sum("n_pos").alias("__P"), F.sum("n_neg").alias("__N")
    )
    b = _with_cum_below(buckets, "n_neg", "__cnb")
    b = _with_cum_below(b, "n_pos", "__cpb")
    j = b.crossJoin(F.broadcast(tot))
    tp = F.col("__P") - F.col("__cpb")
    fp = F.col("__N") - F.col("__cnb")
    fn = F.col("__cpb")
    precision = F.when(tp + fp > 0, F.round(tp / (tp + fp), 6))
    recall = F.when(F.col("__P") > 0, F.round(tp / F.col("__P"), 6))
    f1 = F.when(
        2 * tp + fp + fn > 0, F.round(2 * tp / (2 * tp + fp + fn), 6)
    )
    return j.select(
        F.col("score").alias("threshold"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )


def calibration_bins(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier: scores in
    [0, 1] bucket to ``n_bins`` equal-width bins (score 1.0 clamps into
    the last), each row = (bin, n, mean_score, frac_pos, gap). A
    well-calibrated quality model has frac_pos ≈ mean_score per bin —
    the check that decides whether its scores can be used as sampling
    WEIGHTS (temperature mixing) rather than just a threshold rank.
    One hash aggregate; integer counts + round-6 ratios (cross-engine
    float rule); sums of raw scores stay exact when scores are dyadic
    (the repo's md5 variates) and round-6 otherwise."""
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("int")
    b = F.least(F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1))
    agg = (
        df.select(b.alias("bin"), s.alias("__s"), lab.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__s").alias("__ssum"),
            F.sum("__y").cast("long").alias("__pos"),
        )
    )
    mean_score = F.round(F.col("__ssum") / F.col("n"), 6)
    frac_pos = F.round(F.col("__pos") / F.col("n"), 6)
    return agg.select(
        "bin",
        "n",
        mean_score.alias("mean_score"),
        frac_pos.alias("frac_pos"),
        F.round(F.abs(mean_score - frac_pos), 6).alias("gap"),
    )


def expected_calibration_error(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """One row (ece, n, n_bins_used): the n-weighted mean of per-bin
    |mean_score − frac_pos| (Naeini et al., AAAI 2015). Composes on
    `calibration_bins`' single aggregate; the weighted sum runs over the
    ≤ n_bins bin rows."""
    bins = calibration_bins(
        df, score_col=score_col, label_col=label_col, n_bins=n_bins
    )
    tot = bins.agg(
        F.round(
            F.sum(F.col("gap") * F.col("n")) / F.sum("n"), 6
        ).alias("ece"),
        F.sum("n").alias("n"),
        F.count("*").cast("long").alias("n_bins_used"),
    )
    return tot
