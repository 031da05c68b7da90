"""Physical-plan assertions (SURVEY §4): the plans we designed for, not
just the first ones that passed.

Round-2 topology (plans/extract.py): the SHIPPED extract() plan — all 17
profile branches + the zero-record sentinel — materializes the pages source
exactly THREE times, once per column group:

  - scan[url, text]  → one url-salt exchange shared by every text-path
    branch (ReuseExchange dedupes the identical subtrees);
  - scan[url, html]  → one url-salt exchange shared by the layout/lattice
    branches (banestes, stone, itau);
  - scan[url]        → the sentinel's accounting projection (url column
    only ≈ 1% of input bytes — measured cheaper than serving the sentinel
    from the text exchange, which drags every text payload through its
    shuffle read).

This beats a single fat exchange at scale: text branches never shuffle or
re-read html bytes. Assertions run with AQE disabled so the static
ReuseExchange rule applies (at runtime AQE's stage reuse produces the same
dedup — verified via UI stage metrics: total inputRecords == 3 × corpus).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pdf_table_extractor_spark import contracts, synth
from pdf_table_extractor_spark.plans.extract import extract

SF_DIR = "/root/testdata/sf0.001"

# Real (non-reused) exchanges in the shipped plan:
#   3 salt exchanges (text group, html group, sentinel url-only scan)
# + 4 post-UDF ENSURE_REQUIREMENTS re-exchanges (bradesco, santander, stone
#   — their parse UDF drops the partitioning claim before the pack groupBy —
#   and c6, whose password-unlock UDF does the same)
# + 2 explicit post-parse salts inside layout branches (banestes via
#   layout_lines, itau via build_itau)
# + 1 final sentinel merge (caixa lost its union RR barrier when the
#   4-format sub-plans collapsed into the single data-driven cascade)
EXCHANGE_BUDGET = 11


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "pages")
    synth.synth_spark(spark, 40, parallelism=2).write.parquet(p)
    return spark.read.parquet(p)


@pytest.fixture(scope="module")
def extract_plan(spark, pages) -> str:
    """The full shipped extract() physical plan, statically optimized
    (AQE off so ReuseExchange applies at plan time)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = extract(pages, num_partitions=8)
        return out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_three_column_pruned_scans(extract_plan):
    scans = [ln for ln in extract_plan.splitlines() if "FileScan" in ln]
    assert len(scans) == 3, f"expected 3 scans of pages, got {len(scans)}"
    cols = [re.search(r"FileScan parquet \[([^\]]*)\]", s).group(1) for s in scans]
    schemas = sorted(re.sub(r"#\d+", "", c) for c in cols)
    assert schemas == ["url", "url,html", "url,text"], schemas


def test_branches_reuse_salt_exchanges(extract_plan):
    # 17 profile branches (caixa is a single sub-plan since the data-driven
    # pattern dispatch — round 2; webpage and webjt are pure Catalyst off
    # the text exchange) = 17 exchange consumers served by 2 materialized
    # exchanges + 15 reuses (the sentinel has its own skinny url-only
    # exchange; round 4's webjt branch added its consumer WITHOUT
    # materializing any new exchange — the jusText revision windows
    # re-sort but never re-shuffle, see test_exchange_budget).
    assert extract_plan.count("ReusedExchange") == 15


def test_exchange_budget(extract_plan):
    reused = extract_plan.count("ReusedExchange")
    # each ReusedExchange line prints the word Exchange twice
    real = extract_plan.count("Exchange") - 2 * reused
    assert real <= EXCHANGE_BUDGET, (
        f"{real} materialized exchanges (budget {EXCHANGE_BUDGET})\n{extract_plan}"
    )


def test_no_scan_amplification_from_filters(extract_plan):
    # The branch dispatch predicate must NOT be pushed below the salt
    # exchange (that's what specialized 19 scans in round 1's topology).
    # Its nondeterministic guard keeps it above; the only data filters
    # allowed at the scan are the inferred isnotnull(profile) constraint.
    for ln in extract_plan.splitlines():
        if "FileScan" in ln:
            assert "SPARK_PARTITION_ID" not in ln


def test_text_exchange_prunes_html(extract_plan):
    text_scan = [
        ln for ln in extract_plan.splitlines() if "FileScan" in ln and "text" in ln
    ]
    assert text_scan and "html" not in text_scan[0], (
        "binary html must be pruned from the text-group scan"
    )


def test_predicate_pushdown(spark):
    q = contracts.queries()["q_scan_project"](spark, SF_DIR)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:200]


def test_broadcast_join(spark):
    q = contracts.queries()["q_broadcast_join"](spark, SF_DIR)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_url_salt_breaks_host_skew(spark):
    """North-rule skew claim: pages clustered on ONE host spread evenly
    across partitions because the salt hashes the full url, not the host."""
    from pyspark.sql import functions as F

    from pdf_table_extractor_spark.plans.extract import salt_repartition

    one_host = spark.range(4000).select(
        F.concat(F.lit("https://host000.example/cef/"), F.col("id").cast("string")).alias("url")
    )
    parts = (
        salt_repartition(one_host, 16)
        .select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .collect()
    )
    sizes = [r["count"] for r in parts]
    assert len(sizes) >= 14  # nearly every partition populated
    assert max(sizes) < 3 * (4000 / 16)  # no partition hoards the host


def test_pin_blocks_filter_inlining(spark):
    """Regression for the codegen/pushdown trap (round 2): pushing a filter
    through a Project only checks the project FIELDS for determinism, so a
    predicate on a computed column re-inlines the full expression tree into
    the Filter (one copy per conjunct, each evaluated per row — the caixa
    cascade hit 70 element_at copies and fell past Janino's 64KB limit to
    interpreted execution). textops.pin keeps the filter on the attribute."""
    from pdf_table_extractor_spark.functions import textops

    df = spark.range(100).select(F.col("id").cast("string").alias("s"))
    heavy = F.regexp_extract("s", r"(\d+)", 1)
    cond = lambda c: (c != "1") & (c != "2") & (c != "3")  # noqa: E731
    plain = df.withColumn("x", heavy).filter(cond(F.col("x")))
    pinned = df.withColumn("x", textops.pin(heavy)).filter(cond(F.col("x")))
    n_plain = plain._jdf.queryExecution().optimizedPlan().toString().count("regexp_extract")
    n_pinned = pinned._jdf.queryExecution().optimizedPlan().toString().count("regexp_extract")
    assert n_plain >= 3, "trap no longer reproduces — revisit whether pin() is still needed"
    assert n_pinned == 1, "pinned column must be evaluated exactly once"
    assert sorted(r.x for r in pinned.collect()) == sorted(r.x for r in plain.collect())


def test_caixa_cascade_single_evaluation(spark):
    """The caixa cascade's plan must keep exactly one copy of each
    try_element_at (8 in source): duplication means a filter sank below the
    cascade projections again (see _caixa_cascade docstring)."""
    from pdf_table_extractor_spark.plans.profiles import build_caixa

    pages = spark.createDataFrame(
        [("https://h0.example/caixa/1", "01/02/2024 007 mercado 1,00C 2,00C")],
        "url string, text string",
    )
    opt = build_caixa(pages)._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("element_at") == 8, opt


# ---------------------------------------------------------------------------
# Scale-shape asserts for the curation operators: broadcasts where a
# broadcast is the design, and no accidental single-partition exchange
# over the DATA in the distributed prefix sum.
# ---------------------------------------------------------------------------


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_blocklist_filter_broadcasts(spark):
    from pdf_table_extractor_spark.operators import urls

    docs = spark.createDataFrame(
        [(1, "http://a.com/x")], "doc_id long, url string"
    )
    blocked = spark.createDataFrame([("a.com",)], "domain string")
    plan = _physical(urls.blocklist_filter(docs, blocked))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_temperature_resample_broadcasts_weights(spark):
    from pdf_table_extractor_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(30)], "doc_id long, lang string"
    )
    plan = _physical(
        sampling.temperature_resample(
            docs, group_expr=F.col("lang"), temperature=2.0
        )
    )
    # the corpus-side join with the tiny weight table must be broadcast —
    # the docs themselves are never shuffled for the join
    assert "BroadcastHashJoin" in plan


def test_assign_shards_no_global_data_exchange(spark):
    from pdf_table_extractor_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, "w " * 20) for i in range(100)], "doc_id long, text string"
    )
    out = sampling.assign_shards(
        docs,
        tokens_per_shard=100,
        n_tokens=F.size(F.split(F.trim(F.col("text")), r"\s+")),
        group_size=16,
    )
    plan = _physical(out)
    # offsets join back must be broadcast; the only SinglePartition
    # exchange feeds the tiny per-group totals window, never the doc rows
    assert "BroadcastHashJoin" in plan
    single = [
        ln for ln in plan.splitlines() if "Exchange SinglePartition" in ln
    ]
    assert len(single) <= 1
    assert re.search(r"hashpartitioning\(__g", plan)


def test_chunk_tokens_no_shuffle(spark):
    from pdf_table_extractor_spark.operators import textquality

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = _physical(textquality.chunk_tokens(docs, chunk=2, overlap=1))
    assert "Exchange" not in plan  # narrow projection + explode only


def test_mean_pool_no_vector_collect(spark):
    from pdf_table_extractor_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    plan = _physical(similarity.mean_pool(df))
    # the member vectors are averaged via (group,dim) hash aggregate —
    # collect_list only ever sees the DIM-level means, never raw vectors
    assert "collect_list" not in plan.split("HashAggregate")[0]
    assert plan.count("Exchange") <= 2  # (grp,dim) agg + grp pack agg


def test_decontaminate_spans_broadcasts_benchmark_grams(spark):
    from pdf_table_extractor_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "w a b c d e f g h") for i in range(20)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("a b c d e",)], "text string")
    plan = _physical(dedup.decontaminate_spans(docs, bench, n=5))
    # the eval-suite gram keys are the broadcast side: the corpus's
    # exploded gram stream is never shuffled for the contamination join
    assert "BroadcastHashJoin" in plan


def test_bm25_broadcasts_query_terms_and_stats(spark):
    from pdf_table_extractor_spark.operators import terms

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common words") for i in range(30)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(1, "tok1 tok2")], "query_id long, text string")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _physical(terms.bm25_topk(docs, queries, k=3))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # corpus tf rows meet the query terms through a broadcast join (the
    # corpus-side prune); N/avgdl arrives as a 1-row broadcast; and the
    # corpus is scanned + tokenized exactly ONCE — tf/dl/dfreq/stats all
    # read reused exchanges (the guard + pruning pins in terms.bm25_topk)
    assert "BroadcastHashJoin" in plan and "BroadcastNestedLoopJoin" in plan
    assert plan.count("Scan ExistingRDD[doc_id") == 1
    assert plan.count("ReusedExchange") >= 3
    # the scoring window partitions by query_id — never a global window
    assert "hashpartitioning(query_id" in plan


def test_embed_covariance_partial_shuffles_partials_only(spark):
    from pdf_table_extractor_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    plan = _physical(similarity.embed_covariance(df, method="partial"))
    # one ArrowEvalPython-free mapInPandas stage + ONE (i,j) hash
    # aggregate exchange; the vectors themselves are never shuffled
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan


def test_kn_bigram_trains_on_one_exploded_pass(spark):
    from pdf_table_extractor_spark.operators import textquality

    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(20)], "doc_id long, text string"
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _physical(textquality.kn_bigram_nll(docs))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # c12 feeds ctx/cont/B/scoring through ONE reused (w1,w2) exchange;
    # only three source passes exist by construction (shared bigram
    # counts, per-doc scoring bigrams, unigram vocab)
    assert plan.count("ReusedExchange") >= 3
    assert plan.count("Scan ExistingRDD[doc_id") == 3


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from pdf_table_extractor_spark.sources import bucketed

    left = spark.range(0, 200).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 200).selectExpr("id AS k", "id * 3 AS b")
    bucketed.write_bucketed(left, "bx_plan_l", key="k", n_buckets=4, path=str(tmp_path / "l"))
    bucketed.write_bucketed(right, "bx_plan_r", key="k", n_buckets=4, path=str(tmp_path / "r"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = bucketed.bucketed_join(spark, "bx_plan_l", "bx_plan_r", on="k")
        plan = _physical(j)
        n = j.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # the whole point of bucketing: the fact-fact equi-join runs with NO
    # shuffle on either side — the write-time bucket layout satisfies the
    # join's required distribution across jobs, not just within one plan
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert n == 200


def test_asof_join_is_one_exchange_no_join(spark):
    import datetime as dt

    from pdf_table_extractor_spark.operators import asof

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, "k%d" % (i % 3), t0 + dt.timedelta(seconds=i)) for i in range(30)],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k%d" % (i % 3), t0 + dt.timedelta(seconds=i), float(i)) for i in range(0, 30, 2)],
        "k string, ts timestamp, v double",
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = asof.asof_join(left, right, ["k"], "ts", ["v"])
        plan = _physical(j)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # the whole point: temporal alignment WITHOUT a join — one hash
    # exchange on the key feeds a partition-local sort + ffill window
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_interval_join_is_equi_not_nested_loop(spark):
    import datetime as dt

    from pdf_table_extractor_spark.operators import intervals

    t0 = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=i * 7)) for i in range(50)],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=i * 40), t0 + dt.timedelta(seconds=i * 40 + 30))
         for i in range(10)],
        "iid long, s timestamp, e timestamp",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = intervals.interval_join(pts, ivs, "ts", "s", "e", bucket_s=30)
        plan = _physical(j)
        n = j.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # the range predicate must ride an EQUI join on the bucket key, never
    # a nested-loop/cartesian scan of points x intervals
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert n > 0


def test_hypertable_rollup_scans_raw_once(spark):
    import datetime as dt

    from pdf_table_extractor_spark.operators import hypertable

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, "t%d" % (i % 2), t0 + dt.timedelta(minutes=13 * i), i * 10)
         for i in range(200)],
        "id long, typ string, ts timestamp, v long",
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        roll = hypertable.hypertable_rollup(
            df, "ts", ["1 hour", "6 hours", "1 day"], ["typ"], ["v"]
        )
        plan = _physical(roll)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # hierarchical re-aggregation: the raw table is scanned ONCE; the
    # 6-hour branch reuses the hour exchange and the day branch reuses
    # the 6-hour exchange (whose subtree already carries the hour reuse)
    assert plan.count("Scan ExistingRDD") == 1
    assert plan.count("ReusedExchange") == 2


def test_hypertable_reagg_matches_direct(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from pdf_table_extractor_spark.operators import hypertable

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, "t%d" % (i % 2), t0 + dt.timedelta(minutes=13 * i), i * 10)
         for i in range(200)],
        "id long, typ string, ts timestamp, v long",
    )
    roll = hypertable.hypertable_rollup(
        df, "ts", ["1 hour", "1 day"], ["typ"], ["v"]
    )
    got = {
        (r["bucket_start"], r["typ"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in roll.filter(F.col("grain") == "1 day").collect()
    }
    direct = {
        (r["b"], r["typ"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy(
            F.date_format(F.window("ts", "1 day")["start"], "yyyy-MM-dd HH:mm:ss").alias("b"),
            "typ",
        )
        .agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == direct


def test_asof_bucketed_windows_never_partition_by_key_alone_over_data(spark):
    import datetime as dt

    from pdf_table_extractor_spark.operators import asof

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, "hot", t0 + dt.timedelta(seconds=i)) for i in range(100)],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("hot", t0 + dt.timedelta(seconds=i), float(i)) for i in range(0, 100, 3)],
        "k string, ts timestamp, v double",
    )
    plan = _physical(
        asof.asof_join(left, right, ["k"], "ts", ["v"], bucket_s=10)
    )
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    # the window over the DATA must be keyed (k, bucket); only the carry
    # window (over per-bucket tails, ~#buckets rows) may key on k alone
    data_specs = [s for s in specs if "__asof_b" in s]
    assert data_specs, plan


def test_bucketed_join_rejects_mismatched_buckets(spark, tmp_path):
    import pytest as _pytest

    from pdf_table_extractor_spark.sources import bucketed

    left = spark.range(0, 50).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 50).selectExpr("id AS k", "id * 3 AS b")
    bucketed.write_bucketed(left, "bx_mm_l", key="k", n_buckets=4, path=str(tmp_path / "l"))
    bucketed.write_bucketed(right, "bx_mm_r", key="k", n_buckets=8, path=str(tmp_path / "r"))
    with _pytest.raises(ValueError, match="silently re-shuffle"):
        bucketed.bucketed_join(spark, "bx_mm_l", "bx_mm_r", on="k")


def test_bucketed_join_rejects_wrong_join_key(spark, tmp_path):
    import pytest as _pytest

    from pdf_table_extractor_spark.sources import bucketed

    left = spark.range(0, 50).selectExpr("id AS k", "id AS j", "id * 2 AS a")
    right = spark.range(0, 50).selectExpr("id AS k", "id AS j", "id * 3 AS b")
    bucketed.write_bucketed(left, "bx_wk_l", key="k", n_buckets=4, path=str(tmp_path / "l"))
    bucketed.write_bucketed(right, "bx_wk_r", key="k", n_buckets=4, path=str(tmp_path / "r"))
    with _pytest.raises(ValueError, match="does not cover the"):
        bucketed.bucketed_join(spark, "bx_wk_l", "bx_wk_r", on="j")
    # joining on (k, j) still covers the bucket column k: allowed
    assert bucketed.bucketed_join(spark, "bx_wk_l", "bx_wk_r", on=["k", "j"]).count() == 50


def test_hypertable_rejects_nondivisible_grains(spark):
    import datetime as dt

    import pytest as _pytest

    from pdf_table_extractor_spark.operators import hypertable

    df = spark.createDataFrame(
        [(1, "t", dt.datetime(2024, 1, 1), 5)], "id long, typ string, ts timestamp, v long"
    )
    with _pytest.raises(ValueError, match="whole multiple"):
        hypertable.hypertable_rollup(df, "ts", ["1 hour", "90 minutes"], ["typ"], ["v"])


def test_hypertable_week_grain_is_monday_aligned(spark):
    """'1 week' buckets start Monday (time_bucket's 2000-01-03 origin),
    not the Thursday phase an unshifted epoch tumble would give."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pdf_table_extractor_spark.operators import hypertable

    # 2024-01-03 is a Wednesday; its week bucket is Mon 2024-01-01.
    # An unshifted 7-day epoch tumble would put it in a bucket starting
    # Thu 2023-12-28.
    df = spark.createDataFrame(
        [(1, "t", dt.datetime(2024, 1, 3, 15, 30), 5),
         (2, "t", dt.datetime(2024, 1, 7, 23, 59), 7),   # Sun, same week
         (3, "t", dt.datetime(2024, 1, 8, 0, 0), 9)],    # Mon, next week
        "id long, typ string, ts timestamp, v long",
    )
    roll = hypertable.hypertable_rollup(
        df, "ts", ["1 day", "1 week"], ["typ"], ["v"]
    )
    weeks = {
        r["bucket_start"]: r["sum_v"]
        for r in roll.filter(F.col("grain") == "1 week").collect()
    }
    assert weeks == {"2024-01-01 00:00:00": 12, "2024-01-08 00:00:00": 9}


def test_hypertable_rejects_phase_misaligned_grains(spark):
    """7 hours divides a week's SECONDS but not its Monday phase shift
    (4 days = 345600 s is not a multiple of 25200 s) — divisibility alone
    would pass and finer buckets would straddle week boundaries."""
    import datetime as dt

    import pytest as _pytest

    from pdf_table_extractor_spark.operators import hypertable

    df = spark.createDataFrame(
        [(1, "t", dt.datetime(2024, 1, 1), 5)], "id long, typ string, ts timestamp, v long"
    )
    with _pytest.raises(ValueError, match="phase"):
        hypertable.hypertable_rollup(df, "ts", ["7 hours", "1 week"], ["typ"], ["v"])


def test_merge_upsert_on_bucketed_snapshot_shuffles_only_the_batch(spark, tmp_path):
    """The incremental-maintenance loop: snapshot bucketed on the key +
    batch_partitions = bucket count => the whole MERGE plan has exactly
    ONE Exchange (the batch repartition, reused by its aggregate AND the
    full-outer join) and the 100TB-side scan feeds the join unshuffled."""
    from pdf_table_extractor_spark.operators import urls
    from pdf_table_extractor_spark.sources import bucketed

    snap = spark.range(0, 200).selectExpr("id AS k", "id * 2 AS v", "id AS ver")
    bucketed.write_bucketed(snap, "mx_snap", key="k", n_buckets=4, path=str(tmp_path / "s"))
    changes = spark.range(100, 300).selectExpr(
        "id AS k", "id * 3 AS v", "id + 1000 AS ver", "id % 2 = 0 AS is_delete"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = urls.merge_upsert(
            bucketed.read_bucketed(spark, "mx_snap"),
            changes,
            key_cols=["k"],
            version_col="ver",
            delete_col="is_delete",
            batch_partitions=4,
        )
        plan = _physical(out)
        n = out.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS mx_snap")
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    # rows: snapshot keys 0..99 untouched (100) + keys 100..299 where the
    # change is odd-keyed upsert (100 survive), even-keyed deletes drop
    assert n == 200
