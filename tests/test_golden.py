"""Golden byte-identity: engine CSV bytes per url == pure-pandas oracle.

This is the BASELINE.json correctness gate: "byte-identical extracted text
per url". 20 docs per profile (t1 smoke scale, FIXTURES.md §2).
"""

from __future__ import annotations

import pytest

from pdf_table_extractor_spark import synth
from pdf_table_extractor_spark.plans.extract import extract
from pdf_table_extractor_spark.plans.profiles import PROFILES
from tests import oracle

N_PER_PROFILE = 20


@pytest.fixture(scope="module")
def corpus():
    profiles = list(PROFILES)
    n = N_PER_PROFILE * len(profiles)
    # noise_frac=0 here: the noise passthrough has its own test below
    return synth.synth_pandas(round(n / 0.9), profiles=profiles, noise_frac=0.1)


@pytest.fixture(scope="module")
def extracted(spark, corpus):
    pages = spark.createDataFrame(corpus)
    rows = extract(pages, num_partitions=4).collect()
    return {r.url: r for r in rows}


def test_all_urls_accounted(corpus, extracted):
    assert set(corpus["url"]) == set(extracted)


@pytest.mark.parametrize("profile", list(PROFILES))
def test_byte_identity(profile, corpus, extracted):
    docs = corpus[corpus["url"].str.contains(f"/{profile}/")]
    assert len(docs) >= 10
    n_checked = 0
    for _, doc in docs.iterrows():
        golden = oracle.golden(profile, doc["text"], bytes(doc["html"]))
        got = extracted[doc["url"]]
        if golden is None:
            assert got.csv is None or got.n_rows == 0, doc["url"]
        else:
            assert got.csv is not None, f"{doc['url']}: engine produced nothing"
            assert bytes(got.csv) == golden, (
                f"{doc['url']}: bytes differ\n"
                f"--- engine ---\n{bytes(got.csv)[:600]!r}\n"
                f"--- golden ---\n{golden[:600]!r}"
            )
            n_checked += 1
    assert n_checked >= 5  # at least some non-empty docs per profile


def test_c6_password_docs_present_and_extracted(corpus, extracted):
    """At least one c6 doc is ENC1-locked (conversor_c6.py senha behavior)
    and the engine still extracts it byte-identically (covered by
    test_byte_identity — here we assert the lock actually fired)."""
    locked = corpus[corpus["url"].str.contains("/c6/") & corpus["text"].str.startswith("ENC1:")]
    assert len(locked) >= 1
    for url in locked["url"]:
        r = extracted[url]
        assert r.n_rows > 0 and r.csv is not None, f"{url}: locked doc not extracted"


def test_noise_passthrough(corpus, extracted):
    noise = corpus[corpus["lang"] != "pt"]
    assert len(noise) > 0
    for url in noise["url"]:
        r = extracted[url]
        assert r.profile == "" and r.n_rows == 0 and r.csv is None


def test_extract_degenerate_rows(spark):
    """Crawl reality: null/empty text or html must flow through to the
    sentinel (or extract normally), never crash a 100-TB job."""
    import pandas as pd

    from pdf_table_extractor_spark.plans.extract import extract

    rows = pd.DataFrame(
        {
            "url": [
                "https://h.example/cef/000001",      # known profile, null text
                "https://h.example/banestes/000002",  # layout profile, null html
                "https://h.example/unknown/000003",   # noise
                "https://h.example/cef/000004",       # empty text
            ],
            "warc_ts": pd.Timestamp("2024-01-01"),
            "html": [None, None, b"", b""],
            "text": [None, "x", None, ""],
            "lang": "pt",
        }
    )
    out = {r.url: r for r in extract(spark.createDataFrame(rows), num_partitions=4).collect()}
    assert len(out) == 4  # every url accounted exactly once
    for r in out.values():
        assert r.n_rows == 0 and r.csv is None
    assert out["https://h.example/unknown/000003"].profile == ""
