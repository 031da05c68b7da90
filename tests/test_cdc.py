"""Content-defined chunking (dedup.cdc_chunks): bit-exact vs a pure
python replay, edit locality (a prefix insertion only reshapes chunks
before the first re-synchronized boundary), and edge cases (short /
empty docs)."""

from __future__ import annotations

import hashlib

from pdf_table_extractor_spark.operators import dedup

W, MB = 8, 5  # window, mask_bits (mask 32)


def _py_chunks(text: str) -> list[str]:
    canon = " ".join(text.lower().split())
    n = len(canon)
    ends = [
        i
        for i in range(W, n + 1)
        if int(hashlib.md5(canon[i - W : i].encode()).hexdigest()[:8], 16) % (1 << MB)
        == 0
    ]
    if not ends or ends[-1] != n:
        ends.append(n)
    bounds = [0] + ends
    return [canon[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]


def _spark_chunks(spark, texts: list[str]) -> dict[int, list[str]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = dedup.cdc_chunks(df, window=W, mask_bits=MB).collect()
    out: dict[int, list[tuple[int, str, int]]] = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_md5"], r["chunk_len"])
        )
    return {k: [(m, ln) for _, m, ln in sorted(v)] for k, v in out.items()}


def test_matches_pure_python_replay(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog again and again " * 20,
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 15,
        "short",
        "",
        "x" * 7,  # below the gear window: one whole-text chunk
    ]
    got = _spark_chunks(spark, texts)
    for i, t in enumerate(texts):
        exp = [
            (hashlib.md5(c.encode()).hexdigest(), len(c)) for c in _py_chunks(t)
        ]
        assert got.get(i, []) == exp, f"doc {i} chunks diverge"


def test_edit_locality_prefix_insertion(spark):
    base = (
        "the canonical storage dedup property of content defined chunking "
        "is that a local edit reshapes only the chunks it touches " * 30
    )
    edited = "zq9 inserted prefix " + base
    got = _spark_chunks(spark, [base, edited])
    md5_base = [m for m, _ in got[0]]
    md5_edit = {m for m, _ in got[1]}
    # after the first boundary the gear re-synchronizes: every base chunk
    # except (at most) the first must reappear verbatim in the edited doc
    assert len(md5_base) > 5, "fixture must produce several chunks"
    missing = [m for m in md5_base[1:] if m not in md5_edit]
    assert not missing, f"{len(missing)} post-boundary chunks failed to resync"


def test_chunks_reassemble_exactly(spark):
    text = "reassembly check with deterministic content " * 25
    canon = " ".join(text.lower().split())
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        dedup.cdc_chunks(df, window=W, mask_bits=MB).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert sum(r["chunk_len"] for r in rows) == len(canon)
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))


def test_xxhash64_gear_same_invariants(spark):
    text = "fast gear path keeps every chunking invariant intact " * 30
    canon = " ".join(text.lower().split())
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        dedup.cdc_chunks(df, window=W, mask_bits=MB, hash_fn="xxhash64").collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert rows, "must produce chunks"
    assert sum(r["chunk_len"] for r in rows) == len(canon)
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    import pytest

    with pytest.raises(ValueError):
        dedup.cdc_chunks(df, hash_fn="sha1")
