"""Unit tests for the Catalyst expression library (SURVEY §2.8)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from pdf_table_extractor_spark.functions import money, dates, textops, windows


def test_money_paren_sign(spark):
    df = spark.createDataFrame(
        [("PAGAMENTO 1.234,56 (+)",), ("TARIFA 10,00 (-)",), ("no money here",)],
        ["line"],
    )
    out = df.select(money.extract_money_paren_sign(F.col("line")).alias("v")).collect()
    assert [r.v for r in out] == [Decimal("1234.56"), Decimal("-10.00"), None]


def test_money_cd(spark):
    df = spark.createDataFrame([("SAQUE 1.000,00 D",), ("DEP 2,50 C",)], ["line"])
    out = df.select(money.extract_money_cd(F.col("line")).alias("v")).collect()
    assert [r.v for r in out] == [Decimal("-1000.00"), Decimal("2.50")]

    df2 = spark.createDataFrame([("123,45D",), ("9,99C",), ("77,00 C",)], ["line"])
    out2 = df2.select(
        money.extract_money_cd(F.col("line"), at_eol=True, spaced=False).alias("v")
    ).collect()
    assert [r.v for r in out2] == [Decimal("-123.45"), Decimal("9.99"), None]


def test_money_rs_and_trailing(spark):
    df = spark.createDataFrame(
        [("Pix -R$ 150,00",), ("Compra R$ 1.234,56",)], ["line"]
    )
    out = df.select(money.extract_money_rs(F.col("line")).alias("v")).collect()
    assert [r.v for r in out] == [Decimal("-150.00"), Decimal("1234.56")]

    df2 = spark.createDataFrame([("1.234,56-",), ("10,00",)], ["line"])
    out2 = df2.select(
        money.extract_money_trailing_hyphen(F.col("line")).alias("v")
    ).collect()
    assert [r.v for r in out2] == [Decimal("-1234.56"), Decimal("10.00")]


def test_fix_hyphen(spark):
    df = spark.createDataFrame([("1.123,45-",), ("10,00",)], ["v"])
    out = df.select(money.fix_hyphen(F.col("v")).alias("v")).collect()
    assert [r.v for r in out] == ["-1123,45", "10,00"]


def test_sign_by_keywords(spark):
    df = spark.createDataFrame(
        [("BOLETO PAGO", Decimal("10.00")), ("DEPOSITO", Decimal("10.00"))],
        ["desc", "v"],
    )
    out = df.select(
        money.sign_by_keywords(F.col("v"), F.col("desc"), ["boleto", "pix enviado"]).alias("v")
    ).collect()
    assert [r.v for r in out] == [Decimal("-10.00"), Decimal("10.00")]


def test_coalesce_to_date(spark):
    df = spark.createDataFrame(
        [("15/03/2024",), ("2024-03-15",), ("15.03.2024",), ("00/13/2024",)], ["d"]
    )
    out = df.select(dates.coalesce_to_date(F.col("d")).alias("d")).collect()
    expected = dt.date(2024, 3, 15)
    assert [r.d for r in out] == [expected, expected, expected, None]


def test_month_name_map(spark):
    df = spark.createDataFrame([("Janeiro",), ("dezembro",), ("nope",)], ["m"])
    out = df.select(dates.month_name_pt_to_number(F.col("m")).alias("n")).collect()
    assert [r.n for r in out] == [1, 12, None]


def test_textops(spark):
    df = spark.createDataFrame([("  a   b\tc ",)], ["t"])
    assert df.select(textops.squeeze_ws(F.col("t")).alias("t")).first().t == "a b c"
    df2 = spark.createDataFrame([("\"it's\"",)], ["t"])
    assert df2.select(textops.strip_quotes(F.col("t")).alias("t")).first().t == "its"
    df3 = spark.createDataFrame([("ab 12/12 cd 12/12",)], ["t"])
    assert (
        df3.select(
            textops.remove_first_occurrence(F.col("t"), r"\d{2}/\d{2}").alias("t")
        ).first().t
        == "ab  cd 12/12"
    )


def test_skip_word_filter(spark):
    df = spark.createDataFrame([("SALDO ANTERIOR",), ("pix recebido",)], ["t"])
    out = df.filter(textops.skip_word_filter(F.col("t"), ["saldo", "total"])).collect()
    assert [r.t for r in out] == ["pix recebido"]


def test_ffill_bfill_segment(spark):
    rows = [("u", 0, "2024-01-01"), ("u", 1, None), ("u", 2, None), ("u", 3, "2024-01-05"), ("u", 4, None)]
    df = spark.createDataFrame(rows, ["url", "line_no", "d"])
    out = (
        df.withColumn("f", windows.ffill(F.col("d"), ["url"], "line_no"))
        .withColumn("b", windows.bfill(F.col("d"), ["url"], "line_no"))
        .orderBy("line_no")
        .collect()
    )
    assert [r.f for r in out] == ["2024-01-01"] * 3 + ["2024-01-05"] * 2
    assert [r.b for r in out] == ["2024-01-01"] + ["2024-01-05"] * 3 + [None]

    seg = df.withColumn(
        "s", windows.segment_id(F.col("d").isNotNull(), ["url"], "line_no")
    ).orderBy("line_no").collect()
    assert [r.s for r in seg] == [1, 1, 1, 2, 2]


def test_section_gate(spark):
    rows = [("u", i, t) for i, t in enumerate(["junk", "START", "a", "b", "STOP", "junk"])]
    df = spark.createDataFrame(rows, ["url", "line_no", "t"])
    kept = (
        df.withColumn(
            "keep",
            windows.section_gate(
                F.col("t") == "START", F.col("t") == "STOP", ["url"], "line_no"
            ),
        )
        .filter("keep")
        .orderBy("line_no")
        .collect()
    )
    assert [r.t for r in kept] == ["a", "b"]


def test_ascii_fold_full_latin(spark):
    """unidecode-equivalent Latin fold (conversor_itau.py:133): the round-1
    table covered only the pt-BR fixture charset; the fold now spans the
    full Latin repertoire including 1→many letters."""
    from pdf_table_extractor_spark.operators import tables

    rows = [("Dçtöß",), ("Übersicht Ærø",), ("Señor Łódź",), ("crédito",), ("plain",)]
    df = spark.createDataFrame(rows, "s string")
    expected = ["Dctoss", "Ubersicht AEro", "Senor Lodz", "credito", "plain"]
    got = [r.f for r in df.select(tables.ascii_fold(F.col("s")).alias("f")).collect()]
    assert got == expected
    # the pandas-UDF fallback agrees with the JVM fold on Latin input
    got2 = [r.f for r in df.select(textops.transliterate(F.col("s")).alias("f")).collect()]
    assert got2 == expected


def test_sheet_name_rule(spark):
    """Workbook sheet naming (Conversor.py:186): basename, extension
    stripped, truncated to Excel's 31-char limit — python and Catalyst
    variants agree."""
    from pdf_table_extractor_spark.operators.serialize import (
        sheet_name_col,
        sheet_name_for,
    )

    cases = [
        "https://h.example/ofx/000123.ofx",
        "https://h.example/x/" + "a" * 40 + ".pdf",
        "https://h.example/x/noext",
        "https://h.example/x/trailing/",
    ]
    expected = ["000123", "a" * 31, "noext", "trailing"]
    assert [sheet_name_for(c) for c in cases] == expected
    df = spark.createDataFrame([(c,) for c in cases], "u string")
    got = [r.s for r in df.select(sheet_name_col(F.col("u")).alias("s")).collect()]
    assert got == expected


def test_dehyphenate_and_homoglyphs(spark):
    from pdf_table_extractor_spark.functions import textops

    df = spark.createDataFrame(
        [(1, "exam-\nple stays well-known 2023-\n2024 Break-\nUpper state-\n  of")],
        "doc_id long, text string",
    )
    (r,) = df.select(textops.dehyphenate(F.col("text")).alias("d")).collect()
    # joins letter--newline-lowercase (indent absorbed); keeps mid-line
    # hyphens, numeric ranges, uppercase continuations; a lone broken
    # pair with no compound evidence still joins hyphen-less
    assert r["d"] == "example stays well-known 2023-\n2024 Break-\nUpper stateof"

    # compound heuristic: the break hyphen survives when either fragment
    # carries the token's own hyphens
    dfc = spark.createDataFrame(
        [(1, "state-of-the-\nart and state-\nof-the-art end")],
        "doc_id long, text string",
    )
    (rc,) = dfc.select(textops.dehyphenate(F.col("text")).alias("d")).collect()
    assert rc["d"] == "state-of-the-art and state-of-the-art end"

    df2 = spark.createDataFrame(
        [(1, "\u0440\u0430ssword \u043f\u0440\u0438\u0432\u0435\u0442 ok w\u0435b")],
        "doc_id long, text string",
    )
    (h,) = textops.homoglyph_stats(df2).collect()
    assert h["n_mixed_words"] == 2
    assert h["folded_text"] == "password \u043f\u0440\u0438\u0432\u0435\u0442 ok web"

    # in-place fold: whitespace structure (newlines, tabs, runs) of
    # untouched AND touched text round-trips byte-identically
    messy = "clean  text\twith\n\nstructure"
    df3 = spark.createDataFrame(
        [(1, messy), (2, "w\u0435b  \n\tr\u0430w")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["folded_text"] for r in textops.homoglyph_stats(df3).collect()}
    assert got[1] == messy
    assert got[2] == "web  \n\traw"


def test_word_pages_parity_and_poison_rollback(spark):
    """word_pages (the packed post-UDF exchange shape) must explode to
    exactly word_rows' rows, and roll back whole poison documents the
    same way."""
    from pdf_table_extractor_spark.operators import blocks

    good = b"P 1\nW 10.0 20.0 5.0 6.0 abc\nW 80.0 90.0 5.0 6.0 de f\nP 2\nW 500.0 510.0 7.0 8.0 x"
    poison = b"P 1\nW NOTANUM 20.0 5.0 6.0 tok"
    df = spark.createDataFrame(
        [("u1", bytearray(good)), ("u2", bytearray(poison)), ("u3", None)],
        "url string, html binary",
    )
    flat = {
        (r["url"], r["page_no"], r["text"], r["x0"], r["top"])
        for r in blocks.word_rows(df).collect()
    }
    packed = blocks.word_pages(df).collect()
    exploded = {
        (r["url"], r["page_no"], t, x, y)
        for r in packed
        for x, y, t in zip(r["x0s"], r["tops"], r["texts"])
    }
    assert exploded == flat
    assert {r["url"] for r in packed} == {"u1"}
    assert {(r["url"], r["page_no"]) for r in packed} == {("u1", 1), ("u1", 2)}
    # word with embedded spaces survives the pack (split-limit semantics)
    assert ("u1", 1, "de f", 80.0, 5.0) in exploded
