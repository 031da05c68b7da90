"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
twin on DuckDB over the same parquet files, then compares row count, sorted
column names, and order-insensitive values (exact for ints/strings, 1e-6
relative for floats). Usage::

    python tools/check_contract.py [name ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # Decimal / date objects → canonical strings
            df[c] = df[c].map(lambda v: None if v is None else str(v))
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")  # unify int32/int64 across engines
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def scalar_violations(df) -> list[str]:
    """Names of output columns with array/map/struct types — the driver's
    correctness harness cannot canonicalize these (pandas sort raises
    ``TypeError: unhashable type``), so contracts must emit scalars only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(sdf) != len(odf):
        errs.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return errs
    if errs:
        return errs
    s, o = normalize(sdf.copy()), normalize(odf.copy())
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sv = pd.to_numeric(sv, errors="coerce").astype("float64")
            ov = pd.to_numeric(ov, errors="coerce").astype("float64")
            bad = ~(
                (sv.isna() & ov.isna())
                | ((sv - ov).abs() <= 1e-6 + 1e-6 * ov.abs())
            )
        else:
            bad = ~((sv.isna() & ov.isna()) | (sv == ov))
        if bad.any():
            i = bad.idxmax()
            errs.append(
                f"value mismatch col={c} ({int(bad.sum())} rows), first at sorted row {i}: "
                f"spark={s[c][i]!r} oracle={o[c][i]!r}"
            )
    return errs


def main() -> int:
    import os
    import time

    import __spark_entry__ as entrymod
    from pdf_table_extractor_spark.session import build_spark

    show_times = os.environ.get("SPARK_GRAFT_CONTRACT_TIMES") == "1"
    only = set(sys.argv[1:])
    spark = build_spark(app_name="check-contract", master="local[8]", shuffle_partitions=8)
    con = duck_con()
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    times: list[tuple[float, str]] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = fn(spark, SF_DIR)
            bad_cols = scalar_violations(res)
            if bad_cols:
                # Driver-faithful: its pandas canonicalizer sorts result
                # columns and dies on unhashable array/map/struct cells
                # (round-4 q_html_tables red row). Fail here, loudly.
                print(f"FAIL {name}: non-scalar output columns {bad_cols}")
                n_fail += 1
                continue
            sdf = res.toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            n_fail += 1
            print(f"FAIL {name}:")
            for e in errs:
                print(f"     {e}")
        else:
            dt = time.perf_counter() - t0
            times.append((dt, name))
            print(f"ok   {name}: {len(sdf)} rows match"
                  + (f" [{dt:.1f}s]" if show_times else ""))
    if show_times and times:
        print("\nslowest queries:")
        for dt, name in sorted(times, reverse=True)[:10]:
            print(f"  {dt:6.1f}s  {name}")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
