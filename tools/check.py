"""Local correctness harness mimicking the driver's t2 gate.

Runs every queries() entry at a given sf_dir, runs the matching
oracle_sql() through DuckDB over the same parquet (tables registered as
views), and compares: row count, column names, and an order-insensitive
value comparison (columns sorted by name, rows sorted by all columns,
exact equality — floats must match bitwise, which the golden queries
guarantee by construction).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # unify integer widths / nullable ints
        if str(df[c].dtype) in ("int8", "int16", "int32", "Int8", "Int16", "Int32", "Int64"):
            df[c] = df[c].astype("int64", errors="ignore")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.isna() & bv.isna()) | (av == bv)
                neq = int((~eq).sum())
            except Exception as e:
                problems.append(f"col {c}: compare error {e}")
                continue
            if neq:
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c}: {neq} mismatched values; first at row {idx}: "
                    f"spark={av[idx]!r} duck={bv[idx]!r} (dtypes {av.dtype}/{bv.dtype})"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from hydraide_spark.session import get_spark

    spark = get_spark("check", master="local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)

    qs = entrymod.queries()
    if only:
        unknown = only - set(qs)
        if unknown:
            print("unknown queries:", sorted(unknown))
            return 2
        qs = {n: f for n, f in qs.items() if n in only}
    oracles = entrymod.oracle_sql()
    failed, no_oracle = [], []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failed.append(name)
            continue
        if name not in oracles:
            no_oracle.append(name)
            print(f"  ok {name}: rows={len(spdf)} (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            failed.append(name)
            continue
        problems = compare(name, spdf, dpdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"  ok {name}: rows={len(spdf)} match [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(qs) - len(failed)}/{len(qs)} ok; {len(failed)} failed"
        + (f"; rows-only: {no_oracle}" if no_oracle else "")
    )
    if failed:
        print("failed:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
