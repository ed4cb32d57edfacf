"""Emulate the driver's correctness gate locally: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir, compare row count,
column names/types, and order-insensitive values."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from blacklab_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    spark = get_spark("local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = norm(fn(spark, SF_DIR).toPandas())
        except Exception as e:
            results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"
            print(f"{name:24s} {results[name]}")
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(got)})"
            print(f"{name:24s} {results[name]}  [{time.time()-t0:.1f}s]")
            continue
        try:
            exp = norm(con.execute(oracles[name]).df())
        except Exception as e:
            results[name] = f"DUCKDB ERROR: {type(e).__name__}: {str(e)[:300]}"
            print(f"{name:24s} {results[name]}")
            continue
        status = []
        if list(got.columns) != list(exp.columns):
            status.append(f"COLS got={list(got.columns)} exp={list(exp.columns)}")
        elif len(got) != len(exp):
            status.append(f"ROWS got={len(got)} exp={len(exp)}")
        else:
            mismatch = None
            for c in got.columns:
                a, b = got[c].values, exp[c].values
                if pd.api.types.is_float_dtype(got[c]):
                    eq = np.allclose(a.astype(float), b.astype(float), atol=1e-9, equal_nan=True)
                else:
                    eq = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
                if not eq:
                    idx = 0
                    for i in range(len(a)):
                        if str(a[i]) != str(b[i]):
                            idx = i
                            break
                    mismatch = f"VAL col={c} row{idx}: got={a[idx]} exp={b[idx]}"
                    break
            if mismatch:
                status.append(mismatch)
        results[name] = "OK" if not status else "; ".join(status)
        print(f"{name:24s} {results[name]}  rows={len(got)}  [{time.time()-t0:.1f}s]")

    n_ok = sum(1 for v in results.values() if v == "OK")
    print(f"\n{n_ok}/{len(results)} OK")
    spark.stop()


if __name__ == "__main__":
    main()
