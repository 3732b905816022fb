"""Local correctness harness — mimics the driver's DuckDB-oracle check.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at a given
scale factor, compares row count, column names (sorted), and values
(order-insensitive; np.allclose for floats). Prints one line per query.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    if len(sdf) != len(odf):
        return f"ROWS {len(sdf)} vs {len(odf)}"
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return f"COLS {scols} vs {ocols}"
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    o = odf[scols].sort_values(scols).reset_index(drop=True)
    for c in scols:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            if not np.allclose(
                sv.astype("float64"), ov.astype("float64"), equal_nan=True, atol=1e-9
            ):
                bad = np.where(
                    ~np.isclose(sv.astype("float64"), ov.astype("float64"), equal_nan=True)
                )[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} {sv[bad]} vs {ov[bad]}"
        else:
            if not np.array_equal(sv.astype(str), ov.astype(str)):
                bad = np.where(sv.astype(str) != ov.astype(str))[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} {sv[bad]} vs {ov[bad]}"
        if str(sv.dtype) != str(ov.dtype):
            # dtype note only (driver may compare schemas more strictly)
            pass
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from vinum_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    from vinum_spark.inventory import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:32s} SPARK-ERROR {type(e).__name__}: {str(e).splitlines()[0][:120]}")
            failures += 1
            continue
        if name in oracles:
            try:
                odf = con.execute(oracles[name]).df()
            except Exception as e:
                print(f"{name:32s} ORACLE-ERROR {str(e).splitlines()[0][:120]}")
                failures += 1
                continue
            verdict = compare(sdf, odf)
        else:
            verdict = f"rows-only ({len(sdf)} rows)"
        dt = time.time() - t0
        status = verdict if verdict.startswith(("OK", "rows-only")) else f"FAIL {verdict}"
        if status.startswith("FAIL"):
            failures += 1
        print(f"{name:32s} {status}  [{dt:.1f}s]")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
