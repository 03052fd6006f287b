"""Local stand-in for the driver's correctness gate: run every queries()
entry under Spark AND its oracle_sql() under DuckDB on the same parquet dir,
compare row count, column names, and sorted values (exact, with a float
near-miss report). Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

# __spark_entry__ keys its materialized pure-Python oracles by
# CRAWLSPARK_SF_DIR at import time; exporting the sf being checked BEFORE
# the import is what makes a cross-scale run (e.g. sf0.001) regenerate the
# materialized expectations from the same tables Spark reads, instead of
# comparing an sf0.001 Spark result against sf0.01 expectations.
if len(sys.argv) > 1:
    os.environ["CRAWLSPARK_SF_DIR"] = sys.argv[1].rstrip("/")

import __spark_entry__ as entry_mod  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    out = df.sort_values(by=list(df.columns), na_position="first",
                         kind="mergesort").reset_index(drop=True)
    return out


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} "
                        f"oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = pd.to_numeric(sv, errors="coerce").to_numpy(dtype=float)
            b = pd.to_numeric(ov, errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(a) & np.isnan(b)
            eq = (a == b) | both_nan
            if not eq.all():
                bad = int((~eq).sum())
                worst = np.nanmax(np.abs(np.where(eq, 0, a - b)))
                problems.append(f"col {c}: {bad} float mismatches, "
                                f"max |Δ|={worst:g}")
        else:
            sa = sv.astype(str).where(sv.notna(), "<NULL>")
            oa = ov.astype(str).where(ov.notna(), "<NULL>")
            neq = (sa != oa)
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"spark={sa[i]!r} oracle={oa[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark("check_oracle", cores=8, driver_mem="10g")
    spark.sparkContext.setLogLevel("ERROR")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: "
                  f"{str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: "
                  f"{str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"   - {p}")
        else:
            n_pass += 1
            print(f"ok   {name}: {len(sdf)} rows match "
                  f"({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
