"""Local simulation of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()`` via
DuckDB — row count, schema, and order-insensitive value hash (columns
sorted by name, rows sorted by all columns).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            pdf[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            pdf[c] = s.apply(
                lambda v: tuple(v.tolist())
                if isinstance(v, np.ndarray)
                else (tuple(v) if isinstance(v, list) else v)
            )
    pdf = pdf.sort_values(by=list(pdf.columns), kind="stable").reset_index(drop=True)
    return pdf


def value_hash(pdf: pd.DataFrame) -> str:
    canon_rows = canon(pdf)
    # No float_format: the driver's canonicalizer does not normalize dtype
    # repr, so int64 1 vs float64 1.0 must hash-diverge here too (this
    # masked the events_sessionize HUGEINT->float64 red row in r01/r02).
    blob = canon_rows.to_csv(index=False).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from bloomine_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16,
                      app_name="correctness-check")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK-ERROR: {e}"
            print(f"{name:40s} SPARK-ERROR {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            results[name] = f"rows-only: {len(got)} rows"
            print(f"{name:40s} rows-only   rows={len(got):7d}  {dt:5.1f}s")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE-ERROR: {e}"
            print(f"{name:40s} ORACLE-ERROR {e}")
            continue
        rc = len(got) == len(want)
        sc = sorted(got.columns) == sorted(want.columns)
        vh = value_hash(got) == value_hash(want) if rc and sc else False
        status = "OK" if (rc and sc and vh) else "MISMATCH"
        results[name] = status
        print(
            f"{name:40s} {status:9s} rows={len(got):6d}/{len(want):<6d} "
            f"schema={'ok' if sc else sorted(got.columns)} hash={'ok' if vh else 'DIFF'}  {dt:5.1f}s"
        )
        if status == "MISMATCH" and rc and sc:
            g, w = canon(got), canon(want)
            diff = g.compare(w) if g.shape == w.shape else None
            if diff is not None and len(diff):
                print(diff.head(5))
            else:
                print("  got:", g.head(3).to_dict("records"))
                print("  want:", w.head(3).to_dict("records"))

    spark.stop()
    bad = [k for k, v in results.items() if v not in ("OK",) and not str(v).startswith("rows-only")]
    print(f"\n{len(results) - len(bad)}/{len(results)} clean; failing: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
