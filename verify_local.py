"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against its ``oracle_sql()``
via DuckDB — row count, column names, and order-insensitive value hash.

Usage: python verify_local.py [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from tsmp_spark.operators.cache import release_caches
from tsmp_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> int:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if d[c].dtype == object:
            d[c] = d[c].astype(str)
    rows = sorted(map(tuple, d.astype(str).itertuples(index=False, name=None)))
    return hash(tuple(rows))


def main() -> int:
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    spark = get_spark(cpus=16)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        finally:
            release_caches()  # drop operator-pinned intermediates per query
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            if len(got) == 0:
                failures.append(name)
                print(f"FAIL {name}: 0 rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        ok = True
        if len(got) != len(exp):
            ok = False
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
        elif sorted(got.columns) != sorted(exp.columns):
            ok = False
            print(f"FAIL {name}: cols spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            ok = False
            print(f"FAIL {name}: value hash mismatch")
            cols = sorted(got.columns)
            g = got.sort_values(cols).reset_index(drop=True)
            e = exp.sort_values(cols).reset_index(drop=True)
            for c in cols:
                same = (g[c].astype(str) == e[c].astype(str)).all()
                if not same:
                    diffmask = g[c].astype(str) != e[c].astype(str)
                    print(f"  col {c}: {diffmask.sum()} diffs")
                    print(pd.concat([g[diffmask].head(3), e[diffmask].head(3)], axis=1))
        if ok:
            print(f"ok   {name}: {len(got)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
