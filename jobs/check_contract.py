"""Driver-contract self-check: run every queries() entry against its
oracle_sql() at a given SF and compare rows/schema/values the way the
driver does (columns sorted by name, rows sorted, stringified values).

Usage: python jobs/check_contract.py [sf_dir] [key ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(df):
    import pandas as pd

    df = df[sorted(df.columns)]
    s = df.astype(str)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from pawpaw_spark.session import get_spark

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')"
        )
    keys = sys.argv[2:] or list(E.queries())
    oracles = E.oracle_sql()
    n_bad = 0
    for k in keys:
        try:
            sdf = E.queries()[k](spark, sf).toPandas()
            odf = con.sql(oracles[k]).df()
            a, b = norm(sdf), norm(odf)
            rows = len(a) == len(b)
            cols = list(a.columns) == list(b.columns)
            vals = rows and cols and a.equals(b)
            status = "OK  " if (rows and cols and vals) else "FAIL"
            if status == "FAIL":
                n_bad += 1
            print(
                f"{status} {k}: rows {len(a)}/{len(b)} cols_match={cols} "
                f"vals_match={vals}"
            )
            if status == "FAIL" and rows and cols:
                diff = a.compare(b) if len(a) == len(b) else None
                if diff is not None and not diff.empty:
                    print(diff.head(5))
            elif status == "FAIL":
                print("  spark cols:", list(a.columns))
                print("  oracle cols:", list(b.columns))
        except Exception as exc:  # noqa: BLE001
            n_bad += 1
            print(f"ERR  {k}: {type(exc).__name__}: {exc}")
    print(f"{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
