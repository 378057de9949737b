"""Driver-contract self-check: run every queries() entry against its
oracle_sql() at a given SF and compare rows/schema/values the way the
driver does (columns sorted by name, rows sorted, stringified values).

Usage: python jobs/check_contract.py [--out FILE] [sf_dir] [key ...]

--out writes the per-query results as JSON in the driver's
CORRECTNESS_r{N}.json shape, so a green run at a second scale factor is
a committable artifact (CHECK_sf0.01.json), not a code comment.
"""

from __future__ import annotations

import json
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
    argv = list(sys.argv[1:])
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: check_contract.py [--out FILE] [sf_dir] [key ...]")
            return 2
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from pawpaw_spark.session import get_spark

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')"
        )
    keys = argv[1:] or list(E.queries())
    oracles = E.oracle_sql()
    n_bad = 0
    results: dict[str, dict] = {}
    from pawpaw_spark.operators.dedup import release_session_caches

    for k in keys:
        try:
            sdf = E.queries()[k](spark, sf).toPandas()
            # release operator caches (gram/signature tables) so earlier
            # queries' persisted intermediates don't squeeze later ones
            release_session_caches(spark)
            odf = con.sql(oracles[k]).df()
            a, b = norm(sdf), norm(odf)
            rows = len(a) == len(b)
            cols = list(a.columns) == list(b.columns)
            vals = rows and cols and a.equals(b)
            results[k] = {
                "rows_match": rows, "schema_match": cols, "hash_match": bool(vals),
                "spark_rows": len(a), "oracle_rows": len(b), "err": None,
            }
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
            results[k] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"{type(exc).__name__}: {exc}",
            }
            print(f"ERR  {k}: {type(exc).__name__}: {exc}")
    print(f"{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf, "results": results}, f, indent=2)
        print(f"wrote {out_path}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
