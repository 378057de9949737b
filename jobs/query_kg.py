"""Run a SPARQL query string against a materialized KG store.

The consumer half of the spark-submit surface: ``build_kg.py`` writes
the store, this reads it back and executes SELECT / CONSTRUCT / ASK /
DESCRIBE through the text front-end (operators/sparql.py) — including
GRAPH-scoped queries when the chosen table carries a ``graph`` column.

Usage:
  spark-submit --py-files pawpaw_spark.zip jobs/query_kg.py \\
      --store /out/kg --query 'SELECT ?s (COUNT(*) AS ?n) WHERE \\
      { ?s REFERENCES ?t } GROUP BY ?s ORDER BY DESC(?n) LIMIT 10'

  --table picks which materialized edge table to query (edges,
  edges_canonical, edges_fused, edges_owl — whatever the build wrote);
  --output writes the full result as parquet instead of printing the
  first --limit rows as JSON lines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True, help="build_kg.py output dir")
    p.add_argument("--query", required=True, help="SPARQL query string")
    p.add_argument(
        "--table", default="edges",
        help="edge table under the store (edges, edges_canonical, "
        "edges_fused, edges_owl, ...)",
    )
    p.add_argument(
        "--output", default=None,
        help="write the FULL result as parquet here instead of printing",
    )
    p.add_argument("--limit", type=int, default=20,
                   help="rows printed without --output")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pawpaw_spark.session import get_spark
    from pawpaw_spark.operators.sparql import sparql

    spark = get_spark(app_name="query_kg", master=args.master)
    path = f"{args.store}/{args.table}"
    edges = spark.read.parquet(path)
    cols = ["subj", "pred", "obj"] + (
        ["graph"] if "graph" in edges.columns else []
    )
    res = sparql(edges.select(*cols), args.query)
    if args.output:
        res.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"rows": res.count(), "output": args.output}))
    else:
        rows = res.limit(args.limit).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
        print(
            json.dumps({"printed": len(rows), "columns": res.columns}),
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
