#!/usr/bin/env python
"""Build the --py-files archive for cluster submission.

  python jobs/package.py [--out pawpaw_spark.zip]
  spark-submit --py-files pawpaw_spark.zip jobs/build_kg.py ...

Verified in-sandbox: the job runs from OUTSIDE the repo with only the
zip on the executor python path (no repo checkout on workers), which is
the cluster deployment shape the north rule describes.
"""

from __future__ import annotations

import argparse
import os
import zipfile


def build(out: str) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, files in os.walk(os.path.join(root, "pawpaw_spark")):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    z.write(p, os.path.relpath(p, root))
                    n += 1
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="pawpaw_spark.zip")
    args = ap.parse_args()
    n = build(args.out)
    print(f"{args.out}: {n} modules")
