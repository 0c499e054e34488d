#!/usr/bin/env python
"""A/B output equivalence harness for optimization work.

dump mode: run the named contract queries and save their full
output (sorted rows) to <dir>/<sf>/<query>.pkl.
check mode: re-run them and compare against the saved pickles
EXACTLY (same columns, dtypes, and cell values; float columns
compared bitwise via np.array_equal with NaN-equality).

Usage:
  python scripts/ab_outputs.py dump  /tmp/ab_before sf0.001 q1 q2 ...
  python scripts/ab_outputs.py check /tmp/ab_before sf0.001 q1 q2 ...
SPARK_GRAFT_CPUS controls core count (default 32).
"""
from __future__ import annotations

import os
import pickle
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(list(pdf.columns),
                           ignore_index=True)


def main():
    mode, out_dir, sf_name = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sf_dir = f"/root/testdata/{sf_name}"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyshepseg_spark.session import get_spark
    spark = get_spark(app_name=f"ab_{mode}",
                      master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    d = os.path.join(out_dir, sf_name)
    os.makedirs(d, exist_ok=True)
    failures = []
    for name in names:
        pdf = normalize(qs[name](spark, sf_dir).toPandas())
        path = os.path.join(d, f"{name}.pkl")
        if mode == "dump":
            with open(path, "wb") as f:
                pickle.dump(pdf, f)
            print(f"dumped {sf_name}/{name}: {len(pdf)} rows")
            continue
        with open(path, "rb") as f:
            want = pickle.load(f)
        ok = list(pdf.columns) == list(want.columns) \
            and len(pdf) == len(want)
        if ok:
            for c in pdf.columns:
                a = pdf[c].to_numpy()
                b = want[c].to_numpy()
                if not np.array_equal(a, b):
                    # exact bitwise check with NaN==NaN for floats
                    if (np.issubdtype(a.dtype, np.floating)
                            and np.issubdtype(b.dtype, np.floating)
                            and np.array_equal(a, b,
                                               equal_nan=True)):
                        continue
                    ok = False
                    print(f"  col {c} differs")
                    break
        status = "OK" if ok else "MISMATCH"
        if not ok:
            failures.append(f"{sf_name}/{name}")
        print(f"check {sf_name}/{name}: {status} "
              f"({len(pdf)} vs {len(want)} rows)")
    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL OK" if mode == "check" else "DUMP DONE")


if __name__ == "__main__":
    main()
