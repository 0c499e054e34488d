#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual contract
queries with the noop sink and dumps .explain("formatted") plans.

Usage:
  python bench_extra.py [query ...]        # default: the r06 targets
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
       SPARK_GRAFT_CPUS (default 32),
       BENCH_EXTRA_REPS (default 3), BENCH_EXTRA_WARMUPS (default 1),
       BENCH_EXTRA_PLAN_DIR (default: skip plan dump),
       BENCH_EXTRA_PLAN_SUFFIX (e.g. "before"/"after")

Prints one JSON line: {"queries": {name: {"median":…, "min":…,
"reps": […]}}, "sf_dir": …}.  This file is NOT the frozen driver
bench (bench.py) — it exists so optimization work can isolate one
query at a time per the measure-first discipline.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_TARGETS = [
    "cosine_near_dups", "simhash_near_dups", "ngram_jaccard",
    "knn_points", "minhash_near_dups", "tpch_q5ish",
    "embedding_near_dups_lsh", "quality_full", "fingerprint",
    "a5_stats_finalize", "ivf_topk", "tpch_q3ish", "embedding_topk",
    "point_in_segment", "w1_dense_relabel", "w2_prefix_offsets",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    warmups = int(os.environ.get("BENCH_EXTRA_WARMUPS", "1"))
    plan_dir = os.environ.get("BENCH_EXTRA_PLAN_DIR", "")
    suffix = os.environ.get("BENCH_EXTRA_PLAN_SUFFIX", "before")

    names = sys.argv[1:] or DEFAULT_TARGETS

    from pyshepseg_spark.session import get_spark, warm_python_workers
    spark = get_spark(app_name="bench_extra",
                      master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    warm_python_workers(spark)

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    out = {}
    for name in names:
        fn = qs[name]
        if plan_dir:
            import contextlib
            import io
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir,
                                   f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        for _ in range(warmups):
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = {"median": round(statistics.median(ts), 3),
                     "min": round(min(ts), 3), "reps": ts}
        print(f"# {name}: median={out[name]['median']} "
              f"min={out[name]['min']} reps={ts}", file=sys.stderr)
    print(json.dumps({"queries": out, "sf_dir": sf_dir,
                      "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
