"""A/B micro-bench: simhash_md5 signature-computation strategies.

Round-3 lesson (VERDICT r3 #1): a "collapse N scans into ONE pass"
rewrite of simhash_md5 used an aggregate whose accumulator was a
28-element array rebuilt by a nested transform per shingle — a 6.6x
measured regression (simhash_near_dups 3.07 s -> 20.26 s at sf0.1),
because Catalyst higher-order functions are interpreted: every
shingle re-allocated the array and re-evaluated 28 lambdas.

This bench pins the numbers so the next one-pass rewrite is
measured BEFORE it ships. Variants (all bit-identical output):

  scalar   — 28 independent scalar long folds (the shipped form)
  onepass  — the regressed array-accumulator aggregate
  pandas   — Arrow-vectorized counter computation over the shingle
             array (numpy popcount per bit)

Usage: python scripts/microbench_simhash.py [sf_dir] [reps]
Never run concurrently with scaling_bench.
"""

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.pandas.functions import pandas_udf

from pyshepseg_spark.operators import dedup
from pyshepseg_spark.operators.skew import spread_small_scan


def simhash_md5_onepass(docs, text_col="text", id_col="doc_id", k=3,
                        hash_bits=28):
    """The round-3 regressed form, kept here as the A/B control."""
    docs = spread_small_scan(docs)
    with_sh = docs.select(
        id_col, dedup.shingles_md5(text_col, k).alias("sh"))
    b = hash_bits
    word = F.expr(f"""
      aggregate(
        zip_with(
          aggregate(sh,
                    array_repeat(0L, {b}),
                    (acc, x) -> transform(
                        acc, (a, i) -> a + (shiftright(x, i) & 1L)
                                       * 2 - 1)),
          sequence(0, {b - 1}),
          (v, bp) -> IF(v > 0, shiftleft(1L, bp), 0L)),
        0L, (a, v) -> a + v)
    """)
    return with_sh.select(id_col, word.alias("simhash"))


def simhash_md5_pandas(docs, text_col="text", id_col="doc_id", k=3,
                       hash_bits=28):
    """Arrow-vectorized counters over the JVM-computed shingle array."""
    docs = spread_small_scan(docs)
    with_sh = docs.select(
        id_col, dedup.shingles_md5(text_col, k).alias("sh"))

    @pandas_udf("long")
    def shb(sh: pd.Series) -> pd.Series:
        out = np.zeros(len(sh), dtype=np.int64)
        shifts = np.arange(hash_bits, dtype=np.uint64)
        for i, arr in enumerate(sh):
            if arr is None or len(arr) == 0:
                continue
            x = np.asarray(arr, dtype=np.uint64)
            bits = ((x[:, None] >> shifts[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = int(((v > 0).astype(np.int64)
                          << np.arange(hash_bits)).sum())
        return pd.Series(out)

    return with_sh.select(id_col, shb(F.col("sh")).alias("simhash"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "8g")
             .appName("microbench_simhash").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    variants = {
        "scalar": dedup.simhash_md5,
        "onepass": simhash_md5_onepass,
        "pandas": simhash_md5_pandas,
    }
    # cross-check bit-identity once
    base = None
    for name, fn in variants.items():
        got = {r["doc_id"]: r["simhash"]
               for r in fn(docs).collect()}
        if base is None:
            base = got
        elif got != base:
            raise SystemExit(f"variant {name} NOT bit-identical")
    print("all variants bit-identical", flush=True)

    results = {}
    for rep in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            fn(docs).agg(F.bit_xor("simhash")).collect()
            results.setdefault(name, []).append(time.time() - t0)
    import json
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"sf_dir": sf_dir, "reps": reps,
                      "median_sec": med, "all": results}))


if __name__ == "__main__":
    main()


def bench_full_query(sf_dir="/root/testdata/sf0.1", reps=3):
    """Phase 2: the FULL simhash_near_dups query shape, per signature
    variant, with/without a materialization barrier before the
    self-join fan-out (no barrier -> Catalyst inlines the signature
    expression into every block key and both join sides; interpreted
    HOFs get no codegen CSE, so the one-pass form re-evaluates ~8x)."""
    import json
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "8g")
             .appName("microbench_simhash_full").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(sigfn, barrier):
        sig = sigfn(docs)
        if barrier:
            sig = sig.localCheckpoint(eager=False)
        t0 = time.time()
        dedup.simhash_near_dups(sig, max_hamming=3, blocks=4,
                                hash_bits=28).count()
        return time.time() - t0

    cases = {
        "scalar": (dedup.simhash_md5, False),
        "scalar+barrier": (dedup.simhash_md5, True),
        "onepass": (simhash_md5_onepass, False),
        "onepass+barrier": (simhash_md5_onepass, True),
        "pandas": (simhash_md5_pandas, False),
        "pandas+barrier": (simhash_md5_pandas, True),
    }
    results = {}
    for rep in range(reps):
        for name, (fn, barrier) in cases.items():
            results.setdefault(name, []).append(run(fn, barrier))
    med = {k: round(sorted(v)[len(v) // 2], 3) for k, v in results.items()}
    print(json.dumps({"phase": "full_query", "median_sec": med,
                      "all": {k: [round(x, 2) for x in v]
                              for k, v in results.items()}}))


