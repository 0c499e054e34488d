"""A/B micro-bench: minhash_signatures_md5 computation strategies
(VERDICT r4 #2).

The shipped signature is ONE interpreted-HOF aggregate whose
accumulator is the 32-element running-minimum array — the exact form
class behind the round-3 simhash regression: minhash_lsh_pairs fans
the signature expression into the band posexplode and BOTH self-join
sides (CollapseProject re-inlines it; interpreted HOFs get no codegen
CSE), so the signature is re-evaluated ~3-4x per doc.

Variants (all bit-identical minima — every md5-28bit hash and
(a*h+b) % P31 stays < 2^59, exact in int64):

  onepass        — the shipped array-accumulator aggregate
  scalar         — 32 independent scalar long folds (the simhash fix)
  transform_min  — 32x array_min(transform(...)) scans
  pandas         — Arrow-vectorized numpy minima over the shingles

Phase 2 (bench_full_query) runs the REAL fan-out shape — the
minhash_near_dups contract query — per variant, with and without a
localCheckpoint materialization barrier before the LSH fan-out.

Usage: python scripts/microbench_minhash.py [sf_dir] [reps]
       python -c "from scripts.microbench_minhash import \
           bench_full_query; bench_full_query()"
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
from pyshepseg_spark.operators.dedup import P31
from pyshepseg_spark.operators.skew import spread_small_scan


def _with_shingles(docs, text_col, id_col, k):
    docs = spread_small_scan(docs)
    return docs.select(
        id_col, dedup.shingles_md5(text_col, k).alias("sh"))


def minhash_scalar(docs, text_col="text", id_col="doc_id",
                   num_hashes=32, k=5, seed=42):
    """num_hashes independent scalar folds: each hash's minimum is a
    plain long accumulator (least(acc, (x*a+b) % P31)) — the form
    that fixed the simhash fan-out regression."""
    with_sh = _with_shingles(docs, text_col, id_col, k)
    coeffs = dedup.minhash_coeffs(num_hashes, seed)
    folds = [
        F.expr(f"aggregate(sh, {P31}L, "
               f"(acc, x) -> least(acc, (x * {a}L + {b}L) % {P31}L))")
        for a, b in coeffs
    ]
    return with_sh.select(
        id_col, F.array(*folds).alias("minhash"))


def minhash_transform_min(docs, text_col="text", id_col="doc_id",
                          num_hashes=32, k=5, seed=42):
    """num_hashes array_min(transform(...)) scans over the shared
    shingle array."""
    with_sh = _with_shingles(docs, text_col, id_col, k)
    coeffs = dedup.minhash_coeffs(num_hashes, seed)
    mins = [
        F.expr(f"array_min(transform(sh, "
               f"x -> (x * {a}L + {b}L) % {P31}L))")
        for a, b in coeffs
    ]
    return with_sh.select(
        id_col, F.array(*mins).alias("minhash"))


def minhash_pandas(docs, text_col="text", id_col="doc_id",
                   num_hashes=32, k=5, seed=42):
    """Arrow-vectorized minima over the JVM-computed shingle array
    (exact: products < 2^59 fit int64)."""
    with_sh = _with_shingles(docs, text_col, id_col, k)
    coeffs = dedup.minhash_coeffs(num_hashes, seed)
    a = np.array([c[0] for c in coeffs], dtype=np.int64)
    b = np.array([c[1] for c in coeffs], dtype=np.int64)

    @pandas_udf("array<long>")
    def sig(sh: pd.Series) -> pd.Series:
        out = []
        for arr in sh:
            if arr is None or len(arr) == 0:
                out.append([P31] * num_hashes)
                continue
            x = np.asarray(arr, dtype=np.int64)
            vals = (x[None, :] * a[:, None] + b[:, None]) % P31
            out.append(vals.min(axis=1).tolist())
        return pd.Series(out)

    return with_sh.select(id_col, sig(F.col("sh")).alias("minhash"))


VARIANTS = {
    "onepass": dedup.minhash_signatures_md5,
    "scalar": minhash_scalar,
    "transform_min": minhash_transform_min,
    "pandas": minhash_pandas,
}


def _session(name):
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "8g")
             .appName(name).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = _session("microbench_minhash")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # cross-check bit-identity once (k=3 — the contract-query config)
    base = None
    for name, fn in VARIANTS.items():
        got = {r["doc_id"]: tuple(r["minhash"])
               for r in fn(docs, num_hashes=32, k=3).collect()}
        if base is None:
            base = got
        elif got != base:
            raise SystemExit(f"variant {name} NOT bit-identical")
    print("all variants bit-identical", flush=True)

    results = {}
    for rep in range(reps):
        for name, fn in VARIANTS.items():
            t0 = time.time()
            fn(docs, num_hashes=32, k=3).agg(
                F.bit_xor(F.element_at("minhash", 1))).collect()
            results.setdefault(name, []).append(time.time() - t0)
    import json
    med = {k: round(sorted(v)[len(v) // 2], 3)
           for k, v in results.items()}
    print(json.dumps({"phase": "signature_only", "sf_dir": sf_dir,
                      "reps": reps, "median_sec": med,
                      "all": {k: [round(x, 2) for x in v]
                              for k, v in results.items()}}))


def bench_full_query(sf_dir="/root/testdata/sf0.1", reps=3):
    """Phase 2: the FULL minhash_near_dups contract-query shape per
    signature variant, +-localCheckpoint barrier before the LSH
    fan-out (minhash_lsh_pairs re-inlines the signature into band
    keys and both self-join sides without one)."""
    import json
    spark = _session("microbench_minhash_full")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(sigfn, barrier):
        sigs = sigfn(docs, num_hashes=32, k=3)
        if barrier:
            sigs = sigs.localCheckpoint(eager=False)
        t0 = time.time()
        (dedup.minhash_lsh_pairs(sigs, num_hashes=32, bands=8)
         .filter(F.col("est_jaccard") >= 0.5).count())
        return time.time() - t0

    cases = {}
    for name, fn in VARIANTS.items():
        cases[name] = (fn, False)
        cases[name + "+barrier"] = (fn, True)
    results = {}
    for rep in range(reps):
        for name, (fn, barrier) in cases.items():
            results.setdefault(name, []).append(run(fn, barrier))
    med = {k: round(sorted(v)[len(v) // 2], 3)
           for k, v in results.items()}
    print(json.dumps({"phase": "full_query", "median_sec": med,
                      "all": {k: [round(x, 2) for x in v]
                              for k, v in results.items()}}))


if __name__ == "__main__":
    main()
