"""Exchange-reuse experiment for LSH self-joins.

The round-4 A/B (microbench_simhash.py) showed the signature
expression gets re-inlined into both sides of the LSH self-join and
every block-key expression; interpreted HOFs and Python UDFs get no
codegen CSE, so each copy re-executes. localCheckpoint fixes it but
truncates lineage (executor-loss hazard).

Hypothesis tested here: forcing a SYMMETRIC shuffle join (shuffle_hash
hint, no broadcast) makes both join sides identical canonicalized
exchange subtrees, so Spark's ReuseExchange computes the signature
ONCE and the second side reads the same shuffle files — the barrier
benefit with zero lineage truncation, cluster-safe.

Usage: python scripts/microbench_lsh_reuse.py [sf_dir] [reps]
Never run concurrently with scaling_bench.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pyshepseg_spark.operators import dedup


def simhash_pairs_hinted(sim, max_hamming=3, blocks=4, hash_bits=28):
    """simhash_near_dups with a shuffle_hash hint on the self-join."""
    width = hash_bits // blocks
    mask = (1 << width) - 1
    exploded = sim.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            (F.shiftrightunsigned("simhash", i * width)
             .bitwiseAND(F.lit(mask))) for i in range(blocks)
        ])).alias("block", "key"))
    a = exploded.select(F.col("doc_id").alias("a"), "block", "key",
                        F.col("simhash").alias("h_a"))
    b = exploded.select(F.col("doc_id").alias("b"), "block", "key",
                        F.col("simhash").alias("h_b"))
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (a.hint("shuffle_hash").join(b.hint("shuffle_hash"),
                                        ["block", "key"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "8g")
             .appName("microbench_lsh_reuse").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from scripts.microbench_simhash import simhash_md5_onepass

    def run(mk_sig, mk_pairs):
        t0 = time.time()
        mk_pairs(mk_sig(docs)).count()
        return round(time.time() - t0, 3)

    def plain(sig):
        return dedup.simhash_near_dups(sig, max_hamming=3, blocks=4,
                                       hash_bits=28)

    cases = {
        "scalar/plain": (dedup.simhash_md5, plain),
        "scalar/hinted": (dedup.simhash_md5, simhash_pairs_hinted),
        "onepass/plain": (simhash_md5_onepass, plain),
        "onepass/hinted": (simhash_md5_onepass, simhash_pairs_hinted),
    }
    # correctness cross-check once
    base = None
    for name, (sig, pairs) in cases.items():
        got = sorted(map(tuple, pairs(sig(docs)).collect()))
        if base is None:
            base = got
        assert got == base, f"{name} output differs"
    print("all cases identical output", flush=True)

    # does ReuseExchange actually fire?
    plan = simhash_pairs_hinted(dedup.simhash_md5(docs)) \
        ._jdf.queryExecution().executedPlan().toString()
    print("ReusedExchange in hinted plan:",
          "ReusedExchange" in plan, flush=True)

    results = {}
    for rep in range(reps):
        for name, (sig, pairs) in cases.items():
            results.setdefault(name, []).append(run(sig, pairs))
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"median_sec": med, "all": results}))


if __name__ == "__main__":
    main()
