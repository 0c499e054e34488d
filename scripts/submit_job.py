#!/usr/bin/env python
"""Entry script for `spark-submit --py-files` deployment (north
rule: "run via spark-submit --py-files on a multi-executor
cluster").

The package ships as a zip built by scripts/make_pyfiles.sh; this
script imports it from the distributed --py-files payload (NOT from
a checkout on the workers) and runs either the raster flagship or a
named query from the driver contract.

Usage:
  scripts/make_pyfiles.sh /tmp/pyshepseg_spark.zip
  spark-submit --master local[8] \
      --py-files /tmp/pyshepseg_spark.zip \
      scripts/submit_job.py --query a1_histogram \
      --sf-dir /root/testdata/sf0.01

On a real cluster, replace --master with the cluster manager and the
same zip serves every executor.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="flagship",
                    help="'flagship' (segmentation+zonal) or a "
                         "queries() key from __spark_entry__")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--n-images", type=int, default=4)
    ap.add_argument("--size", type=int, default=512,
                    help="flagship image edge length in pixels")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("pyshepseg-submit")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.shuffle.partitions", "32")
             .getOrCreate())

    t0 = time.time()
    if args.query == "flagship":
        from pyshepseg_spark.operators.segment import SegConfig
        from pyshepseg_spark.operators.zonal import segment_stats_tiled
        from pyshepseg_spark.sources.imagegen import images_spark_df
        cfg = SegConfig(img_null_val=65535, four_connected=False,
                        tile_size=256, overlap=64)
        images = images_spark_df(spark, args.n_images,
                                 size=args.size)
        # one-linear-job stats path (kernel histograms remapped
        # inside the sequential-exact stitch)
        out = segment_stats_tiled(images, cfg, percentiles=(50,))
    else:
        import importlib
        entry = importlib.import_module("__spark_entry__")
        out = entry.queries()[args.query](spark, args.sf_dir)
    n = out.count()
    print(json.dumps({"query": args.query, "rows": n,
                      "sec": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
