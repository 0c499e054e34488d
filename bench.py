#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the image
segmentation+zonal-stats pipeline over a deterministic synthetic
images table, and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "segmentation": {images, tiles, images_per_sec, tiles_per_sec}}

Scaling-efficiency evidence (N vs 4N cores) lives in
scripts/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1", "tpch_q5ish", "a1_histogram", "a3_value_histogram",
    "a5_stats_finalize", "w4_percentile_exact", "o4_mode_maxby",
    "w1_dense_relabel", "w2_prefix_offsets", "j3_broadcast_lookup",
    "j1_mode_correspondence", "o3_min_by_nearest", "dedup_exact",
    "lang_id", "token_counts", "minhash_near_dups",
    "simhash_near_dups", "embedding_topk", "events_windowed",
    "knn_points", "ivf_topk", "cosine_near_dups", "fingerprint",
    "colour_stretch", "sessionization", "dedup_groups",
    "tpch_q3ish", "u1_variogram", "u2_mean_coords",
    "u3_edge_pixels", "pip_grid", "asof_join", "range_join",
    "morton_cells", "a4_nodata_count", "a5_stats_named",
    "image_features", "embedding_near_dups_lsh",
    "image_near_dups", "multimodal_near_dups",
    "tpch_q4ish", "quality_full", "ngram_jaccard",
]


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def run_segmentation_bench(spark, n_images, size, cpus):
    from pyshepseg_spark.operators.segment import SegConfig
    from pyshepseg_spark.operators.zonal import segment_stats_tiled
    from pyshepseg_spark.sources.imagegen import images_spark_df

    cfg = SegConfig(img_null_val=65535, four_connected=False,
                    min_segment_size=50, tile_size=256, overlap=64)
    images = images_spark_df(spark, n_images, size=size,
                             num_partitions=min(n_images, cpus * 2)) \
        .cache()
    images.count()  # materialize fixture outside the timed region
    t0 = time.time()
    # stats-only consumption path: kernel-emitted histograms +
    # sequential stitch mapping — ONE Arrow pass over pixels, no
    # painted mosaic materialized
    stats = segment_stats_tiled(images, cfg, percentiles=(50,))
    _materialize(stats)
    wall = time.time() - t0
    from pyshepseg_spark.operators.tiling import tile_grid
    tiles_per_image = len(tile_grid(size, size, cfg.tile_size,
                                    cfg.overlap)[0])
    n_tiles = n_images * tiles_per_image
    return {
        "images": n_images, "tiles": n_tiles, "size": size,
        "wall_sec": round(wall, 2),
        "images_per_sec": round(n_images / wall, 3),
        "tiles_per_sec": round(n_tiles / wall, 3),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "32"))
    img_size = int(os.environ.get("SPARK_GRAFT_BENCH_IMG_SIZE",
                                  "512"))

    from pyshepseg_spark.session import get_spark, warm_python_workers
    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    warm_python_workers(spark)

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    times = {}
    for name in HEADLINE:
        t0 = time.time()
        _materialize(qs[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)

    seg = run_segmentation_bench(spark, n_images, img_size, cpus)
    times["segmentation_pipeline"] = seg["wall_sec"]

    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline_queries_plus_segmentation_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "segmentation": seg,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
