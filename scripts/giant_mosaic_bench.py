"""Giant-single-mosaic evidence: intra-image parallelism.

The many-small-images flagship parallelizes across images; the other
scale regime is ONE raster too big for a worker (the reference's own
tiled use case). There the kernel phase parallelizes across tiles,
and the stitch choice matters:

  mode="sequential" (default) — reference-exact replay; the per-image
      recode chain is one O(strips) task (pixel work stays parallel).
  mode="cc"         — order-independent strip-join + CC closure;
      the mapping itself is also distributed (documented deviation).

This bench times the full pipeline (kernel + stitch + paint) for one
2048x2048x3 raster (100 tiles at 256/64) at two parallelism levels,
per mode — the numbers PERF.md cites for the giant-mosaic story.

Usage: python scripts/giant_mosaic_bench.py [size] [reps]
Never run concurrently with scaling_bench.
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyshepseg_spark.session import get_spark
from pyshepseg_spark.operators.segment import (SegConfig,
    fit_global_centres, segment_images_tiled)

spark = get_spark(app_name="giant", master="local[{cores}]",
                  shuffle_partitions={cores})
images = spark.read.parquet({path!r})
cfg = SegConfig(img_null_val=65535, four_connected=False,
                min_segment_size=50, tile_size=256, overlap=64)
# giant-single-raster protocol: ONE global sample fit (the
# reference's own prepare phase), shared by every tile kernel
t0 = time.time()
centres = fit_global_centres(images, cfg)
fit_sec = round(time.time() - t0, 2)
# warmup (JVM + python workers), then timed reps
for rep in range({reps} + 1):
    t0 = time.time()
    final, _, _ = segment_images_tiled(images, cfg, centres=centres,
                                       mode={mode!r})
    n = final.count()
    dt = time.time() - t0
    if rep > 0:
        print(json.dumps({{"mode": {mode!r}, "cores": {cores},
                           "rep": rep, "sec": round(dt, 2),
                           "fit_sec": fit_sec,
                           "rows": n}}), flush=True)
spark.stop()
"""

TILES_GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from pyshepseg_spark.session import get_spark
from pyshepseg_spark.operators.segment import SegConfig
from pyshepseg_spark.operators.tiling import explode_tiles
spark = get_spark(app_name="tilegen", master="local[8]",
                  shuffle_partitions=8)
cfg = SegConfig(img_null_val=65535, four_connected=False,
                min_segment_size=50, tile_size=256, overlap=64)
images = spark.read.parquet({img_path!r})
# pre-tiled table: the 100 TB shape — a giant raster lands in
# storage as tile rows (the distributed analogue of the reference's
# GDAL windowed reads), with the per-image fit fused into tiling
explode_tiles(images, cfg.tile_size, cfg.overlap, fit_cfg=cfg)     .repartition(64).write.mode("overwrite").parquet({path!r})
spark.stop()
print("TILES OK")
"""

TILES_RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyshepseg_spark.session import get_spark
from pyshepseg_spark.operators.segment import (SegConfig,
    segment_tiles, stitch)
spark = get_spark(app_name="gianttiles", master="local[{cores}]",
                  shuffle_partitions={cores})
tiles = spark.read.parquet({path!r})
cfg = SegConfig(img_null_val=65535, four_connected=False,
                min_segment_size=50, tile_size=256, overlap=64)
for rep in range({reps} + 1):
    t0 = time.time()
    final = stitch(segment_tiles(tiles, None, cfg), cfg,
                   mode={mode!r})
    n = final.count()
    dt = time.time() - t0
    if rep > 0:
        print(json.dumps({{"mode": {mode!r}, "cores": {cores},
                           "rep": rep, "sec": round(dt, 2),
                           "rows": n}}), flush=True)
spark.stop()
"""

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from pyshepseg_spark.session import get_spark
from pyshepseg_spark.sources.imagegen import images_spark_df
spark = get_spark(app_name="gen", master="local[8]",
                  shuffle_partitions=8)
images_spark_df(spark, 1, size={size}, fmt="raw_u16",
                num_partitions=1) \
    .write.mode("overwrite").parquet({path!r})
spark.stop()
"""


def run(code):
    p = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-3000:])
        raise SystemExit(p.returncode)
    return [json.loads(ln) for ln in p.stdout.splitlines()
            if ln.startswith("{")]


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "giant.parquet")
        run(GEN.format(repo=REPO, size=size, path=path))
        tiles_path = os.path.join(td, "tiles.parquet")
        if os.environ.get("GIANT_PRETILED"):
            run(TILES_GEN.format(repo=REPO, img_path=path,
                                 path=tiles_path))
        out = {}
        cores_list = [int(c) for c in os.environ.get(
            "GIANT_CORES", "8,32").split(",")]
        pretiled = bool(os.environ.get("GIANT_PRETILED"))
        for mode in ("sequential", "cc"):
            for cores in cores_list:
                tmpl = TILES_RUNNER if pretiled else RUNNER
                rows = run(tmpl.format(
                    repo=REPO,
                    path=tiles_path if pretiled else path,
                    cores=cores, mode=mode, reps=reps))
                med = sorted(r["sec"] for r in rows)[len(rows) // 2]
                out[f"{mode}@{cores}"] = med
                print(f"{mode}@{cores}: {med}s "
                      f"(reps {[r['sec'] for r in rows]})",
                      flush=True)
        for mode in ("sequential", "cc"):
            for lo, hi in zip(cores_list, cores_list[1:]):
                eff = (out[f"{mode}@{lo}"] / out[f"{mode}@{hi}"]
                       / (hi / lo))
                out[f"{mode}_{lo}to{hi}_eff"] = round(eff, 3)
        print(json.dumps({"size": size, "tile": 256, "overlap": 64,
                          **out}))


if __name__ == "__main__":
    main()
