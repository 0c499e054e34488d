"""Deterministic synthetic `images` table generator (FIXTURES.md).

Mirrors the reference test fixture — Voronoi segments painted with a
deterministic colour pallete, a null margin, 3-band uint16 — at
reduced scale, reshaped into rows of the engine's input table
(BASELINE.json input_hint schema):

    image_id string, bytes binary, w int, h int, fmt string,
    caption string, phash int64

Reference analogue: /root/reference/pyshepseg/cmdline/runtests.py
(generateTrueSegments :145-195, createPallete :198-226,
createMultispectral :229-265). All randomness is seeded; no external
data. Unlike the reference we draw per-image seed centres from the
seeded RNG rather than embedding its hard-coded list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..constants import IMG_NULL_VAL
from .codec import average_phash, encode_image

NULL_MARGIN = 2      # scaled from the reference's 10 px at 8000 px
VALUE_RANGE = 10000  # pallete values span 0..10000 (runtests.py:198-226)
NBANDS = 3


def voronoi_truth(w, h, centres):
    """Ground-truth segment raster: nearest-centre (squared distance,
    ties -> lowest centre index), IDs 1..K, null margin = 0.
    Computed in row blocks: the naive (w*h, k, 2) float64 broadcast
    is ~100 GB for a 16384^2 giant-mosaic fixture; per-pixel argmin
    is block-independent, so chunking is bit-identical."""
    truth = np.empty((h, w), dtype=np.uint32)
    block = max(1, (1 << 22) // max(w, 1))    # ~4M px per block
    for y0 in range(0, h, block):
        y1 = min(y0 + block, h)
        yy, xx = np.mgrid[y0:y1, 0:w]
        pts = np.stack([xx.ravel(), yy.ravel()],
                       axis=1).astype(np.float64)
        d = ((pts[:, None, :] - centres[None, :, :]) ** 2).sum(axis=2)
        truth[y0:y1] = (np.argmin(d, axis=1) + 1) \
            .astype(np.uint32).reshape(y1 - y0, w)
    truth[:NULL_MARGIN, :] = 0
    truth[-NULL_MARGIN:, :] = 0
    truth[:, :NULL_MARGIN] = 0
    truth[:, -NULL_MARGIN:] = 0
    return truth


def make_pallete(k, rng):
    """K distinct 3-band colours: evenly spaced ramp 500..9500 in band
    0, seeded permutations of the same ramp in bands 1-2. Guarantees
    pairwise-distinct colour triples with large spectral separation."""
    ramp = np.linspace(500, 9500, k).astype(np.uint16)
    pal = np.empty((k, NBANDS), dtype=np.uint16)
    pal[:, 0] = ramp
    for b in range(1, NBANDS):
        pal[:, b] = ramp[rng.permutation(k)]
    return pal


def paint_image(truth, pallete):
    """(nbands, h, w) uint16 image: each segment painted its pallete
    colour; null pixels = IMG_NULL_VAL in every band."""
    h, w = truth.shape
    img = np.empty((NBANDS, h, w), dtype=np.uint16)
    # lookup table with index 0 = null colour
    lut = np.vstack([np.full((1, NBANDS), IMG_NULL_VAL, dtype=np.uint16),
                     pallete])
    painted = lut[truth]                      # (h, w, nbands)
    for b in range(NBANDS):
        img[b] = painted[:, :, b]
    return img


def generate_image(i, size=512, seed=42, fmt="png", k=None):
    """Generate one fixture image. Returns (row_dict, truth_raster)."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    w = h = size
    if k is None:
        k = int(rng.integers(12, 25))
    margin = NULL_MARGIN + 2
    centres = np.stack([
        rng.uniform(margin, w - margin, size=k),
        rng.uniform(margin, h - margin, size=k)], axis=1)
    truth = voronoi_truth(w, h, centres)
    pallete = make_pallete(k, rng)
    img = paint_image(truth, pallete)
    row = {
        "image_id": f"img_{i:06d}",
        "bytes": encode_image(img, fmt),
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": f"scene {i}: {k} regions",
        # nodata-aware hash: without masking, the uniform null
        # margin makes every fixture image hash to the same
        # border-mask value (28 edge blocks set) — zero diversity
        "phash": np.int64(average_phash(img[0], IMG_NULL_VAL)),
    }
    return row, truth


def generate_images_pdf(n_images, size=512, seed=42, fmt="png",
                        with_truth=False):
    """Pandas DataFrame of the images table (+ optional truth dict)."""
    rows, truths = [], {}
    for i in range(n_images):
        row, truth = generate_image(i, size=size, seed=seed, fmt=fmt)
        rows.append(row)
        if with_truth:
            truths[row["image_id"]] = truth
    pdf = pd.DataFrame(rows)
    if with_truth:
        return pdf, truths
    return pdf


def images_spark_df(spark, n_images, size=512, seed=42, fmt="png",
                    num_partitions=None, include_k=True):
    """The images table as a Spark DataFrame with the input_hint
    schema (+ a num_clusters column when include_k, mirroring the
    reference test's numClusters = true region count,
    runtests.py:97). Generation happens on executors (mapInPandas
    over an index range) so the fixture scales without driver memory
    pressure."""
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                                   StringType, StructField, StructType)

    fields = [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
    if include_k:
        fields.append(StructField("num_clusters", IntegerType()))
    schema = StructType(fields)
    npart = num_partitions or min(n_images, 32)
    idx = spark.range(0, n_images, 1, npart)

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                row, _ = generate_image(int(i), size=size, seed=seed,
                                        fmt=fmt)
                if include_k:
                    row["num_clusters"] = np.int32(
                        int(row["caption"].split(": ")[1].split()[0]))
                out.append(row)
            yield pd.DataFrame(out)

    return idx.mapInPandas(gen, schema)


def giant_tile_rows(spark, size, tile_size=256, overlap=64, seed=42,
                    idx=0, num_partitions=None, cell_shift=8):
    """Per-tile DIRECT generation of the giant-raster fixture
    (VERDICT r5 Missing #2): the tile rows explode_tiles would emit
    from ``generate_image(idx, size)``, WITHOUT ever materializing
    the size^2 raster as one parquet row — a 14592^2 image is a
    1.28 GB cell whose single-task explode (>9 min, executor
    heartbeat death) blocked the r5 sequential-vs-cc crossover
    measurement.

    Each tile's Voronoi block is computed independently (per-pixel
    argmin is block-independent — voronoi_truth's own chunking
    relies on the same fact), so generation parallelizes across
    tiles; a task re-derives the image's (k, centres, palette) from
    the generate_image RNG sequence (three cheap draws) and renders
    only its window. Pixels are BITWISE the tiles of the full-raster
    render (tested against explode_tiles at 512^2).

    The per-tile ``centres`` column carries the PALETTE colour
    triples as the spectral cluster centres: every non-null fixture
    pixel is exactly one of the k pairwise-distinct palette colours,
    so the palette IS this raster's analytic k-cluster solution.
    (The fused explode_tiles path instead replays an image-wide
    strided k-means whose sample stride depends on global null
    counts — not computable per tile; for the stitch-cost
    measurement the centre values are immaterial, the kernel cost is
    argmin over k centres either way.)"""
    from ..operators.tiling import morton_cell, tile_grid

    rng = np.random.default_rng(seed * 1_000_003 + idx)
    k = int(rng.integers(12, 25))
    margin = NULL_MARGIN + 2
    centres = np.stack([
        rng.uniform(margin, size - margin, size=k),
        rng.uniform(margin, size - margin, size=k)], axis=1)
    pal = make_pallete(k, rng)
    image_id = f"img_{idx:06d}"

    tiles, ntcols, ntrows = tile_grid(size, size, tile_size, overlap)
    spec = pd.DataFrame(tiles, columns=["tcol", "trow", "xpos",
                                        "ypos", "xsize", "ysize"])
    npart = num_partitions or min(
        len(tiles), spark.sparkContext.defaultParallelism * 2)
    sdf = spark.createDataFrame(spec).repartition(npart)

    from ..operators.tiling import TILE_SCHEMA_WITH_CENTRES
    from .codec import encode_raw_u16
    centres_bytes = pal.astype("<f8").tobytes()
    lut = np.vstack([np.full((1, NBANDS), IMG_NULL_VAL,
                             dtype=np.uint16), pal])

    def kernel(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                xp, yp = int(row.xpos), int(row.ypos)
                xs, ys = int(row.xsize), int(row.ysize)
                yy, xx = np.mgrid[yp:yp + ys, xp:xp + xs]
                pts = np.stack([xx.ravel(), yy.ravel()],
                               axis=1).astype(np.float64)
                d = ((pts[:, None, :] - centres[None, :, :]) ** 2) \
                    .sum(axis=2)
                truth = (np.argmin(d, axis=1) + 1) \
                    .astype(np.uint32).reshape(ys, xs)
                # GLOBAL null margin expressed in window coords
                gy = np.arange(yp, yp + ys)
                gx = np.arange(xp, xp + xs)
                truth[(gy < NULL_MARGIN)
                      | (gy >= size - NULL_MARGIN), :] = 0
                truth[:, (gx < NULL_MARGIN)
                      | (gx >= size - NULL_MARGIN)] = 0
                painted = lut[truth]                # (ys, xs, nb)
                img = np.moveaxis(painted, 2, 0)    # (nb, ys, xs)
                out.append({
                    "image_id": image_id,
                    "tcol": int(row.tcol), "trow": int(row.trow),
                    "ntcols": ntcols, "ntrows": ntrows,
                    "xpos": xp, "ypos": yp,
                    "xsize": xs, "ysize": ys,
                    "nbands": NBANDS,
                    "cell": morton_cell(xp >> cell_shift,
                                        yp >> cell_shift),
                    "pixels": encode_raw_u16(img),
                    "centres": centres_bytes,
                })
            yield pd.DataFrame(out, columns=[
                "image_id", "tcol", "trow", "ntcols", "ntrows",
                "xpos", "ypos", "xsize", "ysize", "nbands", "cell",
                "pixels", "centres"])

    return sdf.mapInPandas(kernel, TILE_SCHEMA_WITH_CENTRES)


def caption_points(image_id, caption, w, h, n_points=16, seed=42):
    """Caption-derived point set for one image (FIXTURES.md §4):
    deterministic (x, y) samples labelled with caption tokens. Used by
    the point-in-segment join and kNN lookups."""
    i = int(image_id.split("_")[-1])
    rng = np.random.default_rng(seed * 7_000_003 + i)
    xs = rng.uniform(0, w, size=n_points)
    ys = rng.uniform(0, h, size=n_points)
    tokens = caption.split()
    return pd.DataFrame({
        "image_id": image_id,
        "point_id": np.arange(n_points, dtype=np.int64),
        "x": xs,
        "y": ys,
        "token": [tokens[j % len(tokens)] for j in range(n_points)],
    })
