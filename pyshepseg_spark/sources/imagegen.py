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
