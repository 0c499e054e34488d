"""Per-segment *spatial* statistics and the user-UDF surface.

Rebuilds tilingstats' spatial layer
(/root/reference/pyshepseg/tilingstats.py:1037-1216, 1262-1390):
the reference accumulates per-segment point lists
(SegPoint(x, y, val)) and hands them to a numba user function; here
the same contract is a grouped-map pandas UDF over a long-format
(image_id, seg_id, x, y, val) DataFrame — ``applyInPandas`` per
segment group, vectorized numpy inside (SURVEY.md §2.9).

Shipped UDFs (ports of the reference's, same semantics):
  - mean_coord   (U2, tilingstats.py:1097-1142) — also available as a
                 pure aggregation (no UDF) via :func:`mean_coords`
  - variogram    (U1, tilingstats.py:1037-1094)
  - edge pixels  (U3, tilingstats.py:1145-1216)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

PIXELS_SCHEMA = "image_id string, seg_id long, x int, y int, val long"


def pixels_long(final_tiles, band: int = 0):
    """Long-format pixel table from stitched tiles: one row per valid
    pixel with image coordinates. This is the reference's per-segment
    point-list accumulation (tilingstats.py:1651-1699) as a
    DataFrame; the shuffle replaces the completeness state machine."""

    def kernel(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                seg = np.frombuffer(row.segdata, dtype="<i8").reshape(
                    row.out_ysize, row.out_xsize)
                pix = np.frombuffer(row.pixels, dtype="<u2").reshape(
                    row.nbands, row.out_ysize, row.out_xsize)
                yy, xx = np.nonzero(seg)
                if len(yy) == 0:
                    continue
                frames.append(pd.DataFrame({
                    "image_id": row.image_id,
                    "seg_id": seg[yy, xx],
                    "x": (xx + row.xout).astype(np.int32),
                    "y": (yy + row.yout).astype(np.int32),
                    "val": pix[band][yy, xx].astype(np.int64)}))
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(columns=["image_id", "seg_id",
                                              "x", "y", "val"]))

    cols = ["image_id", "xout", "yout", "out_xsize", "out_ysize",
            "nbands", "pixels", "segdata"]
    return final_tiles.select(*cols).mapInPandas(kernel, PIXELS_SCHEMA)


def mean_coords(pixels, geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)):
    """U2 as pure SQL: per-segment mean easting/northing through the
    6-term affine (tilingstats.py:1134-1135) — no UDF needed."""
    gt = geotransform
    ex = F.lit(gt[0]) + F.col("x") * F.lit(gt[1]) \
        + F.col("y") * F.lit(gt[2])
    ny = F.lit(gt[3]) + F.col("x") * F.lit(gt[4]) \
        + F.col("y") * F.lit(gt[5])
    return (pixels.withColumn("easting", ex).withColumn("northing", ny)
            .groupBy("image_id", "seg_id")
            .agg(F.avg("easting").alias("mean_easting"),
                 F.avg("northing").alias("mean_northing")))


def apply_segment_udf(pixels, func, out_schema: str):
    """The engine's user-UDF contract (reference numba contract:
    userFunc(pts, imgNullVal, intArr, floatArr, userParam),
    tilingstats.py:1587-1648): ``func(pdf)`` receives one segment's
    points as a pandas DataFrame (image_id, seg_id, x, y, val) and
    returns a one-row DataFrame matching out_schema."""
    return (pixels.groupBy("image_id", "seg_id")
            .applyInPandas(lambda pdf: func(pdf), out_schema))


def variogram_udf(max_dist: int = 5):
    """U1 (tilingstats.py:1037-1094, userFuncVariogram semantics,
    replicated exactly): densify the segment to its bbox, then for
    every offset pair (dy, dx) with BOTH in 1..max_dist (the
    reference never pairs along a pure row/column), bin by the
    TRUNCATED integer Euclidean distance and accumulate squared
    value differences; variogram_g = RMS of bin g. Vectorized as
    shifted-array diffs per offset (max_dist^2 offsets, each a whole-
    array op — no per-pixel Python)."""

    def func(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy(np.int64)
        y = pdf["y"].to_numpy(np.int64)
        v = pdf["val"].to_numpy(np.float64)
        x0, y0 = x.min(), y.min()
        tile = np.full((y.max() - y0 + 1, x.max() - x0 + 1),
                       np.nan, dtype=np.float64)
        tile[y - y0, x - x0] = v
        sums = np.zeros(max_dist, dtype=np.float64)
        cnts = np.zeros(max_dist, dtype=np.int64)
        for dy in range(1, max_dist + 1):
            for dx in range(1, max_dist + 1):
                dist = int(np.sqrt(dy * dy + dx * dx))
                if dist > max_dist:
                    continue
                a = tile[:-dy, :-dx] if dy and dx else tile
                b = tile[dy:, dx:]
                d = a - b
                m = ~np.isnan(d)
                sums[dist - 1] += (d[m] ** 2).sum()
                cnts[dist - 1] += int(m.sum())
        out = {"image_id": pdf["image_id"].iloc[0],
               "seg_id": pdf["seg_id"].iloc[0]}
        for lag in range(1, max_dist + 1):
            out[f"variogram_{lag}"] = (
                float(np.sqrt(sums[lag - 1] / cnts[lag - 1]))
                if cnts[lag - 1] > 0 else float("nan"))
        return pd.DataFrame([out])

    schema = ("image_id string, seg_id long, "
              + ", ".join(f"variogram_{g} double"
                          for g in range(1, max_dist + 1)))
    return func, schema


def edge_pixels_udf(four_connected: bool = True):
    """U3 (tilingstats.py:1145-1216): per-segment count of pixels
    with fewer than 4 (or 8) same-segment neighbours. Densifies the
    point list back to its bbox (the reference's
    convertPtsInto2DArray, tilingstats.py:1743-1792) then counts with
    shifted-mask sums."""

    def func(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy(np.int64)
        y = pdf["y"].to_numpy(np.int64)
        x0, y0 = x.min(), y.min()
        mask = np.zeros((y.max() - y0 + 3, x.max() - x0 + 3),
                        dtype=bool)
        mask[y - y0 + 1, x - x0 + 1] = True
        offs = ([(-1, 0), (1, 0), (0, -1), (0, 1)] if four_connected
                else [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                      (1, -1), (1, 0), (1, 1)])
        nbr = np.zeros(mask.shape, dtype=np.int32)
        for dy, dx in offs:
            nbr += np.roll(np.roll(mask, dy, 0), dx, 1)
        need = 4 if four_connected else 8
        edge = mask & (nbr < need)
        return pd.DataFrame([{
            "image_id": pdf["image_id"].iloc[0],
            "seg_id": pdf["seg_id"].iloc[0],
            "num_edge_pixels": int(edge.sum())}])

    return func, "image_id string, seg_id long, num_edge_pixels long"
