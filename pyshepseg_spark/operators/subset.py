"""Spatial subset + dense first-touch recode.

Rebuilds /root/reference/pyshepseg/subset.py: crop a window out of a
stitched segmentation and renumber the surviving segments densely in
order of first appearance in a row-major scan of the subset
(subset.py:367-424, ID issue at :409-414), so new IDs restart at
MINSEGID and an ``orig_val`` mapping relates new -> old (the RAT
row-relocation join J4, subset.py:218-268).

Spark form: tile filter = partition pruning on tile metadata (P4);
first-touch order reproduced *without* a sequential scan via
W3 (SURVEY.md §2.5): new_id = row_number() over
(orderBy min(y*W + x) per old ID) — the minimum scan position of a
segment is exactly where the sequential scan first touches it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

PIECE_SCHEMA = ("image_id string, px int, py int, pw int, ph int, "
                "segdata binary")


def _crop_pieces(final_tiles, x0, y0, xs, ys):
    """Tiles intersecting the window, cropped to it. The filter is a
    metadata predicate -> Catalyst prunes non-intersecting tiles
    before any kernel runs (reference reads only bbox tiles,
    subset.py:123-139)."""
    cand = final_tiles.filter(
        (F.col("xout") < x0 + xs)
        & (F.col("xout") + F.col("out_xsize") > x0)
        & (F.col("yout") < y0 + ys)
        & (F.col("yout") + F.col("out_ysize") > y0))

    def kernel(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                seg = np.frombuffer(row.segdata, dtype="<i8").reshape(
                    row.out_ysize, row.out_xsize)
                ax0 = max(row.xout, x0)
                ay0 = max(row.yout, y0)
                ax1 = min(row.xout + row.out_xsize, x0 + xs)
                ay1 = min(row.yout + row.out_ysize, y0 + ys)
                piece = seg[ay0 - row.yout:ay1 - row.yout,
                            ax0 - row.xout:ax1 - row.xout]
                out.append({
                    "image_id": row.image_id,
                    "px": ax0 - x0, "py": ay0 - y0,
                    "pw": ax1 - ax0, "ph": ay1 - ay0,
                    "segdata": piece.astype("<i8").tobytes()})
            yield pd.DataFrame(out, columns=[
                "image_id", "px", "py", "pw", "ph", "segdata"])

    return cand.mapInPandas(kernel, PIECE_SCHEMA)


def subset_recode_mapping(pieces, subset_width):
    """(image_id, orig_val, new_id): first-touch dense recode via the
    min-scan-position window (W3)."""

    def kernel(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                seg = np.frombuffer(row.segdata, dtype="<i8").reshape(
                    row.ph, row.pw)
                yy, xx = np.nonzero(seg)
                if len(yy) == 0:
                    continue
                pos = ((yy + row.py).astype(np.int64) * subset_width
                       + (xx + row.px))
                ids = seg[yy, xx]
                order = np.argsort(ids, kind="stable")
                sids = ids[order]
                b = np.flatnonzero(np.diff(sids)) + 1
                starts = np.concatenate([[0], b])
                uids = sids[starts]
                minpos = np.minimum.reduceat(pos[order], starts)
                frames.append(pd.DataFrame({
                    "image_id": row.image_id, "orig_val": uids,
                    "min_pos": minpos}))
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(columns=["image_id", "orig_val",
                                              "min_pos"]))

    firsts = pieces.mapInPandas(
        kernel, "image_id string, orig_val long, min_pos long")
    firsts = firsts.groupBy("image_id", "orig_val").agg(
        F.min("min_pos").alias("min_pos"))
    w = Window.partitionBy("image_id").orderBy("min_pos")
    return firsts.withColumn("new_id", F.row_number().over(w)) \
        .select("image_id", "orig_val", "new_id")


def apply_mask(pieces, mask_fn):
    """Optional mask filter (reference subset.py:399-401: pixels
    where the mask is zero become null before the recode).
    ``mask_fn(image_id, px, py, pw, ph) -> bool ndarray (ph, pw)``
    evaluated inside the kernel (e.g. a broadcast raster lookup or a
    geometric predicate)."""

    def kernel(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                seg = np.frombuffer(row.segdata, dtype="<i8").reshape(
                    row.ph, row.pw).copy()
                keep = mask_fn(row.image_id, row.px, row.py,
                               row.pw, row.ph)
                seg[~keep] = 0
                out.append({
                    "image_id": row.image_id,
                    "px": row.px, "py": row.py,
                    "pw": row.pw, "ph": row.ph,
                    "segdata": seg.astype("<i8").tobytes()})
            yield pd.DataFrame(out, columns=[
                "image_id", "px", "py", "pw", "ph", "segdata"])

    return pieces.mapInPandas(kernel, PIECE_SCHEMA)


def subset_segmentation(final_tiles, x0, y0, xs, ys, mask_fn=None):
    """Returns (sub_pieces_recoded, mapping).

    mapping (image_id, orig_val, new_id) is J4's recode join input:
    relocate per-segment stats with
    ``old_stats.join(mapping, old_stats.seg_id == mapping.orig_val)``.
    ``mask_fn`` optionally nulls masked pixels before the recode
    (reference subset.py maskFilePath semantics).
    """
    pieces = _crop_pieces(final_tiles, x0, y0, xs, ys)
    if mask_fn is not None:
        pieces = apply_mask(pieces, mask_fn)
    mapping = subset_recode_mapping(pieces, xs)
    mlist = (mapping.groupBy("image_id")
             .agg(F.collect_list(F.struct("orig_val",
                                          "new_id")).alias("m")))
    # mlist is one row per subset image (mapping structs inside);
    # AQE broadcasts when small — a giant-mosaic subset must not
    # be forced through the driver
    joined = pieces.join(mlist, "image_id", "left")

    def kernel(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                seg = np.frombuffer(row.segdata, dtype="<i8").reshape(
                    row.ph, row.pw)
                lut = {}
                if row.m is not None:
                    for item in row.m:
                        lut[int(item["orig_val"])] = int(item["new_id"])
                u, inv = np.unique(seg, return_inverse=True)
                mapped = np.fromiter(
                    (lut.get(int(g), 0) for g in u),
                    dtype=np.int64, count=len(u))
                out.append({
                    "image_id": row.image_id,
                    "px": row.px, "py": row.py,
                    "pw": row.pw, "ph": row.ph,
                    "segdata": mapped[inv].reshape(
                        seg.shape).astype("<i8").tobytes()})
            yield pd.DataFrame(out, columns=[
                "image_id", "px", "py", "pw", "ph", "segdata"])

    recoded = joined.mapInPandas(kernel, PIECE_SCHEMA)
    return recoded, mapping


def assemble_subset(pieces_pdf: pd.DataFrame, xs, ys):
    """Test helper: paste subset pieces into an (ys, xs) raster."""
    out = np.zeros((ys, xs), dtype=np.int64)
    for row in pieces_pdf.itertuples(index=False):
        arr = np.frombuffer(row.segdata, dtype="<i8").reshape(
            row.ph, row.pw)
        out[row.py:row.py + row.ph, row.px:row.px + row.pw] = arr
    return out
