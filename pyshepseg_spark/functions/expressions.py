"""Reusable column-expression builders (SURVEY.md §2.7 scalar
surface). All JVM-side — usable inside whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def spectral_dist_sqr(a: Column, b: Column) -> Column:
    """F1: squared Euclidean distance between two array<numeric>
    spectra (shepseg.py:730 — order-only comparisons skip the
    sqrt)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def affine_geo(xcol, ycol, gt):
    """F2: 6-term affine geotransform (tilingstats.py:1134-1135).
    Returns (easting, northing) column pair."""
    ex = F.lit(gt[0]) + F.col(xcol) * F.lit(gt[1]) \
        + F.col(ycol) * F.lit(gt[2])
    ny = F.lit(gt[3]) + F.col(xcol) * F.lit(gt[4]) \
        + F.col(ycol) * F.lit(gt[5])
    return ex, ny


def recode_with_offset(seg: Column, offset: Column) -> Column:
    """F5: simple ID recode preserving null (tiling.py:1024-1027)."""
    return F.when(seg == 0, F.lit(0)).otherwise(seg + offset)


def mode_tiebreak_smallest(value_col: str, count_col: str) -> Column:
    """O4: mode as max_by(value, (count, -value)) — ties resolve to
    the smallest value, matching the reference's first-argmax over
    value-sorted arrays (tilingstats.py:964)."""
    return F.max_by(value_col,
                    F.struct(F.col(count_col),
                             (-F.col(value_col)).alias("nv")))
