"""Colour tables and histogram-stretch helpers.

Rebuilds /root/reference/pyshepseg/utils.py colour utilities as
DataFrame transforms over the per-segment stats table:

- random colour table (utils.py:123-159): seeded rand per segment ID
- colour ramp from a stat column with a 5th/95th percentile stretch
  (W5, utils.py:162-230, stretch at :212-221)
"""

from __future__ import annotations

from pyspark.sql import functions as F


def random_colour_table(segments, seed: int = 42):
    """(image_id, seg_id, red, green, blue): deterministic pseudo-
    random colours per segment; segment 0 (null) excluded by input.
    Uses hash-derived channels so the table is reproducible without a
    window or shuffle (utils.py:123-159 semantics: random uint8 per
    channel)."""
    def chan(salt):
        h = F.xxhash64(F.col("image_id"), F.col("seg_id"),
                       F.lit(seed + salt))
        return (F.pmod(h, F.lit(256))).cast("int")

    return segments.select(
        "image_id", "seg_id",
        chan(0).alias("red"), chan(1).alias("green"),
        chan(2).alias("blue"))


def colour_ramp_from_stat(stats, stat_col: str,
                          low_pct: float = 5.0,
                          high_pct: float = 95.0):
    """W5: clip the stat to its [5th, 95th] percentile range per
    image, scale to 0..255, and spread across a blue->red ramp
    (utils.py:162-230). Exact percentiles via the engine's value
    ordering (percentile on doubles here, matching numpy.percentile
    as the reference uses for the stretch)."""
    pcts = (stats.groupBy("image_id")
            .agg(F.expr(f"percentile({stat_col}, "
                        f"{low_pct / 100.0})").alias("lo"),
                 F.expr(f"percentile({stat_col}, "
                        f"{high_pct / 100.0})").alias("hi")))
    j = stats.join(pcts, "image_id")
    clipped = F.least(F.greatest(F.col(stat_col), F.col("lo")),
                      F.col("hi"))
    scaled = F.when(F.col("hi") > F.col("lo"),
                    ((clipped - F.col("lo"))
                     / (F.col("hi") - F.col("lo")) * 255)
                    ).otherwise(F.lit(0.0)).cast("int")
    return j.select(
        "image_id", "seg_id",
        scaled.alias("red"),
        (F.lit(255) - F.abs(scaled * 2 - 255)).cast("int")
        .alias("green"),
        (F.lit(255) - scaled).alias("blue"))
