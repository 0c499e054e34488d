import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyshepseg_spark.functions.expressions import (affine_geo,
                                                   mode_tiebreak_smallest,
                                                   recode_with_offset,
                                                   spectral_dist_sqr)
from pyshepseg_spark.operators.colortables import (colour_ramp_from_stat,
                                                   random_colour_table)


def test_spectral_dist_and_affine(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "a": [[1.0, 2.0, 3.0]], "b": [[4.0, 6.0, 3.0]],
        "x": [10], "y": [20]}))
    out = df.select(
        spectral_dist_sqr(F.col("a"), F.col("b")).alias("d"),
        *[c.alias(n) for c, n in
          zip(affine_geo("x", "y", (100.0, 2.0, 0.0, 50.0, 0.0,
                                    -1.0)), ["ex", "ny"])]).first()
    assert out["d"] == 9 + 16
    assert out["ex"] == 120.0 and out["ny"] == 30.0


def test_recode_and_mode(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "seg": [0, 1, 5], "off": [10, 10, 10]}))
    got = df.select(recode_with_offset(
        F.col("seg"), F.col("off")).alias("r")).toPandas()
    assert got.r.tolist() == [0, 11, 15]
    h = spark.createDataFrame(pd.DataFrame({
        "g": [1, 1, 1], "val": [7, 3, 9], "cnt": [2, 2, 1]}))
    m = h.groupBy("g").agg(
        mode_tiebreak_smallest("val", "cnt").alias("mode")).first()
    assert m["mode"] == 3  # tie between 7 and 3 -> smallest value


def test_colour_tables(spark):
    segs = spark.createDataFrame(pd.DataFrame({
        "image_id": ["a"] * 5, "seg_id": range(1, 6),
        "mean_val": [10.0, 20.0, 30.0, 40.0, 1000.0]}))
    rc = random_colour_table(segs).toPandas()
    assert rc[["red", "green", "blue"]].min().min() >= 0
    assert rc[["red", "green", "blue"]].max().max() <= 255
    rc2 = random_colour_table(segs).toPandas()
    assert rc.equals(rc2)  # deterministic
    ramp = colour_ramp_from_stat(segs, "mean_val").toPandas()
    assert len(ramp) == 5
    # stretched: low stat -> blue-ish, high stat -> red-ish
    lo = ramp.sort_values("seg_id").iloc[0]
    hi = ramp.sort_values("seg_id").iloc[-1]
    assert lo.blue > lo.red and hi.red > hi.blue
