"""scalewin: two-phase global ordered windows == single-partition
window semantics, at several parallelism levels."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pyshepseg_spark.operators.scalewin import (bounded_topk,
                                                ordered_prefix_sum,
                                                ordered_row_number)


def _data(spark, n=3000, nparts=8):
    # non-monotonic unique keys, skewed values
    return spark.range(0, n, 1, nparts).select(
        ((F.col("id") * 2654435761) % 1000003).alias("k"),
        (F.col("id") % 7 + 1).alias("v"))


@pytest.mark.parametrize("nparts", [1, 3, 16])
def test_ordered_row_number_matches_global_window(spark, nparts):
    df = _data(spark).persist()
    got = ordered_row_number(df, ["k"], "rn", npartitions=nparts)
    want = df.withColumn("rn", F.row_number().over(
        Window.orderBy("k")))
    g = got.orderBy("k").toPandas()
    w = want.orderBy("k").toPandas()
    assert (g["rn"].to_numpy() == w["rn"].to_numpy()).all()
    assert (g["k"].to_numpy() == w["k"].to_numpy()).all()


@pytest.mark.parametrize("inclusive", [False, True])
def test_ordered_prefix_sum_matches_global_window(spark, inclusive):
    df = _data(spark, n=2000, nparts=5)
    upper = 0 if inclusive else -1
    w = (Window.orderBy("k")
         .rowsBetween(Window.unboundedPreceding, upper))
    want = df.select(
        "k", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("off"))
    got = ordered_prefix_sum(df, ["k"], "v", "off",
                             inclusive=inclusive, npartitions=7)
    g = got.orderBy("k").toPandas()["off"].to_numpy()
    wv = want.orderBy("k").toPandas()["off"].to_numpy()
    assert (g == wv).all()


def test_bounded_topk(spark):
    df = _data(spark, n=500, nparts=6)
    out = bounded_topk(df, [F.col("k").desc()], 12, "rk").toPandas()
    assert list(out["rk"]) == list(range(1, 13))
    full = df.orderBy(F.col("k").desc()).limit(12).toPandas()
    assert list(out["k"]) == list(full["k"])


def test_empty_input(spark):
    df = _data(spark).filter(F.col("k") < 0)
    assert ordered_row_number(df, ["k"], "rn").count() == 0
    assert ordered_prefix_sum(df, ["k"], "v").count() == 0
    assert bounded_topk(df, [F.col("k")], 5).count() == 0


def test_ordered_row_number_property(spark):
    """Property sweep (seeded): arbitrary unique key sets at random
    partitioning always yield the exact sorted enumeration."""
    import numpy as np
    rng = np.random.default_rng(99)
    for trial in range(4):
        n = int(rng.integers(1, 2500))
        nparts = int(rng.integers(1, 20))
        keys = rng.choice(1_000_000, size=n, replace=False)
        df = spark.createDataFrame(
            [(int(k),) for k in keys], "k long").repartition(nparts)
        out = ordered_row_number(df, ["k"], "rn",
                                 npartitions=int(rng.integers(1, 24)))
        pdf = out.orderBy("k").toPandas()
        assert list(pdf["rn"]) == list(range(1, n + 1)), \
            (trial, n, nparts)
        assert list(pdf["k"]) == sorted(int(k) for k in keys)


def test_ordered_prefix_sum_property(spark):
    """Property sweep (seeded): random (key, value) sets at random
    partitioning always match a driver-side cumulative sum."""
    import numpy as np
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = int(rng.integers(1, 1500))
        keys = rng.choice(1_000_000, size=n, replace=False)
        vals = rng.integers(0, 100, size=n)
        df = spark.createDataFrame(
            [(int(k), int(v)) for k, v in zip(keys, vals)],
            "k long, v long").repartition(int(rng.integers(1, 12)))
        out = ordered_prefix_sum(df, ["k"], "v", "off",
                                 npartitions=int(rng.integers(1, 24)))
        pdf = out.orderBy("k").toPandas()
        order = np.argsort(keys)
        expect = np.concatenate([[0], np.cumsum(vals[order])[:-1]])
        assert (pdf["off"].to_numpy() == expect).all(), (trial, n)
