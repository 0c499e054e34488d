import pandas as pd
from pyspark.sql import functions as F

from pyshepseg_spark.operators.skew import (salted_broadcast_join,
                                            salted_count)


def test_salted_count_equals_plain(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"))
    plain = {r["k"]: r["cnt"] for r in
             df.groupBy("k").agg(F.count("*").alias("cnt"))
             .collect()}
    salted = {r["k"]: r["cnt"] for r in
              salted_count(df, ["k"], num_salts=8).collect()}
    assert plain == salted


def test_salted_broadcast_join_equals_plain(spark):
    big = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame(pd.DataFrame(
        {"k": [0, 1, 2], "name": ["a", "b", "c"]}))
    plain = big.join(small, "k").groupBy("name").count().collect()
    salted = salted_broadcast_join(big, small, "k").groupBy(
        "name").count().collect()
    assert sorted((r["name"], r["count"]) for r in plain) == \
        sorted((r["name"], r["count"]) for r in salted)
