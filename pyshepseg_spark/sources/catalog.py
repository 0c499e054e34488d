"""Table source/sink abstraction: Iceberg when the runtime has it,
parquet otherwise.

The north rule targets Iceberg tables of image+caption pairs; this
sandbox ships no Iceberg runtime jars, so every reader/writer in the
engine goes through this thin layer: identical DataFrames either
way, and on a real cluster (`--packages org.apache.iceberg:...` +
catalog conf) the same code path gets Iceberg's partition pruning,
snapshot isolation, and metadata-level file skipping for free
(reference analogue: the engine's checkpoint/resume tables, S6/S11 —
tiling.py:1471-1494, do_tile.py:75-111).
"""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=1)
def iceberg_available(_cache_key: int = 0) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def load_table(spark, location: str):
    """Read a table: Iceberg identifier (``catalog.db.tbl``) when the
    runtime supports it and the location has no path separator,
    parquet path otherwise."""
    if iceberg_available() and "/" not in location:
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_table(df, location: str, mode: str = "overwrite",
                partition_by=None):
    """Write a table through the same duality. partition_by matters
    at scale: final tiles partition by image_id bucket so tile reads
    prune to one bucket per image."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if iceberg_available() and "/" not in location:
        w.format("iceberg").saveAsTable(location)
    else:
        w.parquet(location)
