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

# Cluster deployment recipe (S11). The engine needs NO code changes
# for Iceberg — only session conf. For a 10^12-image deployment:
#
#   spark-submit --py-files pyshepseg_spark.zip \
#     --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
#     --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
#     --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
#     --conf spark.sql.catalog.lake.type=glue \        # or hive/rest/hadoop
#     --conf spark.sql.catalog.lake.warehouse=s3://bucket/warehouse \
#     job.py
#
# then pass Iceberg identifiers ("lake.db.images") instead of paths.
# Recommended layouts:
#   images:      partitioned by bucket(N, image_id) — bounded file
#                sizes under skewed ingest, pruned point lookups
#   final tiles: partitioned by bucket(N, image_id); Iceberg
#                metadata prunes to one bucket per image on read
#   lineage:     unpartitioned (tiny, append-only)
# Writers use saveAsTable/append; Iceberg gives snapshot isolation
# for the checkpoint-resume flow (plans/checkpoint.py) and
# metadata-level file skipping for the probe joins.
#
# Offline-vendoring status (round 4, 2026-08-17; re-probed round 5
# same day — still no jar on the image, no pyiceberg, no egress):
# attempted to fetch
# the public iceberg-spark-runtime jar so the round-trip test could
# execute in-sandbox; Maven Central is unreachable from this
# container (curl -> HTTP 000, no egress) and no Iceberg jar exists
# anywhere on the image (find / -name '*iceberg*' -> none). The
# round-trip + partition-pruning test therefore stays
# skipped-with-reason (tests/test_codec_tiling.py
# test_iceberg_round_trip_when_runtime_present) and will run
# unmodified the first time the jar is on the classpath.
ICEBERG_RUNTIME_PACKAGE = (
    "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0")


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
