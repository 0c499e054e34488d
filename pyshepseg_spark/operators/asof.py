"""As-of (temporal most-recent) join — a custom operator Spark lacks.

For each left row, attach the most recent right row at or before its
timestamp within the same key (backward as-of; optionally bounded by
a tolerance). No reference analogue (the driver brief's custom-
operator family, like SURVEY.md J5): expressed Spark-first as a
union + last(ignorenulls) ordered window — ONE shuffle on the
by-key, no range-condition join (a naive l.ts >= r.ts theta join is
quadratic per key and unusable at scale).

Scale notes: the window partitions by the by-key, so skewed keys are
bounded by per-key row counts (AQE-safe; salt upstream if one key
dominates); both inputs are scanned once.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def asof_join(left, right, on: str = "ts", by=("user_id",),
              right_cols=("value",), tolerance_seconds=None,
              suffix: str = "_r"):
    """Backward as-of join (pandas merge_asof / DuckDB ASOF JOIN
    semantics, inclusive): left LEFT-joins the latest right row with
    right.on <= left.on per by-key.

    right should be unique per (by, on) for deterministic results
    (pre-aggregate if not). Returns all left columns plus
    ``<col><suffix>`` for every right_cols entry and ``<on><suffix>``
    (the matched right timestamp, null when no match /
    outside tolerance)."""
    by = list(by)
    clash = [c for c in ([on + suffix]
                         + [c + suffix for c in right_cols]
                         + ["_side"]) if c in left.columns]
    if clash:
        raise ValueError(f"left already has columns {clash}; "
                         f"pick another suffix")
    rsel = (right.select(
        *by, F.col(on).alias(on + suffix),
        *[F.col(c).alias(c + suffix) for c in right_cols])
        .withColumn("_side", F.lit(0))
        .withColumn(on, F.col(on + suffix)))
    lsel = left.withColumn("_side", F.lit(1))
    for c in [on + suffix] + [c + suffix for c in right_cols]:
        lsel = lsel.withColumn(c, F.lit(None))
    left_cols = [c for c in left.columns]
    all_cols = left_cols + [on + suffix] + \
        [c + suffix for c in right_cols] + ["_side"]
    for c in all_cols:
        if c not in rsel.columns:
            rsel = rsel.withColumn(c, F.lit(None))
    u = lsel.select(*all_cols).unionByName(rsel.select(*all_cols))

    # right rows sort BEFORE left rows at equal timestamps
    # (_side 0 < 1) => the inclusive (<=) backward match
    w = (Window.partitionBy(*by).orderBy(F.col(on).asc(),
                                         F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u
    for c in [on + suffix] + [c + suffix for c in right_cols]:
        filled = filled.withColumn(
            c, F.last(c, ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        within = (F.col(on).cast("long")
                  - F.col(on + suffix).cast("long")
                  <= tolerance_seconds)
        for c in [on + suffix] + [c + suffix for c in right_cols]:
            out = out.withColumn(
                c, F.when(within, F.col(c)))
    return out
