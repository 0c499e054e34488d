"""Event sessionization — gap-based sessions as windows + prefix
sums (the classic Spark formulation; no UDF).

A session breaks when the gap to the previous event of the same user
exceeds ``gap``. session_id = cumulative count of breaks (per user,
ordered by time) — the same ordered-prefix-sum motif as the
segmentation relabel (W2)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def sessionize(events, gap_minutes: int = 30,
               user_col="user_id", ts_col="ts"):
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # TIMESTAMP_NTZ (parquet) cannot cast straight to long
    secs = F.col(ts_col).cast("timestamp").cast("long")
    prev_secs = prev.cast("timestamp").cast("long")
    new_sess = (prev.isNull()
                | (secs - prev_secs > gap_minutes * 60)).cast("int")
    return (events
            .withColumn("is_new_session", new_sess)
            .withColumn("session_seq",
                        F.sum("is_new_session").over(
                            w.rowsBetween(Window.unboundedPreceding,
                                          0))))


def session_stats(events, gap_minutes: int = 30,
                  user_col="user_id", ts_col="ts",
                  value_col="value"):
    s = sessionize(events, gap_minutes, user_col, ts_col)
    return (s.groupBy(user_col, "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.round(F.sum(value_col), 2).alias("value_sum")))
