"""Streaming deduplication over an append-only documents table.

The batch dedup operators (operators/dedup.py) answer "which rows of
this corpus are duplicates"; an INGEST pipeline needs the streaming
form — "is this arriving row a duplicate of anything seen so far" —
so that 10^12 rows are deduped incrementally instead of re-scanning
the corpus per delivery. Both forms below are pure Structured
Streaming (stateful dropDuplicates), no foreachBatch bookkeeping:
Spark's state store holds the seen-hash set, checkpointed and
restored across restarts.

Two state-lifecycle contracts:

- :func:`streaming_exact_dedup` — global dedup, state holds every
  content hash ever seen (8-byte keys; ~10^9 hashes/8 GB per
  executor before RocksDB state store spill matters). Exact across
  the whole stream lifetime.
- :func:`streaming_exact_dedup_watermarked` — bounded state: a
  duplicate is only suppressed when it arrives within ``horizon`` of
  the first copy's event time (dropDuplicatesWithinWatermark); older
  state is GC'd by the watermark. The 100 TB setting when unbounded
  state is unacceptable and late re-crawls may legitimately re-admit
  a document.

Reference analogue: none (the reference is batch-only); this is the
§2.8 streaming state machine pattern applied to the LLM-data dedup
brief, sharing normalized_text/xxhash64 with the batch path so batch
and streaming agree bit-for-bit on what counts as a duplicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import normalized_text


def with_content_hash(docs, text_col="text"):
    """content_hash = xxhash64 of the normalized text — the same key
    the batch exact_duplicates groupBy uses."""
    return docs.withColumn(
        "content_hash", F.xxhash64(normalized_text(F.col(text_col))))


def streaming_exact_dedup(stream_df, text_col="text"):
    """First-occurrence-wins exact dedup on a streaming DataFrame:
    rows whose normalized-content hash was already seen (any earlier
    micro-batch, or earlier in this one) are dropped. State = the
    set of seen hashes, kept in the streaming state store
    (checkpointed; grows without bound — see module docstring)."""
    return (with_content_hash(stream_df, text_col)
            .dropDuplicates(["content_hash"]))


def streaming_exact_dedup_watermarked(stream_df, ts_col="ts",
                                      horizon="24 hours",
                                      text_col="text"):
    """Bounded-state variant: suppress duplicates arriving within
    ``horizon`` (event time) of the retained copy; watermark GC
    evicts older hashes, so a duplicate older than the horizon is
    re-admitted. This is the deliberate state/recall trade for
    always-on ingest."""
    return (with_content_hash(stream_df, text_col)
            .withWatermark(ts_col, horizon)
            .dropDuplicatesWithinWatermark(["content_hash"]))
