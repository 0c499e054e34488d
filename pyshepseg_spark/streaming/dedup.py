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


def minhash_probe_writer(store_path, pairs_path, text_col="text",
                         id_col="doc_id", num_hashes=32, bands=8,
                         k=3, threshold=0.5):
    """foreachBatch prober for streaming NEAR-dup dedup (VERDICT r4
    #4): each micro-batch is MinHash-signed, probed against the
    persistent (band, bucket) signature store of every EARLIER batch,
    AND self-joined for intra-batch pairs; surviving pairs
    (est_jaccard >= threshold) land in ``pairs_path`` and the batch's
    banded signatures are appended to the store. An unordered
    near-dup pair is emitted exactly once — in the micro-batch where
    its LATER doc arrives — so the union over batches equals the
    batch operator (minhash_lsh_pairs + threshold) on the unioned
    corpus (tested).

    Idempotence: foreachBatch is at-least-once, so BOTH sinks are
    partitioned by batch_id and written with dynamic-partition
    overwrite (the stats_batch_writer pattern) — a replayed batch
    replaces its own partitions, and its store probe filters to
    batch_id < current so the replay sees exactly the pre-crash
    store. Exact-Jaccard verification on the emitted candidates
    composes downstream (dedup.ngram_jaccard_pairs over the corpus
    table) — the store deliberately holds signatures only, never
    text, so its footprint is ~300 B/doc at any corpus scale."""
    from ..operators.dedup import (minhash_band_keys,
                                   minhash_lsh_pairs,
                                   minhash_signatures_md5)

    def process(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        sigs = minhash_signatures_md5(
            batch_df, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, k=k).localCheckpoint()
        banded = minhash_band_keys(sigs, id_col=id_col,
                                   num_hashes=num_hashes,
                                   bands=bands)
        pairs = (minhash_lsh_pairs(sigs, id_col=id_col,
                                   num_hashes=num_hashes,
                                   bands=bands, materialize=False)
                 .filter(F.col("est_jaccard") >= threshold))
        from pyspark.errors import AnalysisException
        try:
            # raises eagerly (schema inference) when the store does
            # not exist yet; the probe plan below is lazy and its
            # errors propagate normally
            store = (spark.read.parquet(store_path)
                     .where(F.col("batch_id") < int(batch_id)))
            new = banded.select(F.col(id_col).alias("n_id"), "band",
                                "bucket",
                                F.col("minhash").alias("sig_n"))
            old = store.select(F.col(id_col).alias("o_id"), "band",
                               "bucket",
                               F.col("minhash").alias("sig_o"))
            match = F.aggregate(
                F.zip_with("sig_n", "sig_o",
                           lambda x, y: F.when(x == y, 1)
                           .otherwise(0)),
                F.lit(0), lambda acc, v: acc + v)
            cross = (new.join(old, ["band", "bucket"])
                     .select(F.least("n_id", "o_id").alias("a"),
                             F.greatest("n_id", "o_id").alias("b"),
                             (match / F.size("sig_n"))
                             .alias("est_jaccard"))
                     .filter(F.col("est_jaccard") >= threshold)
                     .distinct())
            pairs = pairs.union(cross)
        except AnalysisException:
            pass    # first batch: no store written yet
        (pairs.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(pairs_path))
        (banded.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(store_path))

    return process


def streaming_minhash_dedup(spark, docs_path, store_path, pairs_path,
                            checkpoint_path, schema=None,
                            text_col="text", id_col="doc_id",
                            num_hashes=32, bands=8, k=3,
                            threshold=0.5, max_files_per_trigger=1,
                            trigger_once=True):
    """Streaming MinHash-LSH near-dup ingest over an append-only
    documents table: file-source stream -> minhash_probe_writer.
    The streaming checkpoint tracks file progress, so a restart (or
    a grown table) processes only new files and the signature store
    keeps accumulating — the incremental form of the batch
    minhash_near_dups operator. A fresh checkpoint_path restarts
    batch numbering from 0 and must be paired with fresh
    store/pairs paths."""
    if schema is None:
        # the testdata documents-table shape
        schema = ("doc_id long, text string, lang string, "
                  "source string, n_chars long")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(docs_path))
    writer = (stream.writeStream
              .foreachBatch(minhash_probe_writer(
                  store_path, pairs_path, text_col=text_col,
                  id_col=id_col, num_hashes=num_hashes, bands=bands,
                  k=k, threshold=threshold))
              .option("checkpointLocation", checkpoint_path))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def simhash_probe_writer(store_path, pairs_path, text_col="text",
                         id_col="doc_id", max_hamming=3, blocks=4,
                         hash_bits=28, k=3):
    """foreachBatch prober for streaming SimHash near-dup dedup — the
    pigeonhole-blocked Hamming twin of :func:`minhash_probe_writer`.
    Each micro-batch is simhashed (the oracle-able md5-28bit form by
    default), intra-batch pairs come from the batch operator
    (simhash_near_dups — which also enforces the
    blocks >= max_hamming + 1 recall guarantee), cross-batch pairs
    from probing the persistent (block, key) store of every EARLIER
    batch with the same bit_count(xor) Hamming verify. The store
    holds (id, simhash, block, key) only — ~40 B/doc, never text.

    Idempotence contract identical to the MinHash prober: both sinks
    batch_id-partitioned + dynamic-partition overwrite, probe
    filtered to batch_id < current, so an at-least-once replay is a
    byte-identical rewrite. The union over batches equals
    simhash_near_dups on the unioned corpus (tested): an unordered
    pair is emitted exactly once, in its LATER doc's micro-batch."""
    from ..operators.dedup import (simhash_block_keys, simhash_md5,
                                   simhash_near_dups)

    def process(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        sim = simhash_md5(batch_df, text_col=text_col, id_col=id_col,
                          k=k, hash_bits=hash_bits).localCheckpoint()
        blocked = simhash_block_keys(sim, id_col=id_col,
                                     blocks=blocks,
                                     hash_bits=hash_bits)
        pairs = simhash_near_dups(sim, id_col=id_col,
                                  max_hamming=max_hamming,
                                  blocks=blocks, hash_bits=hash_bits)
        from pyspark.errors import AnalysisException
        try:
            # raises eagerly (schema inference) when the store does
            # not exist yet; the probe plan below is lazy
            store = (spark.read.parquet(store_path)
                     .where(F.col("batch_id") < int(batch_id)))
            new = blocked.select(F.col(id_col).alias("n_id"),
                                 "block", "key",
                                 F.col("simhash").alias("h_n"))
            old = store.select(F.col(id_col).alias("o_id"),
                               "block", "key",
                               F.col("simhash").alias("h_o"))
            ham = F.bit_count(F.col("h_n").bitwiseXOR(F.col("h_o")))
            cross = (new.join(old, ["block", "key"])
                     .select(F.least("n_id", "o_id").alias("a"),
                             F.greatest("n_id", "o_id").alias("b"),
                             ham.alias("hamming"))
                     .filter(F.col("hamming") <= max_hamming)
                     .distinct())
            pairs = pairs.union(cross)
        except AnalysisException:
            pass    # first batch: no store written yet
        (pairs.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(pairs_path))
        (blocked.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(store_path))

    return process


def streaming_simhash_dedup(spark, docs_path, store_path, pairs_path,
                            checkpoint_path, schema=None,
                            text_col="text", id_col="doc_id",
                            max_hamming=3, blocks=4, hash_bits=28,
                            k=3, max_files_per_trigger=1,
                            trigger_once=True):
    """Streaming SimHash near-dup ingest over an append-only
    documents table: file-source stream -> simhash_probe_writer.
    Incremental form of the batch simhash_near_dups operator; same
    restart/compaction contract as streaming_minhash_dedup (the
    signature store compacts with compact_signature_store)."""
    if schema is None:
        schema = ("doc_id long, text string, lang string, "
                  "source string, n_chars long")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(docs_path))
    writer = (stream.writeStream
              .foreachBatch(simhash_probe_writer(
                  store_path, pairs_path, text_col=text_col,
                  id_col=id_col, max_hamming=max_hamming,
                  blocks=blocks, hash_bits=hash_bits, k=k))
              .option("checkpointLocation", checkpoint_path))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def embedding_probe_writer(sketch_path, vec_path, pairs_path,
                           id_col="vec_id", vec_col="embedding",
                           threshold=0.95, bits=16, bands=4,
                           seed=42):
    """foreachBatch prober for streaming embedding-cosine near-dup —
    completing the streaming triad (MinHash, SimHash, hyperplane
    LSH). Unlike the text probers, the exact verify needs the FULL
    vectors, which are ~100x the sketch size — so the state splits
    into TWO stores instead of one: a sketch store (id, band, key —
    ~12 B/row, the probe join side) and a vector store (id, vec —
    written once per doc, fetched only for candidate pairs). Storing
    vectors per banded row, the single-store layout the text probers
    use, would multiply the dominant footprint by ``bands``.

    Per micro-batch: intra-batch pairs from the batch operator
    (embedding_near_dups), cross-batch candidates from new band keys
    ⨝ old sketch store, vectors joined back for the candidates only,
    cosine >= threshold verified with the same cosine_expr as every
    batch operator. Idempotence contract identical to the other
    probers (batch_id partitions + dynamic overwrite + probe
    filtered to batch_id < current). The hyperplane planes are a
    deterministic function of (seed, dim), so every batch derives
    identical keys; the embedding dimension must be constant across
    the stream."""
    from ..operators.dedup import (embedding_near_dups,
                                   hyperplane_band_keys)
    from ..operators.similarity import cosine_expr

    def process(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        banded = hyperplane_band_keys(
            batch_df, id_col=id_col, vec_col=vec_col, bits=bits,
            bands=bands, seed=seed).localCheckpoint()
        pairs = embedding_near_dups(batch_df, id_col=id_col,
                                    vec_col=vec_col,
                                    threshold=threshold, bits=bits,
                                    bands=bands, seed=seed)
        from pyspark.errors import AnalysisException
        try:
            sketches = (spark.read.parquet(sketch_path)
                        .where(F.col("batch_id") < int(batch_id)))
            old_vecs = (spark.read.parquet(vec_path)
                        .where(F.col("batch_id") < int(batch_id))
                        .select(F.col(id_col).alias("o_id"),
                                F.col(vec_col).alias("v_o")))
            new_keys = banded.select(F.col(id_col).alias("n_id"),
                                     "band", "key")
            old_keys = sketches.select(F.col(id_col).alias("o_id"),
                                       "band", "key")
            # candidates deduped BEFORE the vector fetch: each pair
            # pays for its two vectors + one cosine exactly once
            cand = (new_keys.join(old_keys, ["band", "key"])
                    .select("n_id", "o_id").distinct())
            new_vecs = batch_df.select(F.col(id_col).alias("n_id"),
                                       F.col(vec_col).alias("v_n"))
            cross = (cand.join(new_vecs, "n_id")
                     .join(old_vecs, "o_id")
                     .select(F.least("n_id", "o_id").alias("a"),
                             F.greatest("n_id", "o_id").alias("b"),
                             cosine_expr("v_n", "v_o")
                             .alias("cosine"))
                     .filter(F.col("cosine") >= threshold))
            pairs = pairs.union(cross)
        except AnalysisException:
            pass    # first batch: no stores written yet
        (pairs.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(pairs_path))
        (banded.drop(vec_col)
         .withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(sketch_path))
        (batch_df.select(id_col, vec_col)
         .withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(vec_path))

    return process


def streaming_embedding_dedup(spark, emb_path, sketch_path, vec_path,
                              pairs_path, checkpoint_path,
                              schema=None, id_col="vec_id",
                              vec_col="embedding", threshold=0.95,
                              bits=16, bands=4, seed=42,
                              max_files_per_trigger=1,
                              trigger_once=True):
    """Streaming embedding near-dup ingest over an append-only
    embeddings table: file-source stream -> embedding_probe_writer.
    Incremental form of the batch embedding_near_dups operator; same
    restart contract as the other streaming dedup wrappers. Both
    stores compact with compact_signature_store."""
    if schema is None:
        # the testdata embeddings-table shape
        schema = "vec_id long, embedding array<float>, label int"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(emb_path))
    writer = (stream.writeStream
              .foreachBatch(embedding_probe_writer(
                  sketch_path, vec_path, pairs_path, id_col=id_col,
                  vec_col=vec_col, threshold=threshold, bits=bits,
                  bands=bands, seed=seed))
              .option("checkpointLocation", checkpoint_path))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_signature_store(spark, store_path, target_files=8):
    """Rewrite the signature store's committed batch partitions into
    ONE compact partition (batch_id = -1, which every future probe's
    ``batch_id < current`` filter still includes). Run between
    streaming runs (stream stopped): compaction keeps probe-side scan
    cost flat as micro-batches accumulate, and replay idempotence is
    unaffected because only the in-flight batch ever replays."""
    from pyspark.sql import functions as F
    store = spark.read.parquet(store_path)
    compacted = (store.drop("batch_id")
                 .withColumn("batch_id", F.lit(-1))
                 .repartition(target_files)
                 .localCheckpoint())    # read fully before overwrite
    (compacted.write.mode("overwrite")
     .partitionBy("batch_id").parquet(store_path))
    return compacted.count()


def decontaminate_writer(bench_grams_df, out_path, text_col="text",
                         id_col="doc_id", n=13):
    """foreachBatch writer for streaming benchmark decontamination:
    each micro-batch's docs are probed against the STATIC benchmark
    gram set (dedup.contamination_flags — broadcast bench side, no
    corpus-side text shuffle) and only clean rows land in
    ``out_path``. Stateless across batches (the benchmark never
    changes mid-stream), so exactly-once comes purely from the
    batch_id dynamic-partition overwrite: a replayed batch replaces
    its own output partition bit-for-bit.

    ``bench_grams_df`` is the raw benchmark docs frame (any frame
    with a text column); gram extraction happens per batch on the
    bench side too, but Spark caches the broadcast after the first
    build — pass ``.cache()``'d input if the suite is large."""
    from ..operators.dedup import contamination_flags

    def process(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        clean = (contamination_flags(batch_df, bench_grams_df,
                                     text_col=text_col,
                                     id_col=id_col, n=n)
                 .filter("NOT contaminated")
                 .drop("n_contaminated_grams", "contaminated")
                 .withColumn("batch_id", F.lit(batch_id)))
        (clean.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(out_path))
    return process


def streaming_decontaminate(spark, docs_path, bench_path, out_path,
                            checkpoint_path, schema=None,
                            text_col="text", id_col="doc_id", n=13,
                            max_files_per_trigger=1,
                            trigger_once=True):
    """Streaming ingest decontamination: file-source stream over an
    append-only documents table -> decontaminate_writer against a
    static benchmark parquet. Restart processes only new files (the
    streaming checkpoint tracks progress); the union of all clean
    partitions equals batch decontaminate() on the full table."""
    if schema is None:
        schema = ("doc_id long, text string, lang string, "
                  "source string, n_chars long")
    bench = spark.read.parquet(bench_path).cache()
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(docs_path))
    writer = (stream.writeStream
              .foreachBatch(decontaminate_writer(
                  bench, out_path, text_col=text_col,
                  id_col=id_col, n=n))
              .option("checkpointLocation", checkpoint_path))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
