"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — deterministic synthetic images table
  (BASELINE.json input_hint schema; synthesized in-process, no
  external data) -> tiled Shepherd segmentation -> exact per-segment
  zonal stats DataFrame.
- ``queries()``: one entry per SQL-expressible operator family from
  SURVEY.md §2 (segment-stats finalizers, windows, joins,
  histogram/relabel semantics) plus the training-data operators
  (dedup, language ID, quality, token counts, similarity search),
  all over the driver's parquet tables.
- ``oracle_sql()``: DuckDB equivalents for every query except the
  two segmentation-derived ones (segmentation_zonal,
  point_in_segment), which DuckDB cannot replay — those are covered
  by the pytest reference-parity suite (bitwise vs the actual
  reference implementation, tests/test_reference_parity.py), and the
  probe-join/kNN operators additionally get oracle-checked via
  SQL-computable fixtures (pip_grid, knn_points). Near-dup hashing
  (minhash/simhash/fingerprint) uses a cross-engine md5-28bit path
  so DuckDB replays those pipelines bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    from pyshepseg_spark.sources.catalog import load_table
    return load_table(spark, f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: segmentation + zonal statistics over the synthetic
    images table (4 x 256x256x3, seeded), per the north rule."""
    from pyshepseg_spark.operators.segment import (SegConfig,
                                                   segment_images_tiled)
    from pyshepseg_spark.operators.zonal import (segment_stats,
                                                 tile_value_histogram)
    from pyshepseg_spark.sources.imagegen import generate_images_pdf

    pdf = generate_images_pdf(4, size=256, seed=42)
    pdf["num_clusters"] = [int(c.split(": ")[1].split()[0])
                           for c in pdf["caption"]]
    images = spark.createDataFrame(pdf)
    cfg = SegConfig(img_null_val=65535, four_connected=False,
                    min_segment_size=50, tile_size=128, overlap=32)
    final, _, _ = segment_images_tiled(images, cfg)
    hist = tile_value_histogram(final, img_null_val=65535)
    stats = segment_stats(hist, percentiles=(50,))
    return stats.select(
        "image_id", "seg_id", "band", "pix_count", "min_val",
        "max_val", F.round("mean_val", 4).alias("mean_val"),
        F.round("stddev_val", 4).alias("stddev_val"),
        "mode_val", "median_val").orderBy("image_id", "seg_id", "band")


# ---------------------------------------------------------------------------
# SQL-expressible operator queries (Spark side)
# ---------------------------------------------------------------------------

def _q_a1_histogram(spark, sf):
    # A1: segment-size histogram == groupBy count (partial+final agg)
    return (_t(spark, sf, "orders").groupBy("o_custkey")
            .agg(F.count("*").alias("cnt"))
            .select(F.col("o_custkey").alias("seg_id"), "cnt"))


def _q_a3_value_histogram(spark, sf):
    # A3: two-level (segment, value) histogram — the exact-stats trick
    li = _t(spark, sf, "lineitem")
    return (li.groupBy(F.col("l_suppkey").alias("seg_id"),
                       F.col("l_quantity").cast("long").alias("val"))
            .agg(F.count("*").alias("cnt")))


def _q_a5_stats_finalize(spark, sf):
    # A5: exact min/max/mean/pop-stddev/mode/median finalizers from
    # the value histogram (tilingstats.py:922-1008 semantics)
    from pyshepseg_spark.operators.zonal import segment_stats
    li = _t(spark, sf, "lineitem")
    hist = (li.groupBy(F.lit("t").alias("image_id"),
                       F.col("l_suppkey").alias("seg_id"),
                       F.lit(0).alias("band"),
                       F.col("l_quantity").cast("long").alias("val"))
            .agg(F.count("*").alias("cnt")))
    st = segment_stats(hist, percentiles=(50,))
    return st.select(
        "seg_id", "pix_count", "min_val", "max_val",
        F.round("mean_val", 4).alias("mean_val"),
        F.round("stddev_val", 4).alias("stddev_val"),
        "mode_val", "median_val")


def _q_a5_stats_named(spark, sf):
    # named stats-selection surface (makeFastStatsSelection,
    # tilingstats.py:798-863): caller-chosen column names + dtypes
    from pyshepseg_spark.operators.zonal import segment_stats_selected
    li = _t(spark, sf, "lineitem")
    hist = (li.groupBy(F.lit("t").alias("image_id"),
                       F.col("l_suppkey").alias("seg_id"),
                       F.lit(0).alias("band"),
                       F.col("l_quantity").cast("long").alias("val"))
            .agg(F.count("*").alias("cnt")))
    sel = [("B0_min", "min"), ("B0_LQ", "percentile", 25),
           ("B0_Mean", "mean"), ("B0_stdDev", "stddev"),
           ("B0_UQ", "percentile", 75), ("B0_mode", "mode"),
           ("B0_median", "median"), ("npix", "pixcount"),
           ("B0_max", "max")]
    st = segment_stats_selected(hist, sel)
    return st.select(
        "seg_id", "B0_min", "B0_LQ",
        F.round("B0_Mean", 4).alias("B0_Mean"),
        F.round("B0_stdDev", 4).alias("B0_stdDev"),
        "B0_UQ", "B0_mode", "B0_median", "npix", "B0_max")


def _q_w4_percentile_exact(spark, sf):
    # W4: exact percentile by cumulative count (25/50/75)
    from pyshepseg_spark.operators.zonal import segment_stats
    ev = _t(spark, sf, "events")
    hist = (ev.groupBy(F.lit("t").alias("image_id"),
                       F.col("user_id").alias("seg_id"),
                       F.lit(0).alias("band"),
                       F.col("value").cast("long").alias("val"))
            .agg(F.count("*").alias("cnt")))
    st = segment_stats(hist, percentiles=(25, 50, 75))
    return st.select("seg_id", "p25_val", "p50_val", "p75_val")


def _q_o4_mode_maxby(spark, sf):
    # O4: mode = top-1 by count, ties -> smallest value
    ev = _t(spark, sf, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"))
    return (
        cnt.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("user_id")
                .orderBy(F.col("cnt").desc(),
                         F.col("event_type").asc())))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"),
                F.col("cnt").alias("mode_cnt")))


def _q_w1_dense_relabel(spark, sf):
    # W1: contiguous relabel = dense_rank over surviving IDs —
    # two-phase prefix count (scalewin), never a global window
    from pyshepseg_spark.operators.scalewin import ordered_row_number
    o = _t(spark, sf, "orders")
    used = o.select(F.col("o_custkey").alias("old_id")).distinct()
    return ordered_row_number(used, ["old_id"], "new_id")


def _q_w2_prefix_offsets(spark, sf):
    # W2: global ID offsets = ordered prefix sum of per-tile counts —
    # two-phase (per-partition partials + broadcast offsets)
    from pyshepseg_spark.operators.scalewin import ordered_prefix_sum
    o = _t(spark, sf, "orders")
    per = o.groupBy("o_custkey").agg(F.count("*").alias("nseg"))
    out = ordered_prefix_sum(per, ["o_custkey"], "nseg", "offset")
    return out.select(F.col("o_custkey").alias("tile_id"), "nseg",
                      "offset")


def _q_w3_first_touch(spark, sf):
    # W3: first-touch dense recode = global row_number over min scan
    # pos, two-phase (scalewin)
    from pyshepseg_spark.operators.scalewin import ordered_row_number
    ev = _t(spark, sf, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return ordered_row_number(firsts, ["first_ts", "user_id"],
                              "new_id").select("user_id", "new_id")


def _q_s10_empty_segments(spark, sf):
    # S10: empty-segment check = anti-join against sequence(1, max)
    o = _t(spark, sf, "orders")
    sizes = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    mx = sizes.agg(F.max("o_custkey").alias("m"))
    expected = mx.select(F.explode(
        F.sequence(F.lit(1), F.col("m"))).alias("seg_id"))
    return (expected.join(sizes,
                          expected.seg_id == sizes.o_custkey,
                          "left_anti")
            .select("seg_id"))


def _q_j3_broadcast_lookup(spark, sf):
    # J3: gather per-segment mean back onto rows (broadcast join)
    li = _t(spark, sf, "lineitem")
    means = li.groupBy("l_suppkey").agg(
        F.round(F.avg("l_quantity"), 4).alias("seg_mean"))
    return (li.select("l_orderkey", "l_linenumber", "l_suppkey")
            .join(F.broadcast(means), "l_suppkey")
            .select("l_orderkey", "l_linenumber", "l_suppkey",
                    "seg_mean"))


def _q_j1_mode_correspondence(spark, sf):
    # J1: overlap-correspondence = groupBy(segA).agg(mode(segB)),
    # ties -> smallest B id (the stitch recode rule)
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    cnt = j.groupBy("c_nationkey", "o_orderpriority").agg(
        F.count("*").alias("cnt"))
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc())
    return (cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("c_nationkey").alias("seg_a"),
                    F.col("o_orderpriority").alias("mode_b"),
                    F.col("cnt").alias("mode_cnt")))


def _q_o3_min_by_nearest(spark, sf):
    # O3: nearest-neighbour argmin = top-1 by distance per entity
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").asc(), F.col("l_linenumber").asc())
    return (li.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("l_orderkey",
                    F.col("l_linenumber").alias("nearest_line"),
                    F.col("l_extendedprice").alias("min_price")))


def _q_f2_affine(spark, sf):
    # F2: 6-term affine geotransform as column arithmetic
    li = _t(spark, sf, "lineitem")
    gt = (1000.0, 0.5, 0.0, 2000.0, 0.0, -0.5)
    geox = F.lit(gt[0]) + F.col("l_linenumber") * F.lit(gt[1]) \
        + F.col("l_suppkey") * F.lit(gt[2])
    geoy = F.lit(gt[3]) + F.col("l_linenumber") * F.lit(gt[4]) \
        + F.col("l_suppkey") * F.lit(gt[5])
    return li.select("l_orderkey", "l_linenumber",
                     F.round(geox, 4).alias("geo_x"),
                     F.round(geoy, 4).alias("geo_y"))


def _q_a7_global_stats(spark, sf):
    # A7: whole-raster stats from the histogram — the real operator
    from pyshepseg_spark.operators.zonal import global_stats_from_histogram
    o = _t(spark, sf, "orders")
    sizes = o.groupBy(F.lit("img").alias("image_id"),
                      F.col("o_custkey").alias("seg_id")) \
        .agg(F.count("*").alias("cnt"))
    out = global_stats_from_histogram(sizes)
    return out.select("min_seg", "max_seg",
                      F.round("mean_seg", 4).alias("mean_seg"),
                      "pix_count", "mode_seg", "median_seg")


def _q_tpch_q1(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").cast("double").alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2)
                 .alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.count("*").alias("count_order")))


def _q_tpch_q5ish(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    li = _t(spark, sf, "lineitem")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(c, o.o_custkey == c.c_custkey)
         .join(n, c.c_nationkey == n.n_nationkey)
         .join(r, n.n_regionkey == r.r_regionkey))
    return (j.groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").alias("n_items")))


def _q_tpch_q3ish(spark, sf):
    # join + agg + deterministic top-k (order stats over revenue)
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    rev = (j.groupBy("o_orderkey", "o_orderdate")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("revenue")))
    # top-k via TakeOrderedAndProject (per-partition heaps), never a
    # global rank window over the full aggregate
    from pyshepseg_spark.operators.scalewin import bounded_topk
    top = bounded_topk(rev, [F.col("revenue").desc(),
                             F.col("o_orderkey").asc()], 10, "rk")
    return top.select("o_orderkey",
                      F.col("o_orderdate").cast("string")
                      .alias("o_orderdate"), "revenue", "rk")


def _q_tpch_q4ish(spark, sf):
    # semi-join shape (EXISTS): orders with at least one late-ish
    # line item, counted per priority — left_semi keeps the probe
    # side unduplicated, the shape Catalyst picks for EXISTS
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    late = li.filter(F.col("l_shipdate") >= F.lit("1997-01-01")) \
        .select("l_orderkey")
    return (o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


def _q_dedup_exact(spark, sf):
    from pyshepseg_spark.operators.dedup import normalized_text
    d = _t(spark, sf, "documents")
    norm = normalized_text(F.col("text"))
    per = d.groupBy(norm.alias("norm")).agg(
        F.count("*").alias("n"))
    return per.agg(
        F.sum("n").alias("n_total"),
        F.count("*").alias("n_distinct"),
        (F.sum("n") - F.count("*")).alias("n_dups"))


def _q_lang_id(spark, sf):
    from pyshepseg_spark.operators.text import language_id
    d = _t(spark, sf, "documents")
    return language_id(d).select("doc_id", "lang_pred", "lang_score")


def _q_token_counts(spark, sf):
    d = _t(spark, sf, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select("doc_id", ws.alias("n_ws_tokens"))


def _q_quality_full(spark, sf):
    # the REAL quality_score operator end to end: length/punct/
    # stopword ratios, mean word length, composite [0,1] score
    from pyshepseg_spark.operators.text import quality_score
    d = _t(spark, sf, "documents")
    q = quality_score(d)
    return q.select(
        "doc_id", "n_words",
        F.round("punct_ratio", 4).alias("punct_ratio"),
        F.round("stopword_ratio", 4).alias("stopword_ratio"),
        F.round("mean_word_len", 4).alias("mean_word_len"),
        F.round("quality", 4).alias("quality"))


def _q_ngram_jaccard(spark, sf):
    # exact word-3-gram Jaccard over a bounded candidate set
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 40)
    words = F.split(F.lower(F.col("text")), r"\s+")
    idx = F.sequence(F.lit(0),
                     F.greatest(F.size(words) - 3, F.lit(0)))
    sh = F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3))))
    s = d.select("doc_id", sh.alias("sh"))
    a = s.select(F.col("doc_id").alias("a"), F.col("sh").alias("sa"))
    b = s.select(F.col("doc_id").alias("b"), F.col("sh").alias("sb"))
    j = (a.crossJoin(b).filter(F.col("a") < F.col("b"))
         .withColumn("inter",
                     F.size(F.array_intersect("sa", "sb")))
         .withColumn("uni", F.size(F.array_union("sa", "sb"))))
    return (j.select("a", "b",
                     F.round(F.col("inter") / F.col("uni"), 4)
                     .alias("jaccard"))
            .filter(F.col("jaccard") > 0.05))


def _q_embedding_topk(spark, sf):
    from pyshepseg_spark.operators.similarity import brute_force_topk
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding")
    out = brute_force_topk(q, e, k=5)
    return out.select("q_id", "c_id", "rank")


def _q_events_windowed(spark, sf):
    ev = _t(spark, sf, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("win"),
                       "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
            .select(F.col("win.start").cast("string")
                    .alias("win_start"), "event_type", "n",
                    "value_sum"))


def _q_dedup_groups(spark, sf):
    # exact-dup groups: canonical representative = min doc_id per
    # normalized text (the SQL-expressible core of duplicate_groups)
    from pyshepseg_spark.operators.dedup import normalized_text
    d = _t(spark, sf, "documents")
    w = Window.partitionBy("norm")
    return (d.withColumn("norm", normalized_text(F.col("text")))
            .withColumn("group_rep", F.min("doc_id").over(w))
            .withColumn("group_size", F.count("*").over(w))
            .select("doc_id", "group_rep", "group_size"))


def _q_sessionization(spark, sf):
    # gap-based sessions: lag window + ordered prefix sum (W2 motif)
    from pyshepseg_spark.operators.sessions import session_stats
    ev = _t(spark, sf, "events")
    s = session_stats(ev, gap_minutes=30)
    return s.select(
        "user_id", "session_seq", "n_events",
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
        "value_sum")


def _q_minhash_near_dups(spark, sf):
    # md5-28bit hash path: the DuckDB oracle replays the identical
    # shingle->minhash->band->bucket-join pipeline bit-for-bit
    from pyshepseg_spark.operators.dedup import (minhash_lsh_pairs,
                                                 minhash_signatures_md5)
    d = _t(spark, sf, "documents")
    sigs = minhash_signatures_md5(d, num_hashes=32, k=3)
    return (minhash_lsh_pairs(sigs, num_hashes=32, bands=8)
            .filter(F.col("est_jaccard") >= 0.5)
            .select("a", "b", "est_jaccard"))


def _q_simhash_near_dups(spark, sf):
    # guaranteed-recall config: blocks > max_hamming (pigeonhole),
    # 4 blocks of 7 bits on the 28-bit oracle hash
    from pyshepseg_spark.operators.dedup import (simhash_md5,
                                                 simhash_near_dups)
    d = _t(spark, sf, "documents")
    return simhash_near_dups(simhash_md5(d, k=3), max_hamming=3,
                             blocks=4, hash_bits=28)


def _px_grid(spark, sf):
    """Deterministic 64x64 pixel grid derived from lineitem (both
    engines can build it identically): 16 segments of 16x16 px, val =
    trunc(l_quantity). Lets the U1-U3 spatial-stats UDF kernels be
    checked against pure-SQL oracles."""
    from pyshepseg_spark.operators.scalewin import bounded_topk
    li = _t(spark, sf, "lineitem")
    # first 4096 rows in key order: TakeOrderedAndProject + a rank
    # window over the 4096-row result only (no global window).
    # (l_orderkey, l_linenumber) is NOT unique in this data, so val
    # is the final sort key: rows tying on all three are
    # interchangeable — the grid is order-deterministic either way
    base = bounded_topk(
        li.select("l_orderkey", "l_linenumber",
                  F.floor("l_quantity").cast("long").alias("val")),
        [F.col("l_orderkey").asc(), F.col("l_linenumber").asc(),
         F.col("val").asc()],
        4096, "rn").select((F.col("rn") - 1).alias("rid"), "val")
    px = (base.filter(F.col("rid") < 4096)
          .select(F.lit("img").alias("image_id"),
                  (F.col("rid") % 64).alias("x"),
                  ((F.col("rid") / 64).cast("long") % 64).alias("y"),
                  "val"))
    return px.withColumn(
        "seg_id", ((F.col("x") / 16).cast("long")
                   + (F.col("y") / 16).cast("long") * 4 + 1))


_PX_CTE = """
        base AS (
            SELECT row_number() OVER (ORDER BY l_orderkey,
                       l_linenumber,
                       CAST(floor(l_quantity) AS BIGINT)) - 1 AS rid,
                   CAST(floor(l_quantity) AS BIGINT) AS val
            FROM lineitem
        ), px AS (
            SELECT 'img' AS image_id, rid % 64 AS x,
                   (rid // 64) % 64 AS y, val,
                   (rid % 64) // 16 + ((rid // 64) % 64) // 16 * 4
                       + 1 AS seg_id
            FROM base WHERE rid < 4096
        )"""


def _q_a4_nodata_count(spark, sf):
    # A4: per-segment nodata counted APART from the value histogram
    # (tilingstats.py:640-653) — exercises the REAL tile kernel
    # (binary segdata/pixels) on the SQL-predictable px-grid fixture;
    # val 30 plays the image null value
    import numpy as np
    import pandas as pd
    from pyshepseg_spark.operators.zonal import (segment_nodata_counts,
                                                 tile_value_histogram)
    px = _px_grid(spark, sf).toPandas()
    seg = np.zeros((64, 64), dtype="<i8")
    pix = np.zeros((64, 64), dtype="<u2")
    seg[px["y"].to_numpy(), px["x"].to_numpy()] = px["seg_id"].to_numpy()
    pix[px["y"].to_numpy(), px["x"].to_numpy()] = px["val"].to_numpy()
    tile = pd.DataFrame([{
        "image_id": "img", "nbands": 1, "out_xsize": 64,
        "out_ysize": 64, "pixels": pix.tobytes(),
        "segdata": seg.tobytes()}])
    hist_all = tile_value_histogram(spark.createDataFrame(tile),
                                    img_null_val=None)
    return segment_nodata_counts(hist_all, img_null_val=30) \
        .select("image_id", "seg_id", "band", "nodata_cnt",
                "valid_cnt")


def _px_grid_tiles(spark, sf, nsplit=2):
    """The px-grid fixture as nsplit x nsplit REAL binary mosaic
    tiles (segdata int64 + pixels u2), so the tile-decomposed spatial
    stats (strip exchange included) run under the DuckDB oracle."""
    import numpy as np
    import pandas as pd
    px = _px_grid(spark, sf).toPandas()
    seg = np.zeros((64, 64), dtype="<i8")
    pix = np.zeros((64, 64), dtype="<u2")
    seg[px["y"].to_numpy(), px["x"].to_numpy()] = px["seg_id"].to_numpy()
    pix[px["y"].to_numpy(), px["x"].to_numpy()] = px["val"].to_numpy()
    step = 64 // nsplit
    rows = []
    for tr in range(nsplit):
        for tc in range(nsplit):
            sl = (slice(tr * step, (tr + 1) * step),
                  slice(tc * step, (tc + 1) * step))
            rows.append({
                "image_id": "img", "tcol": tc, "trow": tr,
                "xout": tc * step, "yout": tr * step,
                "out_xsize": step, "out_ysize": step, "nbands": 1,
                "pixels": np.ascontiguousarray(pix[sl]).tobytes(),
                "segdata": np.ascontiguousarray(seg[sl]).tobytes()})
    return spark.createDataFrame(pd.DataFrame(rows))


def _q_u3_edge_pixels_tiled(spark, sf):
    # the SCALE-PATH U3 (per-tile partials + perimeter strip
    # exchange) under the same relational neighbour-count oracle —
    # 2x2 mosaic tiles so cross-tile resolution is exercised
    from pyshepseg_spark.operators.spatialstats import edge_pixels_tiled
    return edge_pixels_tiled(_px_grid_tiles(spark, sf),
                             four_connected=True)


def _q_u1_variogram_tiled(spark, sf):
    from pyshepseg_spark.operators.spatialstats import variogram_tiled
    out = variogram_tiled(_px_grid_tiles(spark, sf), max_dist=2)
    return out.select("image_id", "seg_id",
                      F.round("variogram_1", 6).alias("variogram_1"),
                      F.round("variogram_2", 6).alias("variogram_2"))


def _q_u2_mean_coords(spark, sf):
    from pyshepseg_spark.operators.spatialstats import mean_coords
    px = _px_grid(spark, sf)
    return mean_coords(px, geotransform=(100.0, 0.5, 0.0,
                                         200.0, 0.0, -0.5))


def _q_u3_edge_pixels(spark, sf):
    # the REAL applyInPandas kernel (densify-to-bbox + shifted-mask
    # sums) checked against a relational neighbour-count oracle
    from pyshepseg_spark.operators.spatialstats import (
        apply_segment_udf, edge_pixels_udf)
    px = _px_grid(spark, sf)
    func, schema = edge_pixels_udf(four_connected=True)
    return apply_segment_udf(px, func, schema)


def _q_u1_variogram(spark, sf):
    from pyshepseg_spark.operators.spatialstats import (
        apply_segment_udf, variogram_udf)
    px = _px_grid(spark, sf)
    func, schema = variogram_udf(max_dist=2)
    out = apply_segment_udf(px, func, schema)
    return out.select("image_id", "seg_id",
                      F.round("variogram_1", 6).alias("variogram_1"),
                      F.round("variogram_2", 6).alias("variogram_2"))


def _q_fingerprint(spark, sf):
    from pyshepseg_spark.operators.text import fingerprint_md5
    d = _t(spark, sf, "documents")
    return fingerprint_md5(d, k=3, window=8)


def _q_colour_stretch(spark, sf):
    # W5 percentile stretch + ramp (utils.py:162-230) demonstrated on
    # a SQL-visible stats table: per-customer order counts
    from pyshepseg_spark.operators.colortables import colour_ramp_from_stat
    o = _t(spark, sf, "orders")
    stats = (o.groupBy(F.col("o_custkey").alias("seg_id"))
             .agg(F.count("*").cast("double").alias("stat"))
             .withColumn("image_id", F.lit("img")))
    return colour_ramp_from_stat(stats, "stat")


def _q_a8_centre_dist(spark, sf):
    # A8 autoMaxSpectralDiff (shepseg.py:400-449): percentile of the
    # C(k,2) pairwise centre distances + the 10*max fallback, over
    # deterministic 3-band centres derived from part
    p = _t(spark, sf, "part").filter(F.col("p_partkey") <= 8).select(
        F.col("p_partkey").alias("cid"),
        ((F.col("p_partkey") * 17) % 100).alias("b0"),
        ((F.col("p_partkey") * 29) % 100).alias("b1"),
        ((F.col("p_partkey") * 43) % 100).alias("b2"))
    a = p.select(F.col("cid").alias("i"), F.col("b0").alias("a0"),
                 F.col("b1").alias("a1"), F.col("b2").alias("a2"))
    b = p.select(F.col("cid").alias("j"), F.col("b0").alias("c0"),
                 F.col("b1").alias("c1"), F.col("b2").alias("c2"))
    def sq(u, v):
        return (F.col(u) - F.col(v)) * (F.col(u) - F.col(v))

    d = (a.crossJoin(b).filter(F.col("i") < F.col("j"))
         .select(F.sqrt(sq("a0", "c0") + sq("a1", "c1")
                        + sq("a2", "c2")).alias("dist")))
    return d.agg(
        F.round(F.expr("percentile(dist, 0.5)"), 4)
        .alias("spect_diff_p50"),
        F.round(F.max("dist") * 10, 4).alias("spect_diff_fallback"))


def _q_cosine_near_dups(spark, sf):
    # exact embedding-cosine near-dup pairs (the correctness baseline
    # for embedding_near_dups' LSH scale path): broadcast cross join,
    # JVM-side dot products, threshold filter. Output keeps ids only
    # (floats are engine-precision-sensitive).
    from pyshepseg_spark.operators.similarity import _dot, _norm
    from pyshepseg_spark.operators.skew import spread_small_scan
    e = _t(spark, sf, "embeddings")
    a = spread_small_scan(e).select(F.col("vec_id").alias("a"),
                                    F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"),
                 F.col("embedding").alias("vb"))
    j = a.crossJoin(F.broadcast(b)).filter(F.col("a") < F.col("b"))
    cos = _dot("va", "vb") / (_norm("va") * _norm("vb"))
    return (j.withColumn("cosine", cos)
            .filter(F.col("cosine") >= 0.4)
            .select("a", "b"))


def _q_ivf_topk(spark, sf):
    # IVF ANN with exhaustive probing (nprobe = n_cells): must equal
    # the brute-force oracle exactly — validates the cell-assignment
    # plumbing and the per-cell equi-join; recall<1 trade-off paths
    # are covered by pytest
    from pyshepseg_spark.operators.similarity import (ivf_topk,
                                                      train_ivf_centroids)
    e = _t(spark, sf, "embeddings")
    cent = train_ivf_centroids(e, n_cells=8)
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding")
    out = ivf_topk(q, e, cent, k=5, nprobe=8)
    return out.select("q_id", "c_id", "rank")


def _q_knn_points(spark, sf):
    # exact kNN join (cell-grid candidates + provable-bound
    # fallback) over deterministic integer coordinates derived from
    # customer (points) and supplier (sites)
    from pyshepseg_spark.operators.spatial import knn_points_exact
    cust = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 131) % 1024).alias("x"),
        ((F.col("c_custkey") * 211) % 1024).alias("y"))
    supp = _t(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("sid"),
        ((F.col("s_suppkey") * 197) % 1024).alias("x"),
        ((F.col("s_suppkey") * 313) % 1024).alias("y"))
    out = knn_points_exact(cust, supp, k=3, cell_size=64, ring=1,
                           p_id="pid", s_id="sid")
    return out.select("point_id", "site_id",
                      F.col("d2").cast("long").alias("d2"), "rank")


def _q_segmentation_zonal(spark, sf):
    # raster flagship (no SQL oracle; verified by pytest fixtures)
    return entry(spark)


def _q_point_in_segment(spark, sf):
    import pandas as pd
    from pyshepseg_spark.operators.segment import (SegConfig,
                                                   segment_images_tiled)
    from pyshepseg_spark.operators.spatial import point_in_segment
    from pyshepseg_spark.sources.imagegen import (caption_points,
                                                  generate_images_pdf)
    pdf = generate_images_pdf(2, size=256, seed=42)
    pdf["num_clusters"] = [int(c.split(": ")[1].split()[0])
                           for c in pdf["caption"]]
    cfg = SegConfig(img_null_val=65535, four_connected=False,
                    min_segment_size=50, tile_size=128, overlap=32)
    final, _, _ = segment_images_tiled(
        spark.createDataFrame(pdf), cfg)
    pts = pd.concat([caption_points(r.image_id, r.caption, r.w, r.h)
                     for r in pdf.itertuples()], ignore_index=True)
    return point_in_segment(spark.createDataFrame(pts), final,
                            cfg.tile_size, cfg.overlap)


def _q_image_features(spark, sf):
    # multimodal decode + per-(image, band) stats via mapInPandas
    # over the binary column, deterministic synthetic images. The
    # oracle (below) replays the seeded generator recipe WITHOUT the
    # codec, so the PNG decode path is value-checked end to end.
    from pyshepseg_spark.operators.multimodal import image_features
    from pyshepseg_spark.sources.imagegen import generate_images_pdf
    pdf = generate_images_pdf(8, size=128, seed=42)
    return image_features(spark.createDataFrame(pdf),
                          img_null_val=65535)


def _image_features_oracle(n=8, size=128, seed=42,
                           null_val=65535) -> str:
    """DuckDB VALUES-literal oracle for image_features: regenerates
    the fixture pixels from the imagegen building blocks (seeded
    Voronoi paint — same RNG call order as generate_image) but never
    touches the byte codec, so the Spark side's encode->decode round
    trip is independently value-checked. Doubles are emitted at full
    repr precision (exact IEEE754 round trip in DuckDB)."""
    import numpy as np

    from pyshepseg_spark.sources.imagegen import (NULL_MARGIN,
                                                  make_pallete,
                                                  paint_image,
                                                  voronoi_truth)
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        w = h = size
        k = int(rng.integers(12, 25))
        margin = NULL_MARGIN + 2
        centres = np.stack([
            rng.uniform(margin, w - margin, size=k),
            rng.uniform(margin, h - margin, size=k)], axis=1)
        truth = voronoi_truth(w, h, centres)
        img = paint_image(truth, make_pallete(k, rng))
        valid = (img != null_val).all(axis=0)
        vx = img.astype(np.float64)[:, valid]
        frac = float(valid.mean())
        # exponent notation forces DuckDB to parse the literal as
        # DOUBLE (plain decimals become DECIMAL -> double rounding)
        def dbl(x):
            return format(float(x), ".17e")

        for b in range(img.shape[0]):
            rows.append(
                f"('img_{i:06d}', {b}, {w}, {h}, {img.shape[0]}, "
                f"{dbl(vx[b].mean())}, {dbl(vx[b].std())}, "
                f"{dbl(frac)})")
    vals = ",\n               ".join(rows)
    return f"""
        SELECT image_id, CAST(band AS INTEGER) AS band,
               CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
               CAST(nbands AS INTEGER) AS nbands,
               CAST(band_mean AS DOUBLE) AS band_mean,
               CAST(band_std AS DOUBLE) AS band_std,
               CAST(nonnull_frac AS DOUBLE) AS nonnull_frac
        FROM (VALUES {vals})
             AS t(image_id, band, w, h, nbands, band_mean, band_std,
                  nonnull_frac)
    """


def _q_embedding_near_dups_lsh(spark, sf):
    # LSH scale path for embedding near-dups. The oracle is the
    # EXACT all-pairs cosine join in DuckDB: at threshold 0.999 the
    # qualifying pairs are exactly the planted scaled copies (a
    # scaled vector keeps cosine == 1 and the identical hyperplane
    # sketch, so banded LSH recovers them with recall 1), while the
    # corpus's natural max pairwise cosine is ~0.51 — far from the
    # threshold, so LSH's probabilistic recall never decides a pair.
    from pyshepseg_spark.operators.dedup import embedding_near_dups
    e = _t(spark, sf, "embeddings")
    # plant deterministic near-dups: scaled copies keep cosine == 1
    # and the same hyperplane sketch, so LSH must recover them
    dup = (e.filter(F.col("vec_id") < 20)
           .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                   F.transform("embedding",
                               lambda x: x * F.lit(1.0001))
                   .alias("embedding"),
                   "label"))
    out = embedding_near_dups(e.unionByName(dup),
                              threshold=0.999, bits=12)
    return out.select("a", "b",
                      F.round("cosine", 4).alias("cosine"))


def _q_range_join(spark, sf):
    # bucketed interval-containment join: customers (points) against
    # part-derived intervals; oracle is the plain theta join
    from pyshepseg_spark.operators.spatial import range_join
    pts = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 91) % 1000).alias("v"))
    ivl = _t(spark, sf, "part").filter(F.col("p_partkey") <= 200) \
        .select(F.col("p_partkey").alias("iid"),
                ((F.col("p_partkey") * 37) % 1000).alias("lo")) \
        .withColumn("hi", F.col("lo") + (F.col("iid") % 50) + 1)
    return range_join(pts, ivl, point_id="pid", interval_id="iid")


def _q_morton_cells(spark, sf):
    # the engine's Morton (Z-order) cell index as a pure column
    # expression, oracle-checked bit for bit
    from pyshepseg_spark.operators.spatial import cell_expr
    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 37) % 4096).alias("x"),
        ((F.col("c_custkey") * 59) % 4096).alias("y"))
    return c.select("pid", "x", "y",
                    cell_expr("x", "y", shift=6, bits=12)
                    .alias("cell"))


def _morton_oracle() -> str:
    xb = " + ".join(
        f"((( (x // 64) >> {i}) & 1) << {2 * i})" for i in range(12))
    yb = " + ".join(
        f"((( (y // 64) >> {i}) & 1) << {2 * i + 1})"
        for i in range(12))
    return f"""
        WITH c AS (
            SELECT c_custkey AS pid,
                   (c_custkey * 37) % 4096 AS x,
                   (c_custkey * 59) % 4096 AS y
            FROM customer
        )
        SELECT pid, x, y,
               CAST({xb} + {yb} AS BIGINT) AS cell
        FROM c
    """


def _q_asof_join(spark, sf):
    # custom operator Spark lacks: backward as-of join (clicks pick
    # up the most recent prior view per user), window-based — DuckDB
    # oracle uses its native ASOF JOIN
    from pyshepseg_spark.operators.asof import asof_join
    ev = _t(spark, sf, "events")
    # unique (user, ts) per side for determinism
    clicks = (ev.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.round(F.max("value"), 4).alias("value")))
    views = (ev.filter(F.col("event_type") == "view")
             .groupBy("user_id", "ts")
             .agg(F.round(F.max("value"), 4).alias("value")))
    out = asof_join(clicks, views, on="ts", by=("user_id",),
                    right_cols=("value",))
    return out.select(
        "user_id", F.col("ts").cast("string").alias("ts"), "value",
        F.col("ts_r").cast("string").alias("ts_r"),
        F.col("value_r").cast("double").alias("value_r"))


def _q_pip_grid(spark, sf):
    """The REAL point_in_segment probe join (grid arithmetic ->
    equi-join -> vectorized raster probe) against a deterministic
    64x64 single-tile segmentation whose raster is SQL-computable
    (seg = x//16 + 4*(y//16) + 1), so DuckDB can predict every
    probe's answer."""
    import numpy as np
    import pandas as pd
    from pyshepseg_spark.operators.spatial import point_in_segment
    yy, xx = np.mgrid[0:64, 0:64]
    seg = (xx // 16 + (yy // 16) * 4 + 1).astype("<i8")
    tile = pd.DataFrame([{
        "image_id": "img", "tcol": 0, "trow": 0, "xout": 0,
        "yout": 0, "out_xsize": 64, "out_ysize": 64,
        "segdata": seg.tobytes()}])
    cust = _t(spark, sf, "customer").select(
        F.lit("img").alias("image_id"),
        F.col("c_custkey").alias("point_id"),
        ((F.col("c_custkey") * 37) % 64).cast("double").alias("x"),
        ((F.col("c_custkey") * 59) % 64).cast("double").alias("y"))
    out = point_in_segment(cust, spark.createDataFrame(tile),
                           tile_size=64, overlap=0)
    return out.select("point_id", F.col("x").cast("long").alias("x"),
                      F.col("y").cast("long").alias("y"), "seg_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "a1_histogram": _q_a1_histogram,
        "a3_value_histogram": _q_a3_value_histogram,
        "a5_stats_finalize": _q_a5_stats_finalize,
        "a5_stats_named": _q_a5_stats_named,
        "w4_percentile_exact": _q_w4_percentile_exact,
        "o4_mode_maxby": _q_o4_mode_maxby,
        "w1_dense_relabel": _q_w1_dense_relabel,
        "w2_prefix_offsets": _q_w2_prefix_offsets,
        "w3_first_touch": _q_w3_first_touch,
        "s10_empty_segments": _q_s10_empty_segments,
        "j3_broadcast_lookup": _q_j3_broadcast_lookup,
        "j1_mode_correspondence": _q_j1_mode_correspondence,
        "o3_min_by_nearest": _q_o3_min_by_nearest,
        "f2_affine": _q_f2_affine,
        "a7_global_stats": _q_a7_global_stats,
        "a4_nodata_count": _q_a4_nodata_count,
        "tpch_q1": _q_tpch_q1,
        "tpch_q5ish": _q_tpch_q5ish,
        "tpch_q3ish": _q_tpch_q3ish,
        "tpch_q4ish": _q_tpch_q4ish,
        # early placement on purpose: the driver enumerates at most
        # 50 queries, and these two fell off the tail in round 2
        "image_features": _q_image_features,
        "embedding_near_dups_lsh": _q_embedding_near_dups_lsh,
        "dedup_exact": _q_dedup_exact,
        "lang_id": _q_lang_id,
        "token_counts": _q_token_counts,
        "quality_full": _q_quality_full,
        "ngram_jaccard": _q_ngram_jaccard,
        "embedding_topk": _q_embedding_topk,
        "events_windowed": _q_events_windowed,
        "sessionization": _q_sessionization,
        "dedup_groups": _q_dedup_groups,
        "minhash_near_dups": _q_minhash_near_dups,
        "simhash_near_dups": _q_simhash_near_dups,
        "knn_points": _q_knn_points,
        "cosine_near_dups": _q_cosine_near_dups,
        "ivf_topk": _q_ivf_topk,
        "fingerprint": _q_fingerprint,
        "u1_variogram": _q_u1_variogram,
        "u1_variogram_tiled": _q_u1_variogram_tiled,
        "u3_edge_pixels_tiled": _q_u3_edge_pixels_tiled,
        "u2_mean_coords": _q_u2_mean_coords,
        "u3_edge_pixels": _q_u3_edge_pixels,
        "colour_stretch": _q_colour_stretch,
        "a8_centre_dist": _q_a8_centre_dist,
        "segmentation_zonal": _q_segmentation_zonal,
        "point_in_segment": _q_point_in_segment,
        "pip_grid": _q_pip_grid,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "morton_cells": _q_morton_cells,
    }


def oracle_sql() -> dict[str, str]:
    d = {
        "a1_histogram": """
            SELECT o_custkey AS seg_id, COUNT(*) AS cnt
            FROM orders GROUP BY o_custkey
        """,
        "a3_value_histogram": """
            SELECT l_suppkey AS seg_id,
                   CAST(trunc(l_quantity) AS BIGINT) AS val,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        """,
        "a5_stats_finalize": """
            WITH hist AS (
                SELECT l_suppkey AS seg_id,
                       CAST(trunc(l_quantity) AS BIGINT) AS val,
                       COUNT(*) AS cnt
                FROM lineitem GROUP BY 1, 2
            ), base AS (
                SELECT seg_id,
                       CAST(SUM(cnt) AS BIGINT) AS pix_count,
                       MIN(val) AS min_val, MAX(val) AS max_val,
                       ROUND(SUM(val * cnt) * 1.0 / SUM(cnt), 4)
                           AS mean_val
                FROM hist GROUP BY seg_id
            ), sd AS (
                SELECT h.seg_id,
                       ROUND(SQRT(SUM(h.cnt * POW(h.val -
                           (SELECT SUM(val*cnt)*1.0/SUM(cnt)
                            FROM hist h2
                            WHERE h2.seg_id = h.seg_id), 2))
                           / SUM(h.cnt)), 4) AS stddev_val
                FROM hist h GROUP BY h.seg_id
            ), mode_t AS (
                SELECT seg_id, val AS mode_val FROM (
                    SELECT seg_id, val, ROW_NUMBER() OVER (
                        PARTITION BY seg_id
                        ORDER BY cnt DESC, val ASC) AS rn
                    FROM hist) WHERE rn = 1
            ), med AS (
                SELECT seg_id, MIN(val) AS median_val FROM (
                    SELECT seg_id, val,
                           SUM(cnt) OVER (PARTITION BY seg_id
                               ORDER BY val) AS cum,
                           SUM(cnt) OVER (PARTITION BY seg_id) AS n
                    FROM hist)
                WHERE cum >= n * 50.0 / 100 GROUP BY seg_id
            )
            SELECT b.seg_id, b.pix_count, b.min_val, b.max_val,
                   b.mean_val, sd.stddev_val, mode_t.mode_val,
                   med.median_val
            FROM base b
            JOIN sd USING (seg_id)
            JOIN mode_t USING (seg_id)
            JOIN med USING (seg_id)
        """,
        "a5_stats_named": """
            WITH hist AS (
                SELECT l_suppkey AS seg_id,
                       CAST(trunc(l_quantity) AS BIGINT) AS val,
                       COUNT(*) AS cnt
                FROM lineitem GROUP BY 1, 2
            ), cum AS (
                SELECT seg_id, val, cnt,
                       SUM(cnt) OVER (PARTITION BY seg_id
                           ORDER BY val) AS cum,
                       SUM(cnt) OVER (PARTITION BY seg_id) AS n
                FROM hist
            ), base AS (
                SELECT seg_id, MIN(val) AS B0_min, MAX(val) AS B0_max,
                       CAST(SUM(cnt) AS BIGINT) AS npix,
                       ROUND(SUM(val * cnt) * 1.0 / SUM(cnt), 4)
                           AS B0_Mean,
                       ROUND(SQRT(greatest(
                           SUM(val * val * cnt) * 1.0 / SUM(cnt)
                           - POW(SUM(val * cnt) * 1.0 / SUM(cnt), 2),
                           0)), 4) AS B0_stdDev,
                       (SELECT MIN(val) FROM cum c WHERE
                            c.seg_id = hist.seg_id
                            AND c.cum >= c.n * 25.0 / 100) AS B0_LQ,
                       (SELECT MIN(val) FROM cum c WHERE
                            c.seg_id = hist.seg_id
                            AND c.cum >= c.n * 50.0 / 100) AS B0_median,
                       (SELECT MIN(val) FROM cum c WHERE
                            c.seg_id = hist.seg_id
                            AND c.cum >= c.n * 75.0 / 100) AS B0_UQ
                FROM hist GROUP BY seg_id
            ), mode_t AS (
                SELECT seg_id, val AS B0_mode FROM (
                    SELECT seg_id, val, ROW_NUMBER() OVER (
                        PARTITION BY seg_id
                        ORDER BY cnt DESC, val ASC) AS rn
                    FROM hist) WHERE rn = 1
            )
            SELECT b.seg_id, b.B0_min, b.B0_LQ, b.B0_Mean,
                   b.B0_stdDev, b.B0_UQ, m.B0_mode, b.B0_median,
                   b.npix, b.B0_max
            FROM base b JOIN mode_t m USING (seg_id)
        """,
        "w4_percentile_exact": """
            WITH hist AS (
                SELECT user_id AS seg_id,
                       CAST(trunc(value) AS BIGINT) AS val, COUNT(*) AS cnt
                FROM events GROUP BY 1, 2
            ), cum AS (
                SELECT seg_id, val,
                       SUM(cnt) OVER (PARTITION BY seg_id
                           ORDER BY val) AS cum,
                       SUM(cnt) OVER (PARTITION BY seg_id) AS n
                FROM hist
            )
            SELECT seg_id,
                (SELECT MIN(val) FROM cum c2 WHERE c2.seg_id = c.seg_id
                    AND c2.cum >= c2.n * 25.0/100) AS p25_val,
                (SELECT MIN(val) FROM cum c2 WHERE c2.seg_id = c.seg_id
                    AND c2.cum >= c2.n * 50.0/100) AS p50_val,
                (SELECT MIN(val) FROM cum c2 WHERE c2.seg_id = c.seg_id
                    AND c2.cum >= c2.n * 75.0/100) AS p75_val
            FROM cum c GROUP BY seg_id
        """,
        "o4_mode_maxby": """
            SELECT user_id, event_type AS mode_type,
                   cnt AS mode_cnt FROM (
                SELECT user_id, event_type, COUNT(*) AS cnt,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY COUNT(*) DESC, event_type ASC)
                           AS rn
                FROM events GROUP BY user_id, event_type)
            WHERE rn = 1
        """,
        "w1_dense_relabel": """
            SELECT old_id,
                   DENSE_RANK() OVER (ORDER BY old_id) AS new_id
            FROM (SELECT DISTINCT o_custkey AS old_id FROM orders)
        """,
        "w2_prefix_offsets": """
            SELECT o_custkey AS tile_id, COUNT(*) AS nseg,
                   CAST(COALESCE(SUM(COUNT(*)) OVER (
                       ORDER BY o_custkey ROWS BETWEEN UNBOUNDED
                       PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                       AS offset
            FROM orders GROUP BY o_custkey
        """,
        "w3_first_touch": """
            SELECT user_id, ROW_NUMBER() OVER (
                ORDER BY MIN(ts), user_id) AS new_id
            FROM events GROUP BY user_id
        """,
        "s10_empty_segments": """
            WITH mx AS (SELECT MAX(o_custkey) AS m FROM orders)
            SELECT gs.seg_id
            FROM (SELECT UNNEST(generate_series(1,
                      (SELECT m FROM mx))) AS seg_id) gs
            LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
                ON gs.seg_id = o.o_custkey
            WHERE o.o_custkey IS NULL
        """,
        "j3_broadcast_lookup": """
            SELECT li.l_orderkey, li.l_linenumber, li.l_suppkey,
                   m.seg_mean
            FROM lineitem li
            JOIN (SELECT l_suppkey,
                         ROUND(AVG(l_quantity), 4) AS seg_mean
                  FROM lineitem GROUP BY l_suppkey) m
            USING (l_suppkey)
        """,
        "j1_mode_correspondence": """
            SELECT c_nationkey AS seg_a,
                   o_orderpriority AS mode_b, cnt AS mode_cnt FROM (
                SELECT c.c_nationkey, o.o_orderpriority,
                       COUNT(*) AS cnt,
                       ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                           ORDER BY COUNT(*) DESC,
                                    o.o_orderpriority ASC) AS rn
                FROM orders o JOIN customer c
                    ON o.o_custkey = c.c_custkey
                GROUP BY c.c_nationkey, o.o_orderpriority)
            WHERE rn = 1
        """,
        "o3_min_by_nearest": """
            SELECT l_orderkey, l_linenumber AS nearest_line,
                   l_extendedprice AS min_price FROM (
                SELECT l_orderkey, l_linenumber, l_extendedprice,
                       ROW_NUMBER() OVER (PARTITION BY l_orderkey
                           ORDER BY l_extendedprice ASC,
                                    l_linenumber ASC) AS rn
                FROM lineitem) WHERE rn = 1
        """,
        "f2_affine": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(1000.0 + l_linenumber * 0.5
                         + l_suppkey * 0.0, 4) AS geo_x,
                   ROUND(2000.0 + l_linenumber * 0.0
                         + l_suppkey * -0.5, 4) AS geo_y
            FROM lineitem
        """,
        "a7_global_stats": """
            WITH sizes AS (
                SELECT o_custkey, COUNT(*) AS cnt
                FROM orders GROUP BY o_custkey)
            SELECT MIN(o_custkey) AS min_seg,
                   MAX(o_custkey) AS max_seg,
                   ROUND(SUM(o_custkey * cnt) * 1.0 / SUM(cnt), 4)
                       AS mean_seg,
                   CAST(SUM(cnt) AS BIGINT) AS pix_count,
                   (SELECT o_custkey FROM sizes
                    ORDER BY cnt DESC, o_custkey ASC LIMIT 1)
                       AS mode_seg,
                   (SELECT o_custkey FROM (
                        SELECT o_custkey,
                               SUM(cnt) OVER (ORDER BY o_custkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum,
                               SUM(cnt) OVER () / 2.0 AS half
                        FROM sizes)
                    WHERE cum >= half ORDER BY o_custkey LIMIT 1)
                       AS median_seg
            FROM sizes
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q5ish": """
            SELECT n.n_name,
                   ROUND(SUM(li.l_extendedprice
                             * (1 - li.l_discount)), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem li
            JOIN orders o ON li.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY n.n_name
        """,
        "dedup_exact": """
            WITH per AS (
                SELECT lower(trim(regexp_replace(text, '\\s+', ' ',
                    'g'))) AS norm, COUNT(*) AS n
                FROM documents GROUP BY 1)
            SELECT CAST(SUM(n) AS BIGINT) AS n_total,
                   COUNT(*) AS n_distinct,
                   CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dups
            FROM per
        """,
        "lang_id": _lang_id_oracle(),
        "minhash_near_dups": _minhash_oracle(),
        "simhash_near_dups": _simhash_oracle(),
        "fingerprint": _fingerprint_oracle(),
        "tpch_q3ish": """
            WITH rev AS (
                SELECT o_orderkey, o_orderdate,
                       ROUND(SUM(l_extendedprice * (1 - l_discount)),
                             2) AS revenue
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                GROUP BY o_orderkey, o_orderdate
            )
            SELECT o_orderkey,
                   CAST(o_orderdate AS VARCHAR) AS o_orderdate,
                   revenue,
                   CAST(row_number() OVER (ORDER BY revenue DESC,
                       o_orderkey) AS INT) AS rk
            FROM rev QUALIFY rk <= 10
        """,
        "range_join": """
            WITH pts AS (
                SELECT c_custkey AS point_id,
                       (c_custkey * 91) % 1000 AS v
                FROM customer
            ), ivl AS (
                SELECT p_partkey AS interval_id,
                       (p_partkey * 37) % 1000 AS lo,
                       (p_partkey * 37) % 1000
                           + (p_partkey % 50) + 1 AS hi
                FROM part WHERE p_partkey <= 200
            )
            SELECT point_id, interval_id, v, lo, hi
            FROM pts JOIN ivl ON v >= lo AND v <= hi
        """,
        "morton_cells": _morton_oracle(),
        "asof_join": """
            WITH clicks AS (
                SELECT user_id, ts, ROUND(MAX(value), 4) AS value
                FROM events WHERE event_type = 'click'
                GROUP BY user_id, ts
            ), views AS (
                SELECT user_id, ts, ROUND(MAX(value), 4) AS value
                FROM events WHERE event_type = 'view'
                GROUP BY user_id, ts
            )
            SELECT c.user_id, CAST(c.ts AS VARCHAR) AS ts, c.value,
                   CAST(v.ts AS VARCHAR) AS ts_r,
                   v.value AS value_r
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.ts >= v.ts
        """,
        "pip_grid": """
            SELECT c_custkey AS point_id,
                   (c_custkey * 37) % 64 AS x,
                   (c_custkey * 59) % 64 AS y,
                   ((c_custkey * 37) % 64) // 16
                       + (((c_custkey * 59) % 64) // 16) * 4 + 1
                       AS seg_id
            FROM customer
        """,
        "a4_nodata_count": f"""
            WITH {_PX_CTE}
            SELECT 'img' AS image_id, seg_id, CAST(0 AS INT) AS band,
                   CAST(SUM(CASE WHEN val = 30 THEN 1 ELSE 0 END)
                       AS BIGINT) AS nodata_cnt,
                   CAST(SUM(CASE WHEN val <> 30 THEN 1 ELSE 0 END)
                       AS BIGINT) AS valid_cnt
            FROM px GROUP BY seg_id
        """,
        "u2_mean_coords": f"""
            WITH {_PX_CTE}
            SELECT image_id, seg_id,
                   AVG(100.0 + x * 0.5 + y * 0.0) AS mean_easting,
                   AVG(200.0 + x * 0.0 + y * -0.5) AS mean_northing
            FROM px GROUP BY image_id, seg_id
        """,
        "u3_edge_pixels": f"""
            WITH {_PX_CTE}, nbr AS (
                SELECT p.image_id, p.seg_id, p.x, p.y,
                       COUNT(q.x) AS n
                FROM px p LEFT JOIN px q
                  ON q.image_id = p.image_id
                 AND q.seg_id = p.seg_id
                 AND abs(q.x - p.x) + abs(q.y - p.y) = 1
                GROUP BY p.image_id, p.seg_id, p.x, p.y
            )
            SELECT image_id, seg_id,
                   CAST(SUM(CASE WHEN n < 4 THEN 1 ELSE 0 END)
                       AS BIGINT) AS num_edge_pixels
            FROM nbr GROUP BY image_id, seg_id
        """,
        "u1_variogram": f"""
            WITH {_PX_CTE}, pairs AS (
                -- reference userFuncVariogram semantics: offsets
                -- (dy, dx) BOTH in 1..max_dist, TRUNCATED distance
                SELECT p.image_id, p.seg_id,
                       CAST(trunc(sqrt((q.x - p.x) * (q.x - p.x)
                           + (q.y - p.y) * (q.y - p.y))) AS INT)
                           AS lag,
                       (q.val - p.val) * (q.val - p.val) AS dv2
                FROM px p JOIN px q
                  ON q.image_id = p.image_id
                 AND q.seg_id = p.seg_id
                 AND q.y - p.y BETWEEN 1 AND 2
                 AND q.x - p.x BETWEEN 1 AND 2
            )
            SELECT image_id, seg_id,
                   ROUND(sqrt(SUM(CASE WHEN lag = 1 THEN dv2 END)
                       * 1.0 / COUNT(CASE WHEN lag = 1 THEN 1 END)),
                       6) AS variogram_1,
                   ROUND(sqrt(SUM(CASE WHEN lag = 2 THEN dv2 END)
                       * 1.0 / COUNT(CASE WHEN lag = 2 THEN 1 END)),
                       6) AS variogram_2
            FROM pairs GROUP BY image_id, seg_id
        """,
        "colour_stretch": """
            WITH stats AS (
                SELECT o_custkey AS seg_id,
                       CAST(COUNT(*) AS DOUBLE) AS stat
                FROM orders GROUP BY o_custkey
            ), pct AS (
                SELECT quantile_cont(stat, 0.05) AS lo,
                       quantile_cont(stat, 0.95) AS hi
                FROM stats
            ), scaled AS (
                SELECT seg_id,
                       CASE WHEN hi > lo THEN CAST(trunc(
                           ((least(greatest(stat, lo), hi) - lo)
                            / (hi - lo)) * 255) AS INT)
                       ELSE 0 END AS s
                FROM stats, pct
            )
            SELECT 'img' AS image_id, seg_id,
                   s AS red,
                   255 - abs(s * 2 - 255) AS green,
                   255 - s AS blue
            FROM scaled
        """,
        "a8_centre_dist": """
            WITH c AS (
                SELECT p_partkey AS cid,
                       (p_partkey * 17) % 100 AS b0,
                       (p_partkey * 29) % 100 AS b1,
                       (p_partkey * 43) % 100 AS b2
                FROM part WHERE p_partkey <= 8
            ), d AS (
                SELECT sqrt((a.b0 - b.b0) * (a.b0 - b.b0)
                          + (a.b1 - b.b1) * (a.b1 - b.b1)
                          + (a.b2 - b.b2) * (a.b2 - b.b2)) AS dist
                FROM c a, c b WHERE a.cid < b.cid
            )
            SELECT ROUND(quantile_cont(dist, 0.5), 4)
                       AS spect_diff_p50,
                   ROUND(MAX(dist) * 10, 4) AS spect_diff_fallback
            FROM d
        """,
        "cosine_near_dups": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding)
                  >= 0.4
        """,
        "ivf_topk": """
            SELECT q_id, c_id, CAST(rank AS INT) AS rank FROM (
                SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               q.embedding, c.embedding) DESC,
                               c.vec_id ASC) AS rank
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 8)
            WHERE rank <= 5
        """,
        "knn_points": """
            WITH p AS (
                SELECT c_custkey AS point_id,
                       (c_custkey * 131) % 1024 AS x,
                       (c_custkey * 211) % 1024 AS y
                FROM customer
            ), s AS (
                SELECT s_suppkey AS site_id,
                       (s_suppkey * 197) % 1024 AS x,
                       (s_suppkey * 313) % 1024 AS y
                FROM supplier
            )
            SELECT point_id, site_id,
                   CAST((p.x - s.x) * (p.x - s.x)
                        + (p.y - s.y) * (p.y - s.y) AS BIGINT) AS d2,
                   CAST(row_number() OVER (
                       PARTITION BY point_id
                       ORDER BY (p.x - s.x) * (p.x - s.x)
                                + (p.y - s.y) * (p.y - s.y),
                                site_id) AS INT) AS rank
            FROM p CROSS JOIN s
            QUALIFY rank <= 3
        """,
        "token_counts": """
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text),
                       '\\s+')) AS INT) AS n_ws_tokens
            FROM documents
        """,
        "ngram_jaccard": """
            WITH sh AS (
                SELECT doc_id, list_distinct([
                    array_to_string(words[i:i+2], ' ')
                    FOR i IN range(1, greatest(len(words) - 2, 1) + 1)
                ]) AS grams
                FROM (SELECT doc_id, regexp_split_to_array(
                          lower(text), '\\s+') AS words
                      FROM documents WHERE doc_id < 40)
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   ROUND(len(list_intersect(a.grams, b.grams)) * 1.0 /
                       len(list_distinct(list_concat(a.grams,
                           b.grams))), 4) AS jaccard
            FROM sh a, sh b
            WHERE a.doc_id < b.doc_id
              AND len(list_intersect(a.grams, b.grams)) * 1.0 /
                  len(list_distinct(list_concat(a.grams, b.grams)))
                  > 0.05
        """,
        "embedding_topk": """
            SELECT q_id, c_id, CAST(rank AS INT) AS rank FROM (
                SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               q.embedding, c.embedding) DESC,
                               c.vec_id ASC) AS rank
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 8)
            WHERE rank <= 5
        """,
        "events_windowed": """
            SELECT CAST(time_bucket(INTERVAL '1 hour', ts)
                       AS VARCHAR) AS win_start,
                   event_type, COUNT(*) AS n,
                   ROUND(SUM(value), 2) AS value_sum
            FROM events GROUP BY 1, 2
        """,
        "dedup_groups": """
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY norm)
                       AS group_rep,
                   COUNT(*) OVER (PARTITION BY norm) AS group_size
            FROM (SELECT doc_id,
                         lower(trim(regexp_replace(text, '\\s+', ' ',
                             'g'))) AS norm
                  FROM documents)
        """,
        "sessionization": """
            WITH marked AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w)
                               > 30 * 60
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
                SELECT user_id, ts, value,
                       SUM(is_new) OVER (PARTITION BY user_id
                           ORDER BY ts ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS session_seq
                FROM marked
            )
            SELECT user_id, CAST(session_seq AS BIGINT)
                       AS session_seq,
                   COUNT(*) AS n_events,
                   CAST(MIN(ts) AS VARCHAR) AS session_start,
                   CAST(MAX(ts) AS VARCHAR) AS session_end,
                   ROUND(SUM(value), 2) AS value_sum
            FROM sess GROUP BY user_id, session_seq
        """,
        "quality_full": """
            WITH w AS (
                SELECT doc_id, text,
                       length(text) AS n_chars,
                       len(regexp_split_to_array(text, '\\s+'))
                           AS n_words,
                       length(text) - length(regexp_replace(text,
                           '[^\\w\\s]', '', 'g')) AS n_punct,
                       regexp_split_to_array(lower(text), '\\s+') AS lw
                FROM documents
            ), r AS (
                SELECT doc_id, n_chars, n_words,
                       CASE WHEN n_chars > 0
                            THEN n_punct * 1.0 / n_chars
                            ELSE 0 END AS punct_ratio,
                       CASE WHEN n_words > 0
                            THEN (len(list_filter(lw, x -> x = 'the')) + len(list_filter(lw, x -> x = 'and')) + len(list_filter(lw, x -> x = 'of')) + len(list_filter(lw, x -> x = 'to')) + len(list_filter(lw, x -> x = 'is'))) * 1.0 / n_words
                            ELSE 0 END AS stopword_ratio,
                       CASE WHEN n_words > 0
                            THEN (n_chars - n_words + 1) * 1.0 / n_words
                            ELSE 0 END AS mean_word_len
                FROM w
            )
            SELECT doc_id, CAST(n_words AS INT) AS n_words,
                   ROUND(punct_ratio, 4) AS punct_ratio,
                   ROUND(stopword_ratio, 4) AS stopword_ratio,
                   ROUND(mean_word_len, 4) AS mean_word_len,
                   ROUND(((CASE WHEN n_chars >= 64
                                AND n_chars <= 100000
                                THEN 1.0 ELSE 0.3 END)
                        + (CASE WHEN mean_word_len >= 2.0
                                AND mean_word_len <= 12.0
                                THEN 1.0 ELSE 0.3 END)
                        + (CASE WHEN punct_ratio <= 0.2
                                THEN 1.0 ELSE 0.5 END)) / 3.0, 4)
                       AS quality
            FROM r
        """,
        "image_features": _image_features_oracle(),
        "embedding_near_dups_lsh": """
            -- exact all-pairs cosine ground truth: at threshold
            -- 0.999 only the planted scaled copies qualify (natural
            -- max pairwise cosine in this corpus is ~0.51), and a
            -- scaled copy shares its source's hyperplane sketch, so
            -- the banded-LSH query has recall 1 on every qualifying
            -- pair — the approximate path must equal the exact join
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            ), u AS (
                SELECT vec_id, v FROM e
                UNION ALL
                SELECT vec_id + 1000000,
                       list_transform(v, x -> x * 1.0001)
                FROM e WHERE vec_id < 20
            )
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(a.v, b.v), 4)
                       AS cosine
            FROM u a JOIN u b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.999
        """,
        "tpch_q4ish": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate >= TIMESTAMP '1997-01-01')
            GROUP BY o_orderpriority
        """,
    }
    # the tiled scale-path variants answer the same questions — the
    # oracles are shared verbatim
    d["u1_variogram_tiled"] = d["u1_variogram"]
    d["u3_edge_pixels_tiled"] = d["u3_edge_pixels"]
    return d


def _shingle_cte(k: int) -> str:
    """Shared CTE: word k-shingle 28-bit md5 hashes, replaying
    dedup.shingles_md5 exactly (same normalization, same slice
    clamping, same hex-prefix hash)."""
    return f"""
        norm AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\\s+', ' ',
                        'g')) AS t
            FROM documents
        ), wrd AS (
            SELECT doc_id, string_split(t, ' ') AS w FROM norm
        ), sh AS (
            SELECT doc_id, i - 1 AS pos,
                   CAST(('0x' || substr(md5(array_to_string(
                       list_slice(w, i, i + {k - 1}), ' ')), 1, 7))
                       AS BIGINT) AS h
            FROM wrd, LATERAL unnest(generate_series(
                1, greatest(len(w) - {k - 1}, 1))) AS g(i)
        )"""


def _fingerprint_oracle() -> str:
    return f"""
        WITH {_shingle_cte(3)}, mins AS (
            SELECT doc_id, pos // 8 AS win, MIN(h) AS mn
            FROM sh GROUP BY doc_id, pos // 8
        )
        SELECT doc_id, bit_xor(DISTINCT mn) AS fingerprint
        FROM mins GROUP BY doc_id
    """


def _minhash_oracle() -> str:
    from pyshepseg_spark.operators.dedup import minhash_coeffs
    coeffs = minhash_coeffs(32, 42)
    vals = ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)"
                     for i, (a, b) in enumerate(coeffs))
    return f"""
        WITH {_shingle_cte(3)}, hf(i, a, b) AS (VALUES {vals}),
        sig AS (
            SELECT sh.doc_id, hf.i,
                   MIN((sh.h * hf.a + hf.b) % 2147483647) AS v
            FROM sh CROSS JOIN hf GROUP BY sh.doc_id, hf.i
        ), bands AS (
            SELECT doc_id, i // 4 AS band,
                   string_agg(v::VARCHAR, ',' ORDER BY i) AS bkey
            FROM sig GROUP BY doc_id, i // 4
        ), cand AS (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM bands l JOIN bands r
              ON l.band = r.band AND l.bkey = r.bkey
             AND l.doc_id < r.doc_id
        ), est AS (
            SELECT c.a, c.b,
                   SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END)
                       / 32.0 AS est_jaccard
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.a
            JOIN sig sb ON sb.doc_id = c.b AND sb.i = sa.i
            GROUP BY c.a, c.b
        )
        SELECT a, b, est_jaccard FROM est WHERE est_jaccard >= 0.5
    """


def _simhash_oracle() -> str:
    return f"""
        WITH {_shingle_cte(3)}, bits AS (
            SELECT doc_id, bp,
                   SUM(CASE WHEN (h >> bp) & 1 = 1
                       THEN 1 ELSE -1 END) AS v
            FROM sh, LATERAL unnest(generate_series(0, 27)) AS t(bp)
            GROUP BY doc_id, bp
        ), words64 AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN v > 0
                       THEN (1::BIGINT << bp) ELSE 0 END)
                       AS BIGINT) AS sh64
            FROM bits GROUP BY doc_id
        ), blk AS (
            SELECT doc_id, sh64, j, (sh64 >> (7 * j)) & 127 AS bkey
            FROM words64, LATERAL unnest(generate_series(0, 3)) AS t(j)
        ), cand AS (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                   l.sh64 AS ha, r.sh64 AS hb
            FROM blk l JOIN blk r
              ON l.j = r.j AND l.bkey = r.bkey AND l.doc_id < r.doc_id
        )
        SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    """


def _lang_id_oracle() -> str:
    markers = {
        "en": ["the", "and", "of", "to", "is"],
        "es": ["el", "la", "de", "que", "los"],
        "fr": ["le", "la", "les", "des", "est"],
        "de": ["der", "die", "und", "das", "ist"],
        "zh": ["的", "是", "了", "在", "我"],
    }

    def score(lang):
        terms = " + ".join(
            f"len(list_filter(words, x -> x = '{m}'))"
            for m in markers[lang])
        return f"({terms})"

    langs = list(markers)
    struct_list = ", ".join(
        f"{{'score': {score(lg)}, 'lang': '{lg}'}}" for lg in langs)
    return f"""
        WITH w AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(text), '\\s+') AS words
            FROM documents
        ), scored AS (
            SELECT doc_id,
                   list_max([{struct_list}]) AS best
            FROM w
        )
        SELECT doc_id,
               CASE WHEN best.score > 0 THEN best.lang
                    ELSE 'unknown' END AS lang_pred,
               CAST(best.score AS INT) AS lang_score
        FROM scored
    """
