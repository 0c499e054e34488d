"""Zonal (per-segment) statistics — the tilingstats layer.

Spark-first rebuild of /root/reference/pyshepseg/tilingstats.py: the
reference's whole accumulate/complete/evict state machine
(tilingstats.py:466-617) collapses into a two-stage aggregation:

  1. per-tile kernels emit *partial value histograms*
     (image_id, seg_id, band, val, cnt) — the reference's
     seg -> {pixval -> count} dict (A3, tilingstats.py:466-515),
     computed vectorized. Partial agg inside the kernel = map-side
     combine; pixel rows are never materialized.
  2. groupBy(image_id, seg_id, band, val).sum(cnt) merges partials,
     then exact finalizers (A5, tilingstats.py:922-1008) derive
     min/max/mean/stddev/mode/median/percentile/pixcount from the
     histogram — *exact*, not percentile_approx, matching the
     reference bitwise for integer imagery.

Nodata pixels are excluded from the value histogram but counted apart
(A4, tilingstats.py:640-653); a segment with no valid pixels reports
missingStatsValue (tilingstats.py:943-950).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..constants import MISSING_STATS_VALUE

HIST_SCHEMA = ("image_id string, seg_id long, band int, val long, "
               "cnt long")


def stats_histogram_from_stitch(seg_tiles_off, mapping, overlap: int,
                                img_null_val: int | None = None):
    """Paint + histogram in ONE kernel pass, emitting only the
    partial (seg, band, value) histogram rows — the painted mosaic is
    never materialized. This mirrors the reference's stats lifecycle
    (calcPerSegmentStatsTiled reads rasters and writes only the RAT,
    tilingstats.py:85-212): when the consumer wants statistics, a
    second copy of the mosaic through Arrow is pure memory-bandwidth
    cost and is the non-scaling fraction at high core counts. Use
    paint_final_tiles when the raster itself is required.

    RESUME-path variant (input: a restored S6 checkpoint whose rows
    carry pixel/segtile binaries but no kernel histograms). The
    primary stats path, segment_stats_tiled, gets the histograms
    from the segmentation kernel itself (explode_and_segment
    emit_hist) and never re-reads binaries."""
    from .segment import _trim_bounds
    from .tiling import decode_tile_pixels

    margin = overlap // 2
    keys = ["image_id", "tcol", "trow"]
    # build_mapping keeps the tile key on every mapping row: group
    # straight by tile (no gid re-explode, no join back)
    tm = (mapping.groupBy(*keys)
          .agg(F.collect_list(F.struct("gid", "final")).alias("gf")))
    joined = seg_tiles_off.join(tm, keys, "left")

    def kernel(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                seg = np.frombuffer(row.segtile, dtype="<u4").reshape(
                    row.ysize, row.xsize).astype(np.int64)
                gid = np.where(seg > 0, seg + row.offset, 0)
                top, bottom, left, right = _trim_bounds(
                    row.tcol, row.trow, row.ntcols, row.ntrows,
                    row.xsize, row.ysize, margin)
                core = gid[top:bottom, left:right]
                lut = {}
                if row.gf is not None:
                    for item in row.gf:
                        lut[int(item["gid"])] = int(item["final"])
                u, inv = np.unique(core, return_inverse=True)
                mapped = np.fromiter(
                    (0 if g == 0 else lut.get(int(g), 0) for g in u),
                    dtype=np.int64, count=len(u))
                final = mapped[inv].reshape(core.shape).ravel()
                pix = decode_tile_pixels(row.pixels, row.nbands,
                                         row.ysize, row.xsize)
                pix_core = pix[:, top:bottom, left:right]
                valid = final > 0
                for b in range(row.nbands):
                    v = pix_core[b].ravel().astype(np.int64)
                    m = valid
                    if img_null_val is not None:
                        m = m & (v != img_null_val)
                    if not m.any():
                        continue
                    key = (final[m] << np.int64(17)) | v[m]
                    uk, cnt = np.unique(key, return_counts=True)
                    frames.append(pd.DataFrame({
                        "image_id": row.image_id,
                        "seg_id": uk >> 17, "band": b,
                        "val": uk & ((1 << 17) - 1), "cnt": cnt}))
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(columns=[
                       "image_id", "seg_id", "band", "val", "cnt"]))

    part = joined.mapInPandas(kernel, HIST_SCHEMA)
    return (part.groupBy("image_id", "seg_id", "band", "val")
            .agg(F.sum("cnt").alias("cnt")))


def segment_nodata_counts(hist_all, img_null_val: int):
    """A4 (tilingstats.py:640-653, accumulation :502-507): per-
    segment nodata pixels counted APART from the value stats. Input
    is a FULL value histogram (built with ``img_null_val=None`` so
    nodata values survive as ordinary bins); output has one row per
    (image_id, seg_id, band) with nodata_cnt (0 when none) and
    valid_cnt — all-nodata segments appear with valid_cnt 0, matching
    the reference's empty-histogram/missingStatsValue case
    (tilingstats.py:943-950). One JVM aggregation, no extra pass over
    pixels."""
    isnull = F.col("val") == F.lit(img_null_val)
    return hist_all.groupBy("image_id", "seg_id", "band").agg(
        F.sum(F.when(isnull, F.col("cnt")).otherwise(F.lit(0)))
        .alias("nodata_cnt"),
        F.sum(F.when(~isnull, F.col("cnt")).otherwise(F.lit(0)))
        .alias("valid_cnt"))


def segment_stats_tiled(images_df, cfg, percentiles=(50,),
                        with_nodata=False, centres=None):
    """images -> per-segment exact stats as ONE LINEAR JOB, never
    materializing the painted mosaic or re-reading pixels: the
    segmentation kernel emits each tile's trimmed-core histogram on
    local ids (explode_and_segment emit_hist, no pixel/segtile
    binaries in its output at all), the sequential stitch kernel
    remaps those bins to final ids as it computes each tile's lut
    (sequential_stitch_mapping output="hist"), and the exact
    finalizers run on the merged histogram. Pixels cross the Arrow
    boundary exactly once; the only shuffles are the per-image
    stitch repartition (strips + bins) and the histogram merge —
    no checkpoint, no mapping join, no offsets window.

    with_nodata=True keeps the FULL histogram (nodata bins kept),
    derives the stats from the filtered bins and joins the A4
    nodata/valid counts on — the merged histogram is
    locally checkpointed (it is segment-count-sized) so the kernel
    runs once for the two consumers, with nothing left cached.

    centres: None (default) fits per image inside the fused kernel —
    parallelism = image count, the many-images regime. A shared
    (k, nbands) numpy matrix switches to the giant-single-raster
    mode: unfused explode -> SPREAD tile rows -> per-tile kernels,
    so one mosaic's tiles run across the cluster instead of inside
    the single task that decoded the image (fit the matrix with
    segment.fit_global_centres — the reference's own prepare
    phase)."""
    from .segment import (explode_and_segment, explode_tiles,
                          segment_tiles, sequential_stitch_mapping)
    from .skew import spread_small_scan

    if centres is None:
        st = explode_and_segment(images_df, cfg, emit_hist=True,
                                 keep_binaries=False)
    else:
        tiles = spread_small_scan(
            explode_tiles(images_df, cfg.tile_size, cfg.overlap))
        st = segment_tiles(tiles, centres, cfg, emit_hist=True,
                           keep_binaries=False)
    part = sequential_stitch_mapping(st, cfg.overlap, output="hist")
    hist_all = (part.groupBy("image_id", "seg_id", "band", "val")
                .agg(F.sum("cnt").alias("cnt")))
    if not with_nodata or cfg.img_null_val is None:
        if cfg.img_null_val is not None:
            hist_all = hist_all.filter(
                F.col("val") != cfg.img_null_val)
        return segment_stats(hist_all, percentiles=percentiles)
    hist_all = hist_all.localCheckpoint()
    stats = segment_stats(
        hist_all.filter(F.col("val") != cfg.img_null_val),
        percentiles=percentiles)
    nodata = segment_nodata_counts(hist_all, cfg.img_null_val)
    return nodata.join(stats, ["image_id", "seg_id", "band"], "left")


def tile_value_histogram(final_tiles, img_null_val: int | None = None):
    """Stage 1: per-tile partial (seg, band, value) histograms from
    the stitched tiles (segdata int64 + trimmed pixels). mapInPandas;
    the only shuffle is the later merge groupBy.

    If the tiles already carry a fused ``hist`` column (paint ran
    with with_histogram=True), this is a pure-SQL explode + merge —
    the fat rows are never re-read."""
    if "hist" in final_tiles.columns:
        part = (final_tiles
                .select("image_id", F.explode("hist").alias("h"))
                .select("image_id", "h.seg_id", "h.band", "h.val",
                        "h.cnt"))
        if img_null_val is not None:
            # Equivalent to the in-kernel mask: the histogram keeps
            # full value granularity, so post-hoc filtering is exact
            # (and idempotent if paint already filtered).
            part = part.filter(F.col("val") != img_null_val)
        return (part.groupBy("image_id", "seg_id", "band", "val")
                .agg(F.sum("cnt").alias("cnt")))

    def kernel(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                seg = np.frombuffer(row.segdata, dtype="<i8").reshape(
                    row.out_ysize, row.out_xsize)
                pix = np.frombuffer(row.pixels, dtype="<u2").reshape(
                    row.nbands, row.out_ysize, row.out_xsize)
                segf = seg.ravel()
                valid = segf > 0
                for b in range(row.nbands):
                    v = pix[b].ravel().astype(np.int64)
                    m = valid
                    if img_null_val is not None:
                        m = m & (v != img_null_val)
                    if not m.any():
                        continue
                    key = segf[m] << np.int64(17)  # 17 bits > uint16
                    key = key | v[m]
                    uk, cnt = np.unique(key, return_counts=True)
                    frames.append(pd.DataFrame({
                        "image_id": row.image_id,
                        "seg_id": uk >> 17,
                        "band": b,
                        "val": uk & ((1 << 17) - 1),
                        "cnt": cnt}))
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(columns=[
                       "image_id", "seg_id", "band", "val", "cnt"]))

    cols = ["image_id", "out_xsize", "out_ysize", "nbands", "pixels",
            "segdata"]
    part = final_tiles.select(*cols).mapInPandas(kernel, HIST_SCHEMA)
    return (part.groupBy("image_id", "seg_id", "band", "val")
            .agg(F.sum("cnt").alias("cnt")))


def check_image_alignment(seg_images, images_df,
                          max_report: int = 20,
                          strict: bool = False):
    """Analogue of the reference's doImageAlignmentChecks
    (tilingstats.py:409-463): cross-raster zonal stats — values from
    one table, segmentation from another — are only meaningful when
    both share the pixel grid. Joins the two tables' METADATA (no
    pixel data moves) and raises a clear error listing image_ids
    whose grids mismatch or whose segmentation row has no values-side
    match; without the check a mismatched values raster dies deep in
    the decode kernel with a shape error (or, for raw bytes of
    coincidentally equal length, silently histograms misaligned
    pixels — the reference calls this 'silently getting everything
    wrong' and refuses).

    Values-side-ONLY rows (a values catalog that is a superset of the
    segmentation table) are benign — the downstream inner join simply
    skips them, and the reference's two-raster check has no precedent
    for erroring there — so they warn by default; strict=True
    promotes them to errors (driver ADVICE r4)."""
    import warnings
    a = seg_images.select("image_id",
                          F.col("w").alias("seg_w"),
                          F.col("h").alias("seg_h"))
    b = images_df.select("image_id",
                         F.col("w").alias("img_w"),
                         F.col("h").alias("img_h"))
    joined = a.join(b, "image_id", "full_outer")
    bad = (joined
           .filter(F.col("seg_w").isNotNull()
                   & (F.col("img_w").isNull()
                      | (F.col("seg_w") != F.col("img_w"))
                      | (F.col("seg_h") != F.col("img_h"))))
           .limit(max_report).collect())
    if bad:
        detail = "; ".join(
            f"{r['image_id']}: seg {r['seg_w']}x{r['seg_h']} vs "
            f"img {r['img_w']}x{r['img_h']}" for r in bad)
        raise ValueError(
            "segmentation/image tables are not aligned "
            f"(first {len(bad)} offenders): {detail}")
    extra = (joined.filter(F.col("seg_w").isNull())
             .limit(max_report).collect())
    if extra:
        detail = ", ".join(str(r["image_id"]) for r in extra)
        msg = (f"values table has {len(extra)}+ image_ids with no "
               f"segmentation row (skipped by the stats join): "
               f"{detail}")
        if strict:
            raise ValueError(msg)
        warnings.warn(msg)


def seg_image_value_histogram(seg_images, images_df,
                              img_null_val: int | None = None,
                              validate: bool = True):
    """Stage-1 variant for the whole-image path: join seg rasters
    back to image bytes and histogram in one kernel. Accepts a
    DIFFERENT values table than the one segmented (the reference's
    calcPerSegmentStatsTiled(imgfile, segfile) cross-raster form) —
    validate=True runs check_image_alignment first."""
    if validate:
        check_image_alignment(seg_images, images_df)
    j = seg_images.select("image_id", "w", "h", "nbands", "segdata") \
        .join(images_df.select("image_id", "bytes", "fmt"), "image_id")

    def kernel(batches):
        from ..sources.codec import decode_image
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                seg = np.frombuffer(row.segdata, dtype="<i8")
                pix = decode_image(row.bytes, row.fmt, row.w, row.h)
                valid = seg > 0
                for b in range(row.nbands):
                    v = pix[b].ravel().astype(np.int64)
                    m = valid
                    if img_null_val is not None:
                        m = m & (v != img_null_val)
                    if not m.any():
                        continue
                    key = (seg[m] << np.int64(17)) | v[m]
                    uk, cnt = np.unique(key, return_counts=True)
                    frames.append(pd.DataFrame({
                        "image_id": row.image_id,
                        "seg_id": uk >> 17,
                        "band": b,
                        "val": uk & ((1 << 17) - 1),
                        "cnt": cnt}))
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(columns=[
                       "image_id", "seg_id", "band", "val", "cnt"]))

    part = j.mapInPandas(kernel, HIST_SCHEMA)
    return (part.groupBy("image_id", "seg_id", "band", "val")
            .agg(F.sum("cnt").alias("cnt")))


def segment_and_histogram(images_df, cfg):
    """Fused flagship kernel: decode -> segment -> per-segment value
    histogram in ONE mapInPandas pass (no second decode, no shuffle
    join of raster binaries — at 10^12-image scale the only shuffle
    is the tiny histogram-row merge). Emits HIST_SCHEMA rows."""
    import time as _time

    from ..kernels.shepherd import do_shepherd_segmentation

    cfg_b = cfg
    has_k = "num_clusters" in images_df.columns
    cols = ["image_id", "bytes", "w", "h", "fmt"] + (
        ["num_clusters"] if has_k else [])

    def kernel(batches):
        from ..sources.codec import decode_image
        from .tiling import fit_image_centres
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                t0 = _time.time()
                try:
                    img = decode_image(row.bytes, row.fmt,
                                       row.w, row.h)
                except Exception:
                    if getattr(cfg_b, "on_decode_error",
                               "fail") == "skip":
                        continue
                    raise
                k = int(getattr(row, "num_clusters",
                                cfg_b.num_clusters)
                        or cfg_b.num_clusters)
                # same floored-sample centre fit as the tiled path,
                # so single-tile images give identical results on
                # both consumption paths
                res = do_shepherd_segmentation(
                    img,
                    centres=fit_image_centres(img, k, cfg_b),
                    min_segment_size=cfg_b.min_segment_size,
                    max_spectral_diff=cfg_b.max_spectral_diff,
                    img_null_val=cfg_b.img_null_val,
                    four_connected=cfg_b.four_connected,
                    spect_dist_pcntile=cfg_b.spect_dist_pcntile,
                    max_clump_size=cfg_b.max_clump_size)
                seg = res.segimg.ravel().astype(np.int64)
                valid = seg > 0
                for b in range(img.shape[0]):
                    v = img[b].ravel().astype(np.int64)
                    m = valid
                    if cfg_b.img_null_val is not None:
                        m = m & (v != cfg_b.img_null_val)
                    if not m.any():
                        continue
                    key = (seg[m] << np.int64(17)) | v[m]
                    uk, cnt = np.unique(key, return_counts=True)
                    frames.append(pd.DataFrame({
                        "image_id": row.image_id,
                        "seg_id": uk >> 17,
                        "band": b,
                        "val": uk & ((1 << 17) - 1),
                        "cnt": cnt}))
                _ = t0
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(columns=[
                       "image_id", "seg_id", "band", "val", "cnt"]))

    part = images_df.select(*cols).mapInPandas(kernel, HIST_SCHEMA)
    return (part.groupBy("image_id", "seg_id", "band", "val")
            .agg(F.sum("cnt").alias("cnt")))


def segment_stats(hist, percentiles=(50,)):
    """Stage 2: exact stat finalizers over the value histogram.

    Matches SegmentStats (tilingstats.py:922-1008):
      min/max       — extreme values present
      mean          — sum(v*c)/n
      stddev        — population: sqrt(sum(c*(v-mean)^2)/n)
      mode          — value with max count, ties -> smallest value
                      (argmax over value-sorted arrays)
      percentile p  — first value (ascending) whose cumulative count
                      >= n*p/100 (exact; the reference's
                      cumulative-count walk, tilingstats.py:969-986)
      pixcount      — n
    All derived with built-in JVM aggregations (max_by, windows) —
    no UDFs in this stage.
    """
    g = ["image_id", "seg_id", "band"]
    # ONE window pass (cumulative + total counts share the sort) and
    # ONE aggregation: the histogram — and therefore everything
    # upstream of it — is scanned exactly once. Percentiles are
    # conditional mins over the cumulative counts; mode is
    # max_by(val, (cnt, -val)); variance is single-pass in doubles
    # (values <= 2^17 keep E[x^2]-E[x]^2 well above the double noise
    # floor).
    w_cum = (Window.partitionBy(*g).orderBy("val")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = (Window.partitionBy(*g)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    h = (hist.withColumn("cum", F.sum("cnt").over(w_cum))
         .withColumn("n", F.sum("cnt").over(w_all)))
    vc = F.col("val").cast("double") * F.col("cnt")
    v2c = (F.col("val").cast("double") * F.col("val").cast("double")
           * F.col("cnt"))
    mean = F.sum(vc) / F.sum("cnt")
    aggs = [
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum("cnt").alias("pix_count"),
        mean.alias("mean_val"),
        F.sqrt(F.greatest(F.sum(v2c) / F.sum("cnt") - mean * mean,
                          F.lit(0.0))).alias("stddev_val"),
        F.max_by("val", F.struct(F.col("cnt"),
                                 (-F.col("val")).alias("nv")))
        .alias("mode_val"),
    ]
    for p in percentiles:
        aggs.append(F.min(F.when(
            F.col("cum") >= F.col("n") * F.lit(p) / F.lit(100),
            F.col("val"))).alias(f"p{p:02d}_val"))
    out = h.groupBy(*g).agg(*aggs)
    if 50 in percentiles:
        out = out.withColumn("median_val", F.col("p50_val"))
    return out


_SELECTABLE_STATS = ("min", "max", "mean", "stddev", "median",
                     "mode", "percentile", "pixcount")


def segment_stats_selected(hist, selection):
    """Named stats-selection surface — the contract a caller ported
    from the reference uses (tilingstats.py:798-863
    makeFastStatsSelection; selection format :106-131): each entry is
    ``(columnName, statName)`` or ``(columnName, 'percentile', p)``,
    statName one of min/max/mean/stddev/median/mode/percentile/
    pixcount. Output columns take the caller's names and the
    reference's dtypes (mean/stddev float columns -> double,
    everything else int -> long). Same one-window + one-aggregation
    plan as segment_stats; the cumulative window is only added when
    the selection needs an order statistic."""
    g = ["image_id", "seg_id", "band"]
    for sel in selection:
        if len(sel) not in (2, 3) or sel[1] not in _SELECTABLE_STATS:
            raise ValueError(f"bad statsSelection entry {sel!r}: "
                             f"statName must be one of "
                             f"{_SELECTABLE_STATS}")
        if sel[1] == "percentile" and (
                len(sel) != 3 or not 0 <= sel[2] <= 100):
            raise ValueError(f"percentile needs (name, 'percentile', "
                             f"0..100), got {sel!r}")
        if sel[1] != "percentile" and len(sel) == 3:
            # the reference selection format treats a param on a
            # non-percentile stat as malformed — don't silently
            # ignore it
            raise ValueError(f"statsSelection entry {sel!r}: only "
                             f"'percentile' takes a third element")

    need_cum = any(s[1] in ("median", "percentile") for s in selection)
    h = hist
    if need_cum:
        w_cum = (Window.partitionBy(*g).orderBy("val")
                 .rowsBetween(Window.unboundedPreceding, 0))
        w_all = (Window.partitionBy(*g)
                 .rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing))
        h = (h.withColumn("cum", F.sum("cnt").over(w_cum))
             .withColumn("n", F.sum("cnt").over(w_all)))

    vc = F.col("val").cast("double") * F.col("cnt")
    v2c = (F.col("val").cast("double") * F.col("val").cast("double")
           * F.col("cnt"))
    mean = F.sum(vc) / F.sum("cnt")

    def pctl(p):
        return F.min(F.when(
            F.col("cum") >= F.col("n") * F.lit(p) / F.lit(100),
            F.col("val")))

    builders = {
        "min": lambda: F.min("val").cast("long"),
        "max": lambda: F.max("val").cast("long"),
        "mean": lambda: mean,
        "stddev": lambda: F.sqrt(F.greatest(
            F.sum(v2c) / F.sum("cnt") - mean * mean, F.lit(0.0))),
        "median": lambda: pctl(50).cast("long"),
        "mode": lambda: F.max_by(
            "val", F.struct(F.col("cnt"),
                            (-F.col("val")).alias("nv"))).cast("long"),
        "pixcount": lambda: F.sum("cnt").cast("long"),
    }
    aggs = []
    for sel in selection:
        name, stat = sel[0], sel[1]
        if stat == "percentile":
            aggs.append(pctl(sel[2]).cast("long").alias(name))
        else:
            aggs.append(builders[stat]().alias(name))
    return h.groupBy(*g).agg(*aggs)


def global_stats_from_histogram(seg_sizes):
    """A7 (utils.py:47-95): whole-raster stats of the segment-ID
    image derived from the segment-size histogram: one agg plus a
    cumulative window for the reference's histogram median (first
    bin whose cumulative count reaches half the pixels,
    utils.py:68-71)."""
    from pyspark.sql import Window
    wcum = (Window.partitionBy("image_id").orderBy("seg_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    wtot = Window.partitionBy("image_id")
    cum = (seg_sizes
           .withColumn("cum", F.sum("cnt").over(wcum))
           .withColumn("half", F.sum("cnt").over(wtot) / 2))
    med = (cum.filter(F.col("cum") >= F.col("half"))
           .groupBy("image_id")
           .agg(F.min("seg_id").alias("median_seg")))
    agg = (seg_sizes.groupBy("image_id").agg(
        F.min("seg_id").alias("min_seg"),
        F.max("seg_id").alias("max_seg"),
        (F.sum(F.col("seg_id") * F.col("cnt"))
         / F.sum("cnt")).alias("mean_seg"),
        F.max_by("seg_id", F.struct(F.col("cnt"),
                                    (-F.col("seg_id")).alias("nv")))
        .alias("mode_seg"),
        F.sum("cnt").alias("pix_count")))
    return agg.join(med, "image_id")


def segment_sizes(final_tiles):
    """A1: segment-size histogram = groupBy count over per-tile
    partial bincounts (the reference's HistogramAccumulator
    partial+final merge, tiling.py:1915-1963)."""

    def kernel(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                seg = np.frombuffer(row.segdata, dtype="<i8")
                seg = seg[seg > 0]
                if seg.size == 0:
                    continue
                u, c = np.unique(seg, return_counts=True)
                frames.append(pd.DataFrame({
                    "image_id": row.image_id, "seg_id": u, "cnt": c}))
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(columns=["image_id", "seg_id",
                                              "cnt"]))

    part = final_tiles.select("image_id", "segdata").mapInPandas(
        kernel, "image_id string, seg_id long, cnt long")
    return part.groupBy("image_id", "seg_id").agg(
        F.sum("cnt").alias("cnt"))


def check_empty_segments(seg_sizes, seg_images=None, max_seg=None):
    """S10 (tiling.py:1308-1341): every ID in 1..max must have pixels;
    an empty segment indicates a stitch inconsistency. Returns a
    DataFrame of missing IDs (empty => consistent)."""
    mx = seg_sizes.groupBy("image_id").agg(
        F.max("seg_id").alias("max_seg"))
    expected = mx.select(
        "image_id",
        F.explode(F.sequence(F.lit(1), F.col("max_seg"))).alias("seg_id"))
    return expected.join(seg_sizes, ["image_id", "seg_id"],
                         "left_anti")


def fill_missing_stats(stats_df, all_segments):
    """Segments with zero valid pixels report MISSING_STATS_VALUE
    (tilingstats.py:943-950): left-join the full segment list and
    fill."""
    joined = all_segments.join(stats_df, ["image_id", "seg_id"],
                               "left")
    fills = {c: MISSING_STATS_VALUE for c in joined.columns
             if c.endswith("_val")}
    fills["pix_count"] = 0
    return joined.fillna(fills)
