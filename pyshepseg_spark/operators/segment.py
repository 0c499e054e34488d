"""Distributed Shepherd segmentation: per-tile kernels + boundary-
strip stitch.

Spark-first re-expression of the reference's tiled pipeline
(/root/reference/pyshepseg/tiling.py:446-1064):

  prepare   per-image (or global-sample) k-means centres — the
            cross-tile consistency device (tiling.py:13-16); fused
            into the tile kernel by default
  doOne     per-tile segmentation, mapInPandas — one row per tile, no
            shuffle, embarrassingly parallel (tiling.py worker loop)
  stitch    DEFAULT mode="sequential": EXACT replay of the
            reference's order-dependent recode recurrence
            (stitchTiles/recodeTile/relabelSegments,
            tiling.py:950-1306) over boundary strips only —
            sequential_stitch_mapping streams each image's tiles
            row-major with a one-tile-row rolling cache, parallel
            across images, bitwise-equal mosaics on every input.
            mode="cc": the order-independent alternative (strip
            equi-join -> mode edges -> connected-components ->
            dense relabel) for intra-image parallelism on single
            giant mosaics.

Segment IDs: per-image int64 ("gid" = per-tile prefix-sum offset +
local id). uint32 would overflow at 10^12-image scale (SURVEY.md §7
hard part 4); global uniqueness is the composite (image_id, seg_id).

Documented deviation in mode="cc" ONLY: the reference recodes a
crossing segment to the mode of the neighbour's *already recoded*
strip, lets left-overlap recodes overwrite top-overlap ones, and can
recode a segment to null — order-dependent effects the transitive
closure over raw-label modes resolves differently on chained
boundary segments (observed on the flagship fixture; the sequential
default reproduces them all exactly).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import MAX_CLUMP_SIZE
from ..kernels.kmeans import fit_spectral_clusters_sample
from ..kernels.shepherd import do_shepherd_segmentation
from .tiling import (collect_sample, decode_tile_pixels, explode_tiles,
                     stride_sample_pixels)


@dataclass
class SegConfig:
    num_clusters: int = 60
    min_segment_size: int = 50
    max_spectral_diff: object = "auto"
    img_null_val: int | None = None
    four_connected: bool = True
    # True (engine default): deterministic diagonal-init Lloyd — the
    # reference test suite's fixedKMeansInit path, required for every
    # bitwise parity target. False: the reference's DEFAULT sklearn
    # behaviour (k-means++ seeding x kmeans_n_init runs, best
    # inertia kept), seeded for reproducibility here.
    fixed_kmeans_init: bool = True
    kmeans_n_init: int = 5
    # "fail" (default): a corrupt/undecodable image row raises, like
    # the reference. "skip": the kernel drops the row (it yields no
    # tiles / stats / raster) — at 10^12-image scale garbage rows
    # exist and must not kill the stage.
    on_decode_error: str = "fail"
    spect_dist_pcntile: int = 50
    max_clump_size: int = MAX_CLUMP_SIZE
    tile_size: int = 256
    overlap: int = 64
    sample_target_pixels: int = 1_000_000


SEG_TILE_SCHEMA = (
    "image_id string, tcol int, trow int, ntcols int, ntrows int, "
    "xpos int, ypos int, xsize int, ysize int, nbands int, "
    "pixels binary, segtile binary, nseg int, anchored array<long>, "
    "present array<long>, "
    "strip_top binary, strip_left binary, strip_bottom binary, "
    "strip_right binary, "
    "n_single_elim int, n_small_elim int, seg_secs double"
)


def fit_global_centres(images_df, cfg: SegConfig,
                       validate: bool = True) -> np.ndarray:
    """Prepare phase for the one-giant-raster scenario: deterministic
    global stride sample -> driver Lloyd fit (reference
    tiling.py:196-224). For a table of independent images use
    :func:`fit_centres_per_image` instead.

    validate=True runs the same S4 nodata discovery as
    segment_images_tiled's validate block BEFORE sampling: the
    reference's fitSpectralClustersWholeFile samples only non-null
    pixels, so fitting with an undiscovered null value would pin
    clusters to the nodata constant and silently degrade every
    downstream segmentation (driver ADVICE r4)."""
    if validate and cfg.img_null_val is None:
        import dataclasses

        from .tiling import discover_img_null_val
        nv = discover_img_null_val(images_df)
        if nv is not None:
            cfg = dataclasses.replace(cfg, img_null_val=int(nv))
    sample_df = stride_sample_pixels(
        images_df, cfg.sample_target_pixels, cfg.img_null_val)
    x = collect_sample(sample_df)
    return fit_spectral_clusters_sample(
        x, cfg.num_clusters, cfg.fixed_kmeans_init)


CENTRES_SCHEMA = "image_id string, k int, nbands int, centres binary"


def fit_centres_per_image(images_df, cfg: SegConfig):
    """Per-image k-means fit (each table row is an independent raster,
    so each gets its own deterministic clustering — the reference's
    one-kmeans-per-raster rule applied row-wise). Runs as mapInPandas,
    embarrassingly parallel, no driver bottleneck. If images_df has a
    ``num_clusters`` column it overrides cfg.num_clusters per row.

    Returns a small DataFrame (image_id, k, nbands, centres) meant to
    be broadcast-joined onto the tiles table."""
    from ..sources.codec import decode_image

    cfg_b = cfg
    has_k = "num_clusters" in images_df.columns
    cols = ["image_id", "bytes", "w", "h", "fmt"] + (
        ["num_clusters"] if has_k else [])

    def kernel(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                img = decode_image(row.bytes, row.fmt, row.w, row.h)
                nbands = img.shape[0]
                x = img.transpose(1, 2, 0).reshape(-1, nbands)
                if cfg_b.img_null_val is not None:
                    x = x[(x != cfg_b.img_null_val).all(axis=1)]
                npix = x.shape[0]
                k = int(getattr(row, "num_clusters",
                                cfg_b.num_clusters) or
                        cfg_b.num_clusters)
                # reference in-memory default: 1% stride sample
                # (shepseg.py clusterSubsamplePcnt=1), floored so tiny
                # images still give Lloyd enough points per cluster
                target = min(npix, max(npix // 100, k * 200, 2000))
                skip = max(1, npix // target)
                x = x[::skip].astype(np.float64)
                centres = fit_spectral_clusters_sample(
                    x, k, cfg_b.fixed_kmeans_init)
                out.append({"image_id": row.image_id, "k": k,
                            "nbands": nbands,
                            "centres": centres.astype(
                                "<f8").tobytes()})
            yield pd.DataFrame(out, columns=["image_id", "k",
                                             "nbands", "centres"])

    return images_df.select(*cols).mapInPandas(kernel, CENTRES_SCHEMA)


def _trim_bounds(tc, tr, ntc, ntr, xs, ys, margin):
    """Per-tile trimmed-core bounds (reference tiling.py:996-1022)."""
    top = 0 if tr == 0 else margin
    left = 0 if tc == 0 else margin
    bottom = ys if tr == ntr - 1 else ys - margin
    right = xs if tc == ntc - 1 else xs - margin
    return top, bottom, left, right



SEG_COLUMNS = [
    "image_id", "tcol", "trow", "ntcols", "ntrows",
    "xpos", "ypos", "xsize", "ysize", "nbands", "pixels",
    "segtile", "nseg", "anchored", "present", "strip_top",
    "strip_left", "strip_bottom", "strip_right",
    "n_single_elim", "n_small_elim", "seg_secs"]


def _segment_tile_record(image_id, tcol, trow, ntcols, ntrows,
                         xpos, ypos, xsize, ysize, img, pixels_bytes,
                         centres, cfg, emit_hist=False,
                         keep_binaries=True):
    """Run the Shepherd kernel on one decoded tile and build the
    seg_tiles row (shared by the chained and the fused kernels).

    emit_hist=True additionally attaches the tile's trimmed-core
    (local_seg, band, value) histogram — computed here, while the
    decoded tile is already in cache — so a stats-only consumer
    never needs the pixel/segtile binaries again (keep_binaries=False
    then drops them from the row entirely: the checkpoint shrinks
    from O(pixels) to O(histogram bins + strips))."""
    overlap = cfg.overlap
    margin = overlap // 2
    t0 = time.time()
    res = do_shepherd_segmentation(
        img,
        min_segment_size=cfg.min_segment_size,
        max_spectral_diff=cfg.max_spectral_diff,
        img_null_val=cfg.img_null_val,
        four_connected=cfg.four_connected,
        centres=centres,
        spect_dist_pcntile=cfg.spect_dist_pcntile,
        max_clump_size=cfg.max_clump_size)
    seg = res.segimg
    nseg = int(seg.max())
    top, bottom, left, right = _trim_bounds(
        tcol, trow, ntcols, ntrows, xsize, ysize, margin)
    anchored = []
    present = []
    if nseg > 0:
        rr, cc2 = np.nonzero(seg)
        ids = seg[rr, cc2].astype(np.int64)
        minr = np.full(nseg + 1, 1 << 30, dtype=np.int64)
        minc = np.full(nseg + 1, 1 << 30, dtype=np.int64)
        np.minimum.at(minr, ids, rr)
        np.minimum.at(minc, ids, cc2)
        sel = np.arange(1, nseg + 1)
        ok = ((minc[sel] >= left) & (minr[sel] >= top)
              & (minc[sel] < right) & (minr[sel] < bottom))
        anchored = sel[ok].tolist()
        # raw ids with >=1 pixel in the trimmed core: the sequential
        # stitch needs them to reproduce the reference's
        # maxSegId = max(maxSegId, tileDataTrimmed.max()) update
        # (tiling.py:1042-1043) — an anchored id CAN lie entirely in
        # the margins (L-shape across bbox mins), in which case the
        # reference does NOT advance maxSegId past it
        pr = np.unique(seg[top:bottom, left:right])
        present = pr[pr > 0].astype(np.int64).tolist()

    def strip(cond, arr):
        return (np.ascontiguousarray(arr).astype("<u4").tobytes()
                if cond else None)

    rec = {
        "image_id": image_id,
        "tcol": tcol, "trow": trow,
        "ntcols": ntcols, "ntrows": ntrows,
        "xpos": xpos, "ypos": ypos,
        "xsize": xsize, "ysize": ysize,
        "nbands": img.shape[0],
        "nseg": nseg,
        "anchored": anchored,
        "present": present,
        "strip_top": strip(trow > 0, seg[:overlap, :]),
        "strip_left": strip(tcol > 0, seg[:, :overlap]),
        "strip_bottom": strip(trow < ntrows - 1, seg[-overlap:, :]),
        "strip_right": strip(tcol < ntcols - 1, seg[:, -overlap:]),
        "n_single_elim": int(res.single_pixels_eliminated),
        "n_small_elim": int(res.small_segments_eliminated),
        "seg_secs": time.time() - t0,
    }
    if keep_binaries:
        rec["pixels"] = pixels_bytes
        rec["segtile"] = seg.astype("<u4").tobytes()
    if emit_hist:
        # trimmed-core FULL value histogram on LOCAL ids (nodata
        # bins kept, so the A4 counter derives from the same rows);
        # val < 2^17 for u16 imagery, same packing as zonal
        core = seg[top:bottom, left:right].ravel().astype(np.int64)
        m0 = core > 0
        hist = []
        for b in range(img.shape[0]):
            v = img[b, top:bottom, left:right].ravel().astype(
                np.int64)
            if not m0.any():
                continue
            key = (core[m0] << np.int64(17)) | v[m0]
            uk, cnt = np.unique(key, return_counts=True)
            hist.extend(
                {"local": int(k >> 17), "band": b,
                 "val": int(k & ((1 << 17) - 1)), "cnt": int(c)}
                for k, c in zip(uk, cnt))
        rec["hist"] = hist
    return rec


HIST_STRUCT = (", hist array<struct<local:long, band:int, val:long, "
               "cnt:long>>")


def _seg_tile_schema(emit_hist: bool, keep_binaries: bool):
    s = SEG_TILE_SCHEMA
    cols = list(SEG_COLUMNS)
    if not keep_binaries:
        s = s.replace("pixels binary, segtile binary, ", "")
        cols = [c for c in cols if c not in ("pixels", "segtile")]
    if emit_hist:
        s += HIST_STRUCT
        cols.append("hist")
    return s, cols


def explode_and_segment(images_df, cfg: SegConfig,
                        emit_hist: bool = False,
                        keep_binaries: bool = True):
    """images -> seg_tiles in ONE mapInPandas kernel: decode each
    image once, fit its deterministic centres, cut overlapping tiles
    and run the Shepherd kernel per tile — the raw tile bytes never
    round-trip through Arrow between an explode stage and a segment
    stage (the chained explode_tiles -> segment_tiles path moves
    every tile JVM->Python->JVM->Python; at high core counts that
    memory traffic is the non-scaling fraction).

    emit_hist/keep_binaries: stats-only consumers set (True, False)
    so the kernel output carries per-tile core histograms instead of
    pixel/segtile binaries — the checkpoint and every downstream
    exchange then scale with histogram bins + strip bytes, not
    pixels."""
    from ..sources.codec import decode_image, encode_raw_u16
    from .tiling import fit_image_centres, tile_grid

    has_k = "num_clusters" in images_df.columns
    schema, out_cols = _seg_tile_schema(emit_hist, keep_binaries)

    def kernel(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    img = decode_image(row.bytes, row.fmt,
                                       row.w, row.h)
                except Exception:
                    if cfg.on_decode_error == "skip":
                        continue
                    raise
                k = int(getattr(row, "num_clusters",
                                cfg.num_clusters)
                        or cfg.num_clusters) if has_k \
                    else cfg.num_clusters
                centres = fit_image_centres(img, k, cfg)
                tiles, ntcols, ntrows = tile_grid(
                    row.w, row.h, cfg.tile_size, cfg.overlap)
                for (tc, tr, xp, yp, xs, ys) in tiles:
                    sub = np.ascontiguousarray(
                        img[:, yp:yp + ys, xp:xp + xs])
                    out.append(_segment_tile_record(
                        row.image_id, tc, tr, ntcols, ntrows,
                        xp, yp, xs, ys, sub,
                        encode_raw_u16(sub) if keep_binaries
                        else None,
                        centres, cfg, emit_hist=emit_hist,
                        keep_binaries=keep_binaries))
            yield pd.DataFrame(out, columns=out_cols)

    cols = ["image_id", "bytes", "w", "h", "fmt"]
    if has_k:
        cols.append("num_clusters")
    return images_df.select(*cols).mapInPandas(kernel, schema)


def segment_tiles(tiles_df, centres, cfg: SegConfig,
                  emit_hist: bool = False,
                  keep_binaries: bool = True):
    """doOne phase: run the Shepherd kernel on every tile
    (mapInPandas; no shuffle). Emits local uint32 seg ids, the list
    of 'anchored' local ids (segments whose bbox min lies in the
    trimmed core — the reference's fresh-ID rule,
    tiling.py:1250-1267), the four boundary strips (so the stitch
    never re-reads the fat tile rows), and per-tile metrics for the
    lineage table.

    ``centres``: None if tiles_df already carries a per-image
    ``centres`` column (the fused explode_tiles path — preferred), a
    numpy (k, nbands) matrix (giant-single-raster mode), or the
    per-image centres DataFrame from :func:`fit_centres_per_image`.

    emit_hist/keep_binaries mirror explode_and_segment: stats-only
    consumers set (True, False) so the kernel output carries per-tile
    core histograms instead of pixel/segtile binaries — the
    giant-single-raster stats path (segment_stats_tiled with shared
    centres) needs them here because it runs the UNFUSED kernel to
    spread one mosaic's tiles across the cluster."""
    margin = cfg.overlap // 2
    overlap = cfg.overlap
    cfg_b = cfg
    if centres is None:
        if "centres" not in tiles_df.columns:
            raise ValueError("tiles_df lacks 'centres'; pass "
                             "fit_cfg to explode_tiles or supply "
                             "centres")
    elif isinstance(centres, np.ndarray):
        tiles_df = tiles_df.withColumn(
            "centres", F.lit(bytearray(centres.astype(
                "<f8").tobytes())))
    else:
        # per-image centres: one row per image (unbounded at scale)
        # — AQE broadcasts when small
        tiles_df = tiles_df.join(
            centres.select("image_id", "centres"), "image_id")

    schema, out_cols = _seg_tile_schema(emit_hist, keep_binaries)

    def kernel(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                c = np.frombuffer(row.centres, dtype="<f8").reshape(
                    -1, row.nbands)
                img = decode_tile_pixels(row.pixels, row.nbands,
                                         row.ysize, row.xsize)
                out.append(_segment_tile_record(
                    row.image_id, row.tcol, row.trow, row.ntcols,
                    row.ntrows, row.xpos, row.ypos, row.xsize,
                    row.ysize, img, row.pixels, c, cfg_b,
                    emit_hist=emit_hist,
                    keep_binaries=keep_binaries))
            yield pd.DataFrame(out, columns=out_cols)

    return tiles_df.mapInPandas(kernel, schema)


def tile_offsets(seg_tiles):
    """Per-image prefix sum of local segment counts in row-major tile
    order, computed over the NARROW (image_id, tcol, trow, nseg)
    projection only (W2: ordered window prefix sum replaces the
    reference's running maxSegId, tiling.py:979-1043). Keeping the
    window off the pixel/segtile binaries matters at scale: a
    per-image window over the fat kernel rows forces every tile of
    an image — pixels included — through ONE task's sort, an
    O(image pixels) single-task stage for a giant mosaic. Over
    ~20-byte rows the same window is O(tiles)."""
    w = (Window.partitionBy("image_id").orderBy("trow", "tcol")
         .rowsBetween(Window.unboundedPreceding, -1))
    return seg_tiles.select(
        "image_id", "tcol", "trow",
        F.coalesce(F.sum("nseg").over(w), F.lit(0)).alias("offset"))


def with_offsets(seg_tiles):
    """Fat rows + their W2 offsets: narrow-window prefix sum joined
    back by tile key. AQE broadcasts the narrow offsets side when it
    is small (the common case — no shuffle of the fat rows at all);
    at giant-mosaic scale it degrades to a distributed hash join on
    the tile key, never a single-task sort of pixel rows. NOTE: the
    input plan is evaluated twice (once per join side) — call on a
    checkpointed or cheap-to-recompute frame (checkpoint_with_meta
    checkpoints first for exactly this reason)."""
    offs = tile_offsets(seg_tiles.select(
        "image_id", "tcol", "trow", "nseg"))
    return seg_tiles.join(offs, ["image_id", "tcol", "trow"])


META_COLS = ["image_id", "tcol", "trow", "ntcols", "ntrows", "xpos",
             "ypos", "xsize", "ysize", "nseg", "offset", "anchored",
             "present",
             "strip_top", "strip_left", "strip_bottom", "strip_right"]


def checkpoint_with_meta(seg_tiles):
    """Materialize the segmentation kernel output once (the S6 resume
    point) and carve out a NARROW metadata checkpoint for the strip /
    mapping consumers. Checkpointed RDD scans cannot column-prune, so
    without the split every stitch consumer re-reads the fat
    pixel/segtile binaries (four full scans); with it the fat rows
    are scanned exactly twice — once to build the metadata, once by
    the final paint/histogram pass."""
    st0 = seg_tiles.localCheckpoint()
    # offsets AFTER the checkpoint: the narrow window + join-back
    # read the materialized blocks, never re-running the kernel, and
    # no window task ever sorts rows carrying pixels/segtile
    st = with_offsets(st0)
    # lazy: the narrow scan folds into the first consumer's job
    # instead of adding a serial materialization barrier
    meta = st.select(*[c for c in META_COLS if c in st.columns]) \
        .localCheckpoint(eager=False)
    return st, meta


def extract_strips(seg_tiles_off, overlap: int):
    """Boundary strips keyed by the consumer tile, as a PURE SQL
    explode over the strip columns the segment kernel already emitted
    (local uint32 ids + the tile's gid offset). Producer strips are
    the bottom/right overlap bands (tiling.py:1037-1040); consumer
    strips the top/left overlaps (tiling.py:1101-1102). No kernel —
    the fat tile rows are never re-read."""
    s = F.struct
    specs = F.array(
        s(F.lit("H").alias("axis"), F.col("tcol").alias("ktc"),
          F.col("trow").alias("ktr"), F.lit("A").alias("role"),
          F.lit(overlap).alias("srows"), F.col("xsize").alias("scols"),
          F.col("strip_top").alias("strip")),
        s(F.lit("V").alias("axis"), F.col("tcol").alias("ktc"),
          F.col("trow").alias("ktr"), F.lit("A").alias("role"),
          F.col("ysize").alias("srows"), F.lit(overlap).alias("scols"),
          F.col("strip_left").alias("strip")),
        s(F.lit("H").alias("axis"), F.col("tcol").alias("ktc"),
          (F.col("trow") + 1).alias("ktr"), F.lit("B").alias("role"),
          F.lit(overlap).alias("srows"), F.col("xsize").alias("scols"),
          F.col("strip_bottom").alias("strip")),
        s(F.lit("V").alias("axis"), (F.col("tcol") + 1).alias("ktc"),
          F.col("trow").alias("ktr"), F.lit("B").alias("role"),
          F.col("ysize").alias("srows"), F.lit(overlap).alias("scols"),
          F.col("strip_right").alias("strip")))
    return (seg_tiles_off
            .select("image_id", "offset",
                    F.explode(F.filter(
                        specs, lambda e: e["strip"].isNotNull()))
                    .alias("e"))
            .select("image_id", "offset", "e.axis", "e.ktc", "e.ktr",
                    "e.role", "e.srows", "e.scols", "e.strip"))


def correspondence_edges(strips):
    """J1: bounded-neighbour equi-join of consumer (A) and producer
    (B) strips on (image_id, axis, tile key), then a per-pair kernel
    emitting (gid_a -> mode of B under footprint) for every A-segment
    crossing the overlap midline (tiling.py:1128-1306). Strips carry
    local ids; the pair kernel applies each side's gid offset."""
    a = strips.filter(F.col("role") == "A").select(
        "image_id", "axis", "ktc", "ktr", "srows", "scols",
        F.col("strip").alias("strip_a"),
        F.col("offset").alias("off_a"))
    b = strips.filter(F.col("role") == "B").select(
        "image_id", "axis", "ktc", "ktr",
        F.col("strip").alias("strip_b"),
        F.col("offset").alias("off_b"))
    pairs = a.join(b, ["image_id", "axis", "ktc", "ktr"])

    def kernel(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                sa = np.frombuffer(row.strip_a, dtype="<u4").reshape(
                    row.srows, row.scols).astype(np.int64)
                sb = np.frombuffer(row.strip_b, dtype="<u4").reshape(
                    row.srows, row.scols).astype(np.int64)
                sa = np.where(sa > 0, sa + row.off_a, 0)
                sb = np.where(sb > 0, sb + row.off_b, 0)
                n = 0 if row.axis == "H" else 1
                mid = sa.shape[n] // 2
                flat = sa.ravel()
                order = np.argsort(flat, kind="stable")
                svals = flat[order]
                bounds = np.flatnonzero(np.diff(svals)) + 1
                starts = np.concatenate([[0], bounds])
                ends = np.concatenate([bounds, [len(svals)]])
                coords = (order // sa.shape[1] if n == 0
                          else order % sa.shape[1])
                fb = sb.ravel()
                for s, e in zip(starts, ends):
                    gid = int(svals[s])
                    if gid == 0:
                        continue
                    cs = coords[s:e]
                    if not (cs.min() < mid <= cs.max()):
                        continue
                    vals, cnts = np.unique(fb[order[s:e]],
                                           return_counts=True)
                    mode = int(vals[np.argmax(cnts)])
                    if mode != 0:
                        rows.append({"image_id": row.image_id,
                                     "a": gid, "b": mode})
            yield pd.DataFrame(rows, columns=["image_id", "a", "b"])

    return pairs.mapInPandas(kernel, "image_id string, a long, b long")


def connected_components(edges, max_rounds=64,
                         driver_threshold=2_000_000):
    """J2: connected components over the correspondence edge list,
    replacing the reference's order-dependent sequential recode chain
    with an order-independent closure. Returns (image_id, v, root)
    with root = min gid of the component.

    Hybrid strategy: the edge list scales with *boundary-crossing
    segments* (thousands per billion pixels), not pixels, so up to
    ``driver_threshold`` edges a driver-side union-find (one collect,
    zero shuffle rounds) is both faster and simpler; beyond that the
    distributed label-propagation fixpoint below takes over.
    localCheckpoint between rounds cuts lineage (SURVEY.md §7 hard
    part 5)."""
    # single probe job: collect up to threshold+1 rows and decide —
    # if the list fits, those rows ARE the union-find input (no
    # second collect/count job)
    rows = edges.limit(driver_threshold + 1).collect()
    if len(rows) <= driver_threshold:
        # driver-sized by construction: hint downstream joins to
        # broadcast the label table instead of sort-merge shuffling
        # the (much larger) exploded gid frames against it
        return F.broadcast(_cc_driver(edges, rows))
    return _cc_distributed(edges, max_rounds)


def _cc_driver(edges, rows=None):
    if rows is None:
        rows = edges.collect()
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ka = (r["image_id"], r["a"])
        kb = (r["image_id"], r["b"])
        ra, rb = find(ka), find(kb)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = [(k[0], k[1], find(k)[1])
           for k in set(parent) | {(r["image_id"], r["a"])
                                   for r in rows}
           | {(r["image_id"], r["b"]) for r in rows}]
    spark = edges.sparkSession
    return spark.createDataFrame(out, "image_id string, v long, "
                                      "root long")


def _cc_distributed(edges, max_rounds=64):
    """Distributed min-label propagation (for mosaics whose edge list
    exceeds driver memory)."""
    sym = (edges.select("image_id", F.col("a").alias("v"),
                        F.col("b").alias("n"))
           .union(edges.select("image_id", F.col("b").alias("v"),
                               F.col("a").alias("n"))))
    sym = sym.distinct().localCheckpoint()
    labels = (sym.select(F.col("image_id").alias("l_img"),
                         F.col("v").alias("l_v"))
              .distinct()
              .withColumn("root", F.col("l_v"))
              .localCheckpoint())
    for _ in range(max_rounds):
        nbr = labels.select(F.col("l_img").alias("n_img"),
                            F.col("l_v").alias("n_v"),
                            F.col("root").alias("n_root"))
        cand = (sym.join(nbr, (sym.image_id == nbr.n_img)
                         & (sym.n == nbr.n_v))
                .groupBy(sym.image_id, sym.v)
                .agg(F.min("n_root").alias("cand"))
                .select(F.col("image_id").alias("c_img"),
                        F.col("v").alias("c_v"), "cand"))
        new = labels.join(cand, (labels.l_img == cand.c_img)
                          & (labels.l_v == cand.c_v), "left")
        changed = new.filter(
            F.coalesce(F.col("cand"), F.col("root"))
            < F.col("root")).count()
        labels = (new.select(
            "l_img", "l_v",
            F.least(F.col("root"),
                    F.coalesce(F.col("cand"),
                               F.col("root"))).alias("root"))
            .localCheckpoint())
        if changed == 0:
            break
    return labels.select(F.col("l_img").alias("image_id"),
                         F.col("l_v").alias("v"), "root")


MAPPING_SCHEMA = ("image_id string, tcol int, trow int, gid long, "
                  "final long")


def _recode_strip(overlap_a, overlap_b, axis, recode):
    """Replay of the reference's recodeSharedSegments
    (tiling.py:1129-1204) on one overlap strip pair: for every
    current-tile raw segment crossing the overlap midline, record the
    mode of the neighbour's RELABELED strip under its footprint
    (ties -> smallest value, scipy.stats.mode semantics; the null id
    0 participates and can win — the reference recodes such segments
    to null)."""
    n = 0 if axis == "H" else 1
    mid = overlap_a.shape[n] // 2
    flat = overlap_a.ravel()
    order = np.argsort(flat, kind="stable")
    svals = flat[order]
    nz = np.searchsorted(svals, 1)
    if nz == len(svals):
        return
    order, svals = order[nz:], svals[nz:]
    bounds = np.flatnonzero(np.diff(svals)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(svals)]])
    coords = (order // overlap_a.shape[1] if n == 0
              else order % overlap_a.shape[1])
    fb = overlap_b.ravel()
    for s, e in zip(starts, ends):
        cs = coords[s:e]
        if not (cs.min() < mid <= cs.max()):
            continue
        vals, cnts = np.unique(fb[order[s:e]], return_counts=True)
        recode[int(svals[s])] = int(vals[np.argmax(cnts)])


def sequential_stitch_mapping(meta, overlap: int,
                              output: str = "mapping"):
    """gid -> final mapping by EXACT replay of the reference's
    sequential stitch (stitchTiles + recodeTile + relabelSegments,
    tiling.py:950-1306) over boundary strips only.

    The recode recurrence is inherently order-dependent: tile
    (c, r) recodes against the already-relabelled strips of
    (c, r-1) and (c-1, r), modes are taken over FINAL neighbour ids,
    and a segment crossing both overlaps keeps only the left
    neighbour's recode (dict overwrite) — none of which an
    order-independent transitive closure reproduces in general (the
    closure merges the top and left targets; the reference keeps
    them distinct). So the engine evaluates the recurrence exactly,
    per image, while touching none of the pixel data:

    - input is the NARROW tile metadata (strips, anchored/present id
      lists, counts) — O(pixels * overlap / tile_size) bytes, never
      the tiles;
    - tiles are hash-partitioned by image and sorted (trow, tcol);
      the mapInPandas kernel streams them in row-major order keeping
      ONLY the previous tile-row's relabelled strips (O(image_width *
      overlap) state — a 100k-px-wide mosaic holds ~25 MB), so
      arbitrarily tall mosaics stream through bounded memory;
    - different images stitch in parallel (one sequential chain
      each, matching the reference's own per-raster sequential
      stitch); the pixel-heavy stages before (segment kernels) and
      after (paint / histogram) remain embarrassingly parallel.

    Returns (image_id, tcol, trow, gid, final) rows for gids with a
    nonzero final id; consumers default unmapped gids to 0 (the
    reference's SEGNULLVAL for unanchored, unrecoded margins).

    output="hist": instead of mapping rows, remap each tile's
    kernel-emitted core histogram (``hist`` column, LOCAL ids)
    through the lut in-kernel and emit partial final-id histogram
    rows (image_id, seg_id, band, val, cnt) directly — the
    stats-only path then needs NO checkpoint, NO mapping join and NO
    explode: one linear job from image bytes to stats.
    """
    need = ["image_id", "tcol", "trow", "xsize", "ysize", "nseg",
            "anchored", "present",
            "strip_top", "strip_left", "strip_bottom", "strip_right"]
    # gids are only emitted by the mapping output; the hist output
    # needs no per-tile offsets (so callers can skip the
    # with_offsets window entirely)
    if output == "hist":
        need.append("hist")
    else:
        need.append("offset")
    df = (meta.select(*need)
          .repartition("image_id")
          .sortWithinPartitions("image_id", "trow", "tcol"))

    def kernel(batches):
        cur = None
        bottoms = {}
        right_rel = None
        maxseg = 0
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.image_id != cur:
                    cur = row.image_id
                    bottoms, right_rel, maxseg = {}, None, 0
                rd = {}
                if row.trow > 0 and row.strip_top is not None:
                    sa = np.frombuffer(row.strip_top, "<u4").reshape(
                        overlap, row.xsize)
                    _recode_strip(sa, bottoms[row.tcol], "H", rd)
                if row.tcol > 0 and row.strip_left is not None:
                    sa = np.frombuffer(row.strip_left, "<u4").reshape(
                        row.ysize, overlap)
                    _recode_strip(sa, right_rel, "V", rd)
                nseg = int(row.nseg)
                lut = np.zeros(nseg + 1, dtype=np.int64)
                if rd:
                    lut[np.fromiter(rd.keys(), np.int64, len(rd))] = \
                        np.fromiter(rd.values(), np.int64, len(rd))
                # fresh ids: ascending raw id over anchored-not-
                # recoded (segLoc insertion order == ascending id,
                # shepseg.py makeSegmentLocations)
                fresh = np.asarray(
                    sorted(set(int(a) for a in row.anchored)
                           - set(rd)), dtype=np.int64)
                lut[fresh] = maxseg + 1 + np.arange(len(fresh))
                present = np.asarray(row.present, dtype=np.int64)
                if len(present):
                    maxseg = max(maxseg, int(lut[present].max()))
                if row.strip_bottom is not None:
                    sb = np.frombuffer(row.strip_bottom,
                                       "<u4").reshape(
                        overlap, row.xsize).astype(np.int64)
                    bottoms[row.tcol] = lut[sb]
                if row.strip_right is not None:
                    sr = np.frombuffer(row.strip_right,
                                       "<u4").reshape(
                        row.ysize, overlap).astype(np.int64)
                    right_rel = lut[sr]
                if output == "hist":
                    h = row.hist
                    if h is not None and len(h):
                        loc = np.fromiter((e["local"] for e in h),
                                          np.int64, len(h))
                        fin = lut[loc]
                        keep = fin > 0
                        if keep.any():
                            out.append(pd.DataFrame({
                                "image_id": row.image_id,
                                "seg_id": fin[keep],
                                "band": np.fromiter(
                                    (e["band"] for e in h),
                                    np.int32, len(h))[keep],
                                "val": np.fromiter(
                                    (e["val"] for e in h),
                                    np.int64, len(h))[keep],
                                "cnt": np.fromiter(
                                    (e["cnt"] for e in h),
                                    np.int64, len(h))[keep]}))
                    continue
                ids = np.flatnonzero(lut)
                if len(ids):
                    out.append(pd.DataFrame({
                        "image_id": row.image_id,
                        "tcol": row.tcol, "trow": row.trow,
                        "gid": ids + int(row.offset),
                        "final": lut[ids]}))
            if output == "hist":
                yield (pd.concat(out, ignore_index=True) if out
                       else pd.DataFrame(columns=[
                           "image_id", "seg_id", "band", "val",
                           "cnt"]))
            else:
                yield (pd.concat(out, ignore_index=True) if out
                       else pd.DataFrame(columns=[
                           "image_id", "tcol", "trow", "gid",
                           "final"]))

    schema = (MAPPING_SCHEMA if output == "mapping"
              else "image_id string, seg_id long, band int, "
                   "val long, cnt long")
    return df.mapInPandas(kernel, schema)


def build_mapping(seg_tiles_off, cc_labels):
    """gid -> final dense per-image segment id.

    Final IDs are 1..N per image, dense-ranked over the CC roots of
    *anchored* segments (the reference's fresh-ID rule means exactly
    the anchored segments receive identity; W1/W2 dense relabel).
    """
    anchored = seg_tiles_off.select(
        "image_id", "offset",
        F.explode("anchored").alias("local"))
    anchored = anchored.select(
        "image_id", (F.col("local") + F.col("offset")).alias("gid"))
    roots = (anchored.join(cc_labels,
                           (anchored.image_id == cc_labels.image_id)
                           & (anchored.gid == cc_labels.v), "left")
             .select(anchored.image_id.alias("image_id"), "gid",
                     F.coalesce(F.col("root"),
                                F.col("gid")).alias("root")))
    # per-image dense rank WITHOUT a per-image window (a single
    # giant mosaic would put all its roots — O(segments) — into one
    # window task): global two-phase row_number keyed by
    # (image_id, root), then subtract each image's first global rank
    from .scalewin import ordered_row_number
    rn = ordered_row_number(
        roots.select("image_id", "root").distinct(),
        ["image_id", "root"], "_grn")
    base = rn.groupBy("image_id").agg(F.min("_grn").alias("_base"))
    dense = (rn.join(base, "image_id")
             .withColumn("final",
                         (F.col("_grn") - F.col("_base") + 1)
                         .cast("int"))
             .drop("_grn", "_base"))

    # the mapping keeps its tile key: consumers (paint / fused
    # histogram) group straight by tile instead of re-exploding the
    # gid ranges and joining back — two exchanges fewer per consumer
    allg = seg_tiles_off.select(
        "image_id", "tcol", "trow", "offset", "nseg") \
        .filter(F.col("nseg") > 0).select(
        "image_id", "tcol", "trow",
        F.explode(F.sequence(F.col("offset") + 1,
                             F.col("offset") + F.col("nseg"))).alias("gid"))
    gl = (allg.join(cc_labels,
                    (allg.image_id == cc_labels.image_id)
                    & (allg.gid == cc_labels.v), "left")
          .select(allg.image_id.alias("image_id"), "tcol", "trow",
                  "gid",
                  F.coalesce(F.col("root"), F.col("gid")).alias("root")))
    mapping = (gl.join(dense, ["image_id", "root"], "left")
               .select("image_id", "tcol", "trow", "gid",
                       F.coalesce(F.col("final"),
                                  F.lit(0)).alias("final")))
    return mapping


FINAL_TILE_SCHEMA = (
    "image_id string, tcol int, trow int, xout int, yout int, "
    "out_xsize int, out_ysize int, nbands int, pixels binary, "
    "segdata binary, max_final long"
)

FINAL_TILE_SCHEMA_NOPIX = (
    "image_id string, tcol int, trow int, xout int, yout int, "
    "out_xsize int, out_ysize int, nbands int, "
    "segdata binary, max_final long"
)

HIST_COL = (", hist array<struct<seg_id:long, band:int, val:long, "
            "cnt:long>>")


def paint_final_tiles(seg_tiles_off, mapping, overlap: int,
                      with_histogram: bool = False,
                      img_null_val: int | None = None,
                      keep_pixels: bool = True):
    """Apply gid->final mapping to each tile and trim to its core
    (margin = overlap/2, mosaic edges untrimmed; tiling.py:959,
    996-1022).

    Scale note: rather than cogrouping whole images (a fat group for
    a giant mosaic), each tile's gid range joins the mapping table on
    (image_id, gid) and only its own ~nseg mapping rows are shipped
    into the paint kernel — the shuffle is proportional to segment
    count, never pixel count.

    with_histogram=True additionally attaches the tile's partial
    (seg, band, value) histogram to each output row, so the zonal
    stage never re-reads the fat tiles (A3 fused into the paint
    pass).

    keep_pixels=False drops the pixels column from the output —
    segmentation-only consumers (the painted-mosaic sink, subset
    recodes) otherwise pay a second decode+memcpy+Arrow transfer of
    the full imagery just to discard it. The paint stage is
    memcpy-bound (PERF.md round-5 stage split), so this roughly
    halves its moved bytes AND the sink's written bytes; zonal stats
    on RESTORED final tiles need pixels, so the default keeps them
    (the fused with_histogram path already carries the stats
    instead)."""
    margin = overlap // 2
    keys = ["image_id", "tcol", "trow"]
    # the mapping already carries its tile key (build_mapping): one
    # groupBy, no gid re-explode, no join back
    tm = (mapping.groupBy(*keys)
          .agg(F.collect_list(F.struct("gid", "final")).alias("gf")))
    joined = seg_tiles_off.join(tm, keys, "left")

    def kernel(batches):
        for pdf in batches:
            out = []
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
                final = mapped[inv].reshape(core.shape)
                pix_core = None
                if keep_pixels or with_histogram:
                    pix = decode_tile_pixels(row.pixels, row.nbands,
                                             row.ysize, row.xsize)
                    pix_core = pix[:, top:bottom, left:right]
                rec = {
                    "image_id": row.image_id,
                    "tcol": row.tcol, "trow": row.trow,
                    "xout": row.xpos + left, "yout": row.ypos + top,
                    "out_xsize": right - left,
                    "out_ysize": bottom - top,
                    "nbands": row.nbands,
                    "segdata": final.astype("<i8").tobytes(),
                    "max_final": int(final.max()) if final.size else 0,
                }
                if keep_pixels:
                    rec["pixels"] = np.ascontiguousarray(
                        pix_core.astype("<u2")).tobytes()
                if with_histogram:
                    hist = []
                    segf = final.ravel()
                    valid = segf > 0
                    for b in range(row.nbands):
                        v = pix_core[b].ravel().astype(np.int64)
                        m = valid
                        if img_null_val is not None:
                            m = m & (v != img_null_val)
                        if not m.any():
                            continue
                        key = (segf[m] << np.int64(17)) | v[m]
                        uk, cnt = np.unique(key, return_counts=True)
                        hist.extend(
                            {"seg_id": int(k >> 17), "band": b,
                             "val": int(k & ((1 << 17) - 1)),
                             "cnt": int(c)}
                            for k, c in zip(uk, cnt))
                    rec["hist"] = hist
                out.append(rec)
            cols = ["image_id", "tcol", "trow", "xout", "yout",
                    "out_xsize", "out_ysize", "nbands"]
            if keep_pixels:
                cols.append("pixels")
            cols += ["segdata", "max_final"]
            if with_histogram:
                cols.append("hist")
            yield pd.DataFrame(out, columns=cols)

    schema = (FINAL_TILE_SCHEMA if keep_pixels
              else FINAL_TILE_SCHEMA_NOPIX)
    schema += HIST_COL if with_histogram else ""
    return joined.mapInPandas(kernel, schema)


def segment_images_tiled(images_df, cfg: SegConfig, centres=None,
                         with_histogram: bool = False,
                         validate: bool = True,
                         mode: str = "sequential",
                         keep_pixels: bool = True):
    """Full pipeline: images -> final stitched seg tiles.

    Returns (final_tiles_df, seg_tiles_df, centres). seg_tiles_df is
    the checkpointable intermediate (S6) carrying per-tile lineage
    metrics. By default each image gets its own deterministic k-means
    fit; pass a shared (k, nbands) matrix for the giant-single-raster
    mode.

    validate=True runs the planner-side guards first: P5 integer-
    imagery check, and S4 nodata discovery from table metadata when
    cfg.img_null_val is unset (a wrong/missing null value silently
    corrupts every downstream stat).
    """
    if validate:
        import dataclasses

        from .tiling import assert_integer_imagery, discover_img_null_val
        assert_integer_imagery(images_df)
        if cfg.img_null_val is None:
            nv = discover_img_null_val(images_df)
            if nv is not None:
                cfg = dataclasses.replace(cfg, img_null_val=int(nv))
    if centres is None:
        # fully fused path: decode + fit + tile + segment in ONE
        # kernel pass (raw tiles never round-trip through Arrow).
        # Parallelism = image count; the right default for the
        # many-images flagship.
        seg_tiles = explode_and_segment(images_df, cfg)
    else:
        # giant-single-raster mode: tiling and segmentation are
        # separate kernels so the tile rows can SPREAD between them
        # — explode_tiles emits all of an image's tiles in the one
        # partition that decoded it, and without the shuffle the
        # segment kernel would run an entire mosaic serially.
        # spread_small_scan is a no-op once input splits already
        # provide parallelism (the 10^12-images regime), so the
        # extra exchange is paid exactly when intra-image
        # parallelism is the point.
        from .skew import spread_small_scan
        tiles = spread_small_scan(
            explode_tiles(images_df, cfg.tile_size, cfg.overlap))
        seg_tiles = segment_tiles(tiles, centres, cfg)
    final = stitch(seg_tiles, cfg, with_histogram=with_histogram,
                   mode=mode, keep_pixels=keep_pixels)
    return final, seg_tiles, centres


def stitch(seg_tiles, cfg: SegConfig, with_histogram: bool = False,
           simple_recode: bool = False, mode: str = "sequential",
           keep_pixels: bool = True):
    """Stitch phase on a (possibly checkpoint-restored) seg_tiles.

    localCheckpoint materializes the expensive kernel output exactly
    once so the stitch consumers never re-run the segmentation (on a
    cluster this is the durable S6 checkpoint instead —
    plans/checkpoint.py).

    mode="sequential" (default): exact replay of the reference's
    order-dependent recode recurrence over boundary strips
    (:func:`sequential_stitch_mapping`) — bitwise-equal mosaics to
    the reference on EVERY input, parallel across images, streaming
    within an image.

    mode="cc": the order-independent strip-join + mode-edge +
    connected-components closure (J1/J2). Fully parallel WITHIN one
    image, but a documented deviation from the reference: modes are
    taken over raw (not already-recoded) neighbour labels and
    top/left recode targets are transitively merged rather than
    overwritten, so chained boundary segments can resolve
    differently. Use for single giant mosaics where one sequential
    chain per image is unacceptable and reference-exactness is not
    required.

    MEASURED decision rule (r06, 14592^2 = 5776 tiles, stage
    decomposition in PERF.md): the sequential replay costs ~1.8-2.0
    ms/tile of SERIAL mapping time (flat in cores — the Amdahl
    term; 10-11.5 s at 5776 tiles whether 8 or 32 cores), while the
    cc mapping is a distributed stage of ~7-15 s that scales with
    cores (6.6-7.1 s at 32). Prefer mode="cc" when
    tiles x ~1.9 ms exceeds the cc mapping stage time at your
    parallelism — ~5k tiles/mosaic at 32 cores, earlier on larger
    clusters; below that the kernel+paint phases dominate both
    modes and the bitwise-exact sequential default is free.

    simple_recode=True is the reference's simpleTileRecode mode
    (tiling.py:1024-1030): every tile's local IDs are just offset to
    be globally unique; boundary segments are NOT merged across
    tiles (faster, used when cross-tile consistency is not needed).
    Expressed here as an identity gid mapping — no strip join, no
    CC, no shuffle beyond the offset window."""
    st, meta = checkpoint_with_meta(seg_tiles)
    if simple_recode:
        mapping = (meta.filter(F.col("nseg") > 0)
                   .select("image_id", "tcol", "trow",
                           F.explode(F.sequence(
                               F.col("offset") + 1,
                               F.col("offset") + F.col("nseg")))
                           .alias("gid"))
                   .withColumn("final", F.col("gid")))
    elif mode == "sequential":
        mapping = sequential_stitch_mapping(meta, cfg.overlap)
    else:
        strips = extract_strips(meta, cfg.overlap)
        edges = correspondence_edges(strips)
        cc = connected_components(edges)
        mapping = build_mapping(meta, cc)
    return paint_final_tiles(st, mapping, cfg.overlap,
                             with_histogram=with_histogram,
                             img_null_val=cfg.img_null_val,
                             keep_pixels=keep_pixels)


# ---------------------------------------------------------------------------
# whole-image fast path (the 10^12-image flagship: one tile per image)
# ---------------------------------------------------------------------------

SEG_IMAGE_SCHEMA = (
    "image_id string, w int, h int, nbands int, nseg long, "
    "segdata binary, n_single_elim int, n_small_elim int, "
    "seg_secs double"
)


def segment_images(images_df, cfg: SegConfig, centres=None):
    """Segment each image as a single tile (mapInPandas, zero
    shuffle). The common path when individual images fit a worker —
    at 10^12-image scale parallelism comes from the image count, and
    tiling is reserved for oversized rasters.

    centres: None (fit per image inside the kernel — fully fused, one
    pass over the data), a shared numpy matrix, or a per-image
    centres DataFrame to broadcast-join."""
    cfg_b = cfg
    shared = centres if isinstance(centres, np.ndarray) else None
    has_k = "num_clusters" in images_df.columns
    cols = ["image_id", "bytes", "w", "h", "fmt"] + (
        ["num_clusters"] if has_k else [])
    df = images_df.select(*cols)
    if centres is not None and not isinstance(centres, np.ndarray):
        df = df.join(centres.select("image_id", "centres"),
                     "image_id")

    def kernel(batches):
        from ..sources.codec import decode_image
        from .tiling import fit_image_centres
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                t0 = time.time()
                try:
                    img = decode_image(row.bytes, row.fmt,
                                       row.w, row.h)
                except Exception:
                    if cfg_b.on_decode_error == "skip":
                        continue
                    raise
                k = int(getattr(row, "num_clusters",
                                cfg_b.num_clusters)
                        or cfg_b.num_clusters)
                if shared is not None:
                    c = shared
                elif hasattr(row, "centres"):
                    c = np.frombuffer(row.centres,
                                      dtype="<f8").reshape(
                        -1, img.shape[0])
                else:
                    # same floored-sample fit as the tiled path:
                    # both consumption paths give identical results
                    # on images that fit one tile
                    c = fit_image_centres(img, k, cfg_b)
                res = do_shepherd_segmentation(
                    img,
                    min_segment_size=cfg_b.min_segment_size,
                    max_spectral_diff=cfg_b.max_spectral_diff,
                    img_null_val=cfg_b.img_null_val,
                    four_connected=cfg_b.four_connected,
                    centres=c,
                    spect_dist_pcntile=cfg_b.spect_dist_pcntile,
                    max_clump_size=cfg_b.max_clump_size)
                seg = res.segimg.astype("<i8")
                out.append({
                    "image_id": row.image_id,
                    "w": row.w, "h": row.h, "nbands": img.shape[0],
                    "nseg": int(seg.max()),
                    "segdata": seg.tobytes(),
                    "n_single_elim": int(res.single_pixels_eliminated),
                    "n_small_elim": int(res.small_segments_eliminated),
                    "seg_secs": time.time() - t0,
                })
            yield pd.DataFrame(out, columns=[
                "image_id", "w", "h", "nbands", "nseg", "segdata",
                "n_single_elim", "n_small_elim", "seg_secs"])

    return df.mapInPandas(kernel, SEG_IMAGE_SCHEMA)


def assemble_image(final_tiles_pdf: pd.DataFrame, w: int, h: int):
    """Driver/test helper: paste trimmed tiles into a full (h, w)
    int64 raster (the trimmed cores tile the mosaic disjointly)."""
    out = np.zeros((h, w), dtype=np.int64)
    for row in final_tiles_pdf.itertuples(index=False):
        arr = np.frombuffer(row.segdata, dtype="<i8").reshape(
            row.out_ysize, row.out_xsize)
        out[row.yout:row.yout + row.out_ysize,
            row.xout:row.xout + row.out_xsize] = arr
    return out


__all__ = ["SegConfig", "fit_global_centres", "segment_tiles",
           "with_offsets", "tile_offsets", "extract_strips", "correspondence_edges",
           "connected_components", "build_mapping",
           "sequential_stitch_mapping",
           "paint_final_tiles", "segment_images_tiled", "stitch",
           "segment_images", "assemble_image", "DataFrame"]
