"""Spark pipeline tests: tiled segmentation end-to-end."""

import numpy as np
from pyspark.sql import functions as F

from pyshepseg_spark.operators.segment import (SegConfig, segment_images_tiled,
                                               assemble_image,
                                               segment_images)
from pyshepseg_spark.operators.tiling import explode_tiles, tile_metrics
from pyshepseg_spark.operators.zonal import (check_empty_segments,
                                             segment_sizes)
from pyshepseg_spark.sources.codec import decode_image
from tests.conftest import SIZE, reconstruction_fraction


def test_explode_tiles_pixel_equality(spark, images_fixture):
    pdf, _, images = images_fixture
    tiles = explode_tiles(images, 128, 32).toPandas()
    row = pdf.iloc[0]
    img = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
    g = tiles[tiles.image_id == row["image_id"]]
    assert len(g) == 4  # 256 px, tile 128, overlap 32 -> 2x2 grid
    for t in g.itertuples(index=False):
        sub = np.frombuffer(t.pixels, dtype="<u2").reshape(
            t.nbands, t.ysize, t.xsize)
        expect = img[:, t.ypos:t.ypos + t.ysize,
                     t.xpos:t.xpos + t.xsize]
        assert np.array_equal(sub, expect)


def test_tiled_segmentation_reconstruction(images_fixture, final_tiles):
    """The reference CI gate, on the stitched output: 100% of valid
    pixels reconstruct within 0.5; null masks exact; IDs dense."""
    pdf, truths, _ = images_fixture
    fpdf = final_tiles.toPandas()
    for iid, g in fpdf.groupby("image_id"):
        row = pdf[pdf.image_id == iid].iloc[0]
        img = decode_image(row["bytes"], row["fmt"], row["w"],
                           row["h"])
        seg = assemble_image(g, row["w"], row["h"])
        assert reconstruction_fraction(seg, img) == 1.0
        # every null input pixel is null in the output; the reverse
        # is NOT an invariant: the reference's sequential recode can
        # legitimately null out a boundary segment (mode of the
        # neighbour strip is SEGNULLVAL, tiling.py:1194-1203), and
        # the engine reproduces that bitwise
        assert (seg[truths[iid] == 0] == 0).all()
        sizes = np.bincount(seg.ravel())
        assert (sizes[1:] > 0).all()  # dense IDs, no empty segments


def test_no_empty_segments(spark, final_tiles):
    sizes = segment_sizes(final_tiles)
    assert check_empty_segments(sizes).count() == 0


def test_whole_image_path_agrees_on_segment_structure(
        spark, images_fixture, cfg):
    """Whole-image (single-tile) fast path also passes the
    reconstruction gate and produces per-image dense IDs."""
    pdf, truths, images = images_fixture
    out = segment_images(images, cfg).collect()
    assert len(out) == len(pdf)
    for r in out:
        seg = np.frombuffer(r["segdata"], dtype="<i8").reshape(
            r["h"], r["w"])
        row = pdf[pdf.image_id == r["image_id"]].iloc[0]
        img = decode_image(row["bytes"], row["fmt"], row["w"],
                           row["h"])
        assert reconstruction_fraction(seg, img) == 1.0
        assert ((seg == 0) == (truths[r["image_id"]] == 0)).all()


def test_lineage_metrics(spark, images_fixture, cfg):
    from pyshepseg_spark.operators.segment import (
        fit_centres_per_image, segment_tiles)
    _, _, images = images_fixture
    tiles = explode_tiles(images, cfg.tile_size, cfg.overlap)
    centres = fit_centres_per_image(images, cfg)
    st = segment_tiles(tiles, centres, cfg)
    m = tile_metrics(st).toPandas()
    assert (m.n_tiles == 4).all()
    assert (m.kernel_secs > 0).all()
    assert (m.n_local_segments > 0).all()


def test_stitch_consistency_single_vs_multi_partition(
        spark, images_fixture, cfg, final_tiles):
    """Order-independence: the stitched result must not depend on
    partitioning/parallelism (the two-cluster-size invariance at the
    correctness level)."""
    from pyshepseg_spark.operators.segment import segment_images_tiled
    pdf, _, images = images_fixture
    final2, _, _ = segment_images_tiled(images.repartition(1), cfg)
    a = final_tiles.toPandas()
    b = final2.toPandas()
    for iid in pdf.image_id:
        sa = assemble_image(a[a.image_id == iid], SIZE, SIZE)
        sb = assemble_image(b[b.image_id == iid], SIZE, SIZE)
        assert np.array_equal(sa, sb)


def test_large_multi_tile_grid(spark):
    """5x5 tile grid (interior tiles, 4-neighbour stitch chains):
    the reconstruction gate must hold across long correspondence
    chains, not just 2x2 grids."""
    import pandas as pd
    from pyshepseg_spark.operators.segment import segment_images_tiled
    from pyshepseg_spark.sources.imagegen import generate_image
    row, truth = generate_image(5, size=1024)
    pdf = pd.DataFrame([row])
    pdf["num_clusters"] = int(row["caption"].split(": ")[1].split()[0])
    images = spark.createDataFrame(pdf)
    cfg = SegConfig(img_null_val=65535, four_connected=False,
                    min_segment_size=50, tile_size=256, overlap=64)
    final, _, _ = segment_images_tiled(images, cfg)
    fp = final.toPandas()
    from pyshepseg_spark.operators.tiling import tile_grid
    expected_tiles, ntc, ntr = tile_grid(1024, 1024, 256, 64)
    assert ntc == ntr == 4 and len(fp) == len(expected_tiles) == 16
    img = decode_image(row["bytes"], row["fmt"], 1024, 1024)
    seg = assemble_image(fp, 1024, 1024)
    assert reconstruction_fraction(seg, img) == 1.0
    assert (seg[truth == 0] == 0).all()
    sizes = np.bincount(seg.ravel())
    assert (sizes[1:] > 0).all()
    # bitwise vs the reference sequential stitch across the full
    # 4x4 grid (long recode chains through interior tiles)
    from pyshepseg_spark.refharness import reference_stitched_mosaic
    ref = reference_stitched_mosaic(
        img, int(pdf["num_clusters"][0]), cfg)
    assert (seg == ref).all()


def test_fused_paint_histogram_equals_two_pass(spark, images_fixture,
                                               cfg, final_tiles):
    """paint(with_histogram=True) attaches per-tile partial
    histograms; the exploded merge must equal the two-pass kernel
    histogram. (Kept non-default: at small tile counts the
    struct-array serialization costs more than the saved pass.)"""
    from pyshepseg_spark.operators.zonal import tile_value_histogram
    _, _, images = images_fixture
    fused, _, _ = segment_images_tiled(images, cfg,
                                       with_histogram=True)
    h1 = tile_value_histogram(fused, img_null_val=65535).toPandas()
    h2 = tile_value_histogram(final_tiles,
                              img_null_val=65535).toPandas()
    key = ["image_id", "seg_id", "band", "val"]
    h1 = h1.sort_values(key).reset_index(drop=True)
    h2 = h2.sort_values(key).reset_index(drop=True)
    assert h1.equals(h2)


def test_fused_histogram_honours_late_null_val(spark, images_fixture,
                                               cfg, final_tiles):
    """The SQL fast path must apply img_null_val even when the fused
    hist was built without paint-time filtering (hist keeps full
    value granularity, so post-hoc filtering is exact)."""
    import dataclasses
    from pyshepseg_spark.operators.segment import stitch
    from pyshepseg_spark.operators.zonal import tile_value_histogram
    _, _, images = images_fixture
    # same segmentation as the fixture (deterministic), but paint the
    # fused histogram with null kept, so the SQL path must filter it
    _, seg_tiles, _ = segment_images_tiled(images, cfg)
    cfg_keep = dataclasses.replace(cfg, img_null_val=None)
    fused = stitch(seg_tiles, cfg_keep, with_histogram=True)
    h_fused = tile_value_histogram(fused, img_null_val=65535).toPandas()
    h_ref = tile_value_histogram(final_tiles,
                                 img_null_val=65535).toPandas()
    assert not (h_fused["val"] == 65535).any()
    key = ["image_id", "seg_id", "band", "val"]
    assert h_fused.sort_values(key).reset_index(drop=True).equals(
        h_ref.sort_values(key).reset_index(drop=True))


def test_stats_from_stitch_equals_paint_then_histogram(
        spark, images_fixture, cfg, final_tiles):
    """The one-pass stats path (histogram emitted directly from the
    stitch mapping, mosaic never materialized) must equal the
    two-step paint -> tile_value_histogram exactly."""
    from pyshepseg_spark.operators.zonal import (
        segment_stats, segment_stats_tiled, tile_value_histogram)
    _, _, images = images_fixture
    got = segment_stats_tiled(images, cfg, percentiles=(50,)) \
        .toPandas()
    want = segment_stats(
        tile_value_histogram(final_tiles, img_null_val=65535),
        percentiles=(50,)).toPandas()
    key = ["image_id", "seg_id", "band"]
    g = got.sort_values(key, ignore_index=True)
    w = want.sort_values(key, ignore_index=True)
    assert len(g) == len(w)
    for c in g.columns:
        a, b = g[c].to_numpy(), w[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b, equal_nan=True), c
        else:
            assert (a == b).all(), c


def test_stats_tiled_with_nodata_counts(spark, images_fixture, cfg):
    """A4 wired through the tiled stats path: with_nodata=True adds
    nodata_cnt/valid_cnt without changing any stat value, and the
    fixture's null margin contributes zero (null pixels are seg 0)."""
    from pyshepseg_spark.operators.zonal import segment_stats_tiled
    _, _, images = images_fixture
    got = segment_stats_tiled(images, cfg, percentiles=(50,),
                              with_nodata=True).toPandas()
    plain = segment_stats_tiled(images, cfg, percentiles=(50,)) \
        .toPandas()
    key = ["image_id", "seg_id", "band"]
    g = got.sort_values(key, ignore_index=True)
    p = plain.sort_values(key, ignore_index=True)
    assert len(g) == len(p)
    assert (g["nodata_cnt"] == 0).all()  # nulls live outside segments
    assert (g["valid_cnt"].to_numpy()
            == p["pix_count"].to_numpy()).all()
    for c in p.columns:
        a, b = g[c].to_numpy(), p[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b, equal_nan=True), c
        else:
            assert (a == b).all(), c


def test_simple_recode_mode(spark, images_fixture, cfg):
    """simpleTileRecode analogue (tiling.py:1024-1030): tile-local
    IDs offset to global uniqueness, NO cross-tile merging — every
    painted id maps back to exactly one (tile, local id), and ids
    from different tiles never collide."""
    from pyshepseg_spark.operators.segment import (explode_and_segment,
                                                   stitch)
    _, _, images = images_fixture
    st = explode_and_segment(images, cfg)
    final = stitch(st, cfg, simple_recode=True).toPandas()
    seg_tiles = st.toPandas()
    for iid, g in final.groupby("image_id"):
        ids = set()
        for t in g.itertuples(index=False):
            seg = np.frombuffer(t.segdata, dtype="<i8")
            tids = set(int(v) for v in np.unique(seg[seg > 0]))
            assert not (ids & tids), "cross-tile id collision"
            ids |= tids
        n_local = seg_tiles[seg_tiles.image_id == iid].nseg.sum()
        # ids are a subset of 1..sum(nseg) (margin-only ids trimmed)
        assert max(ids) <= n_local and min(ids) >= 1


def test_distributed_cc_equals_driver_union_find(spark):
    """The label-propagation fixpoint (_cc_distributed — the >2M-edge
    scale path) must produce the same components/roots as the driver
    union-find on the same edge list, including chains, cycles and
    multi-image keys."""
    import pandas as pd
    from pyshepseg_spark.operators.segment import (_cc_distributed,
                                                   connected_components)
    rng = np.random.default_rng(17)
    edges = []
    # long chain, a cycle, star, and random edges across two images
    for img in ["a", "b"]:
        edges += [(img, i, i + 1) for i in range(1, 30)]       # chain
        edges += [(img, 100, 101), (img, 101, 102),
                  (img, 102, 100)]                             # cycle
        edges += [(img, 200, 200 + j) for j in range(1, 6)]    # star
        for _ in range(40):
            a, b = rng.integers(300, 400, 2)
            if a != b:
                edges.append((img, int(a), int(b)))
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["image_id", "a", "b"]))
    drv = connected_components(df).toPandas() \
        .sort_values(["image_id", "v"], ignore_index=True)
    dist = _cc_distributed(df).toPandas() \
        .sort_values(["image_id", "v"], ignore_index=True)
    assert len(drv) == len(dist)
    for c in ["image_id", "v", "root"]:
        assert (drv[c].to_numpy() == dist[c].to_numpy()).all(), c
    # roots are component minima
    g = drv.groupby(["image_id", "root"]).v.min()
    assert (g.values == [k[1] for k in g.index]).all()


def test_cc_stitch_mode_still_consistent(spark, images_fixture, cfg):
    """mode='cc' (order-independent fixpoint stitch for single giant
    mosaics) remains available and self-consistent: reconstruction
    gate holds, IDs dense, and it agrees with the sequential-exact
    default wherever no boundary segment chains through a recoded
    strip (image 0 of the fixture — the parity suite's original
    bitwise case)."""
    pdf, truths, images = images_fixture
    final_cc, _, _ = segment_images_tiled(images, cfg, mode="cc")
    fpdf = final_cc.toPandas()
    from tests.conftest import SIZE, reconstruction_fraction
    for iid, g in fpdf.groupby("image_id"):
        row = pdf[pdf.image_id == iid].iloc[0]
        img = decode_image(row["bytes"], row["fmt"], row["w"],
                           row["h"])
        seg = assemble_image(g, row["w"], row["h"])
        assert reconstruction_fraction(seg, img) == 1.0
        sizes = np.bincount(seg.ravel())
        assert (sizes[1:] > 0).all()
    # image 0: both modes bitwise-equal (no chained recodes there)
    final_seq, _, _ = segment_images_tiled(images, cfg)
    iid = pdf.image_id.iloc[0]
    sa = assemble_image(
        final_seq.toPandas().query("image_id == @iid"), SIZE, SIZE)
    sb = assemble_image(fpdf[fpdf.image_id == iid], SIZE, SIZE)
    assert np.array_equal(sa, sb)


def test_sequential_stitch_random_configs_bitwise(spark):
    """Property-style stitch parity: random seeds x random grid
    shapes (edge-grown last row/col, asymmetric overlaps) — the
    distributed sequential stitch must equal the reference recode
    replay bitwise on all of them, not just the curated fixtures."""
    import pandas as pd
    from pyshepseg_spark.refharness import reference_stitched_mosaic
    from pyshepseg_spark.operators.segment import segment_images_tiled
    from pyshepseg_spark.sources.imagegen import generate_image

    cases = [  # (seed, size, tile, overlap)
        (11, 200, 96, 24),    # 3x3 with heavy edge-grow
        (12, 320, 128, 64),   # fat overlap (mid = 32)
        (13, 260, 192, 48),   # 2x2, uneven core split
    ]
    rows, cfgs = [], []
    for seed, size, tile, ov in cases:
        row, _ = generate_image(seed, size=size)
        row = dict(row)
        row["num_clusters"] = int(
            row["caption"].split(": ")[1].split()[0])
        rows.append(row)
        cfgs.append((size, SegConfig(
            img_null_val=65535, four_connected=False,
            min_segment_size=50, tile_size=tile, overlap=ov)))
    for row, (size, cfg) in zip(rows, cfgs):
        images = spark.createDataFrame(pd.DataFrame([row]))
        final, _, _ = segment_images_tiled(images, cfg)
        got = assemble_image(final.toPandas(), size, size)
        img = decode_image(row["bytes"], row["fmt"], size, size)
        ref = reference_stitched_mosaic(img, row["num_clusters"], cfg)
        assert (got == ref).all(), (row["image_id"], cfg.tile_size,
                                    cfg.overlap)


def test_single_tile_images_tiled_equals_whole_image_stats(spark):
    """Images no bigger than one tile: the tiled stats path (stitch
    degenerate) must produce exactly the whole-image fused flagship's
    stats — the two consumption paths agree where they overlap."""
    import pandas as pd
    from pyshepseg_spark.operators.zonal import (
        segment_and_histogram, segment_stats, segment_stats_tiled)
    from pyshepseg_spark.sources.imagegen import generate_images_pdf
    pdf = generate_images_pdf(3, size=96, seed=5)
    pdf["num_clusters"] = [int(c.split(": ")[1].split()[0])
                           for c in pdf["caption"]]
    images = spark.createDataFrame(pdf)
    cfg = SegConfig(img_null_val=65535, four_connected=False,
                    min_segment_size=50, tile_size=128, overlap=32)
    a = segment_stats_tiled(images, cfg, percentiles=(50,)) \
        .toPandas().sort_values(
            ["image_id", "seg_id", "band"], ignore_index=True)
    b = segment_stats(
        segment_and_histogram(images, cfg), percentiles=(50,)) \
        .toPandas().sort_values(
            ["image_id", "seg_id", "band"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_fully_null_image_degrades_gracefully(spark):
    """One all-null image must not kill the stage (10^12-image jobs
    WILL contain garbage rows): zero segments, empty stats, all-null
    painted tiles, on both consumption paths."""
    import pandas as pd
    from pyshepseg_spark.operators.zonal import segment_stats_tiled
    from pyshepseg_spark.sources.codec import average_phash, encode_image
    img = np.full((3, 256, 256), 65535, dtype=np.uint16)
    row = {"image_id": "allnull", "bytes": encode_image(img, "png"),
           "w": 256, "h": 256, "fmt": "png", "caption": "x",
           "phash": int(average_phash(img[0])), "num_clusters": 8}
    images = spark.createDataFrame(pd.DataFrame([row]))
    cfg = SegConfig(img_null_val=65535, four_connected=False,
                    min_segment_size=50, tile_size=128, overlap=32)
    assert segment_stats_tiled(images, cfg).count() == 0
    final, _, _ = segment_images_tiled(images, cfg)
    fp = final.toPandas()
    assert len(fp) == 4
    assert all(np.frombuffer(r.segdata, dtype="<i8").max() == 0
               for r in fp.itertuples())
    out = segment_images(images, cfg).collect()
    assert out[0]["nseg"] == 0


def test_non_square_image_bitwise(spark):
    """Rectangular rasters (3x2 tile grid) stitch bitwise-equal to
    the reference replay — every other fixture is square."""
    import pandas as pd
    from pyshepseg_spark.refharness import reference_stitched_mosaic
    from pyshepseg_spark.sources.codec import (average_phash,
                                               encode_image)
    from pyshepseg_spark.sources.imagegen import (NULL_MARGIN,
                                                  make_pallete,
                                                  paint_image,
                                                  voronoi_truth)
    w, h, k = 320, 200, 12
    rng = np.random.default_rng(99)
    margin = NULL_MARGIN + 2
    centres = np.stack([rng.uniform(margin, w - margin, size=k),
                        rng.uniform(margin, h - margin, size=k)],
                       axis=1)
    img = paint_image(voronoi_truth(w, h, centres),
                      make_pallete(k, rng))
    row = {"image_id": "rect", "bytes": encode_image(img, "png"),
           "w": w, "h": h, "fmt": "png", "caption": "x",
           "phash": int(average_phash(img[0])), "num_clusters": k}
    cfg = SegConfig(img_null_val=65535, four_connected=False,
                    min_segment_size=50, tile_size=128, overlap=32)
    final, _, _ = segment_images_tiled(
        spark.createDataFrame(pd.DataFrame([row])), cfg)
    got = assemble_image(final.toPandas(), w, h)
    ref = reference_stitched_mosaic(
        decode_image(row["bytes"], "png", w, h), k, cfg)
    assert (got == ref).all()


def test_tall_mosaic_streams_across_arrow_batches(spark):
    """The sequential stitch keeps its rolling cache across Arrow
    batch boundaries: force tiny batches (4 tile rows each) on a
    2x12-tile tall mosaic and require bitwise equality with the
    reference replay."""
    import pandas as pd
    from pyshepseg_spark.refharness import reference_stitched_mosaic
    from pyshepseg_spark.sources.codec import (average_phash,
                                               encode_image)
    from pyshepseg_spark.sources.imagegen import (NULL_MARGIN,
                                                  make_pallete,
                                                  paint_image,
                                                  voronoi_truth)
    w, h, k = 224, 1184, 16      # tile 128 / overlap 32 -> 2 x 12
    rng = np.random.default_rng(123)
    margin = NULL_MARGIN + 2
    centres = np.stack([rng.uniform(margin, w - margin, size=k),
                        rng.uniform(margin, h - margin, size=k)],
                       axis=1)
    img = paint_image(voronoi_truth(w, h, centres),
                      make_pallete(k, rng))
    row = {"image_id": "tall", "bytes": encode_image(img, "png"),
           "w": w, "h": h, "fmt": "png", "caption": "x",
           "phash": int(average_phash(img[0])), "num_clusters": k}
    cfg = SegConfig(img_null_val=65535, four_connected=False,
                    min_segment_size=50, tile_size=128, overlap=32)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        final, _, _ = segment_images_tiled(
            spark.createDataFrame(pd.DataFrame([row])), cfg)
        got = assemble_image(final.toPandas(), w, h)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    ref = reference_stitched_mosaic(
        decode_image(row["bytes"], "png", w, h), k, cfg)
    assert (got == ref).all()


def test_corrupt_image_row_skippable(spark):
    """A corrupt bytes row with cfg.on_decode_error='skip' drops out
    of every consumption path instead of killing the stage; the
    default ('fail') still raises, matching the reference."""
    import dataclasses
    import pandas as pd
    import pytest
    from pyshepseg_spark.operators.zonal import segment_stats_tiled
    from pyshepseg_spark.sources.imagegen import generate_images_pdf
    pdf = generate_images_pdf(2, size=96, seed=41)
    pdf["num_clusters"] = [int(c.split(": ")[1].split()[0])
                           for c in pdf["caption"]]
    bad = pdf.iloc[[0]].copy()
    bad["image_id"] = "corrupt"
    bad["bytes"] = [b"not a png at all"]
    table = pd.concat([pdf, bad], ignore_index=True)
    images = spark.createDataFrame(table)
    cfg = SegConfig(img_null_val=65535, four_connected=False,
                    min_segment_size=50, tile_size=64, overlap=16)
    with pytest.raises(Exception):
        segment_stats_tiled(images, cfg).count()
    cfg_skip = dataclasses.replace(cfg, on_decode_error="skip")
    out = segment_stats_tiled(images, cfg_skip, percentiles=(50,)) \
        .toPandas()
    assert set(out["image_id"]) == set(pdf["image_id"])
    segs = segment_images(images, cfg_skip).toPandas()
    assert set(segs["image_id"]) == set(pdf["image_id"])


def test_fit_global_centres_discovers_nodata(spark, images_fixture,
                                             cfg):
    """ADVICE r4 (medium): --global-centres with --null-val omitted
    must not sample nodata pixels into the global k-means fit (the
    reference's fitSpectralClustersWholeFile samples only non-null
    pixels). fit_global_centres now runs the same S4 metadata
    discovery as segment_images_tiled's validate block: with
    band_null_vals declared, img_null_val=None yields exactly the
    explicit-null fit, while validate=False reproduces the old
    nodata-polluted sample (the generated images carry a 65535
    margin) and provably shifts the centres."""
    import dataclasses

    import numpy as np
    from pyspark.sql import functions as F

    from pyshepseg_spark.operators.segment import fit_global_centres
    _, _, images = images_fixture
    tagged = images.withColumn("band_null_vals",
                               F.array(F.lit(65535)))
    nocfg = dataclasses.replace(cfg, img_null_val=None)
    c_auto = fit_global_centres(tagged, nocfg)
    c_explicit = fit_global_centres(images, cfg)
    assert np.array_equal(c_auto, c_explicit)
    c_raw = fit_global_centres(tagged, nocfg, validate=False)
    assert not np.array_equal(c_raw, c_explicit)


def test_giant_mosaic_shared_centres_paths_agree(spark,
                                                 images_fixture, cfg):
    """Giant-single-raster mode (shared centres matrix): the unfused
    spread-tiles stats path (segment_stats_tiled centres=...) must
    equal paint -> tile_value_histogram -> finalizers over
    segment_images_tiled with the SAME centres, and the tile-row
    spread must not change any value (kernels are per-tile pure;
    stitch order is re-established by sort)."""
    import numpy as np
    from pyshepseg_spark.operators.segment import (fit_global_centres,
                                                   segment_images_tiled)
    from pyshepseg_spark.operators.zonal import (
        segment_stats, segment_stats_tiled, tile_value_histogram)
    _, _, images = images_fixture
    one = images.limit(1)
    centres = fit_global_centres(one, cfg)
    final, _, _ = segment_images_tiled(one, cfg, centres=centres)
    want = segment_stats(
        tile_value_histogram(final, img_null_val=65535),
        percentiles=(50,)).toPandas()
    got = segment_stats_tiled(one, cfg, percentiles=(50,),
                              centres=centres).toPandas()
    key = ["image_id", "seg_id", "band"]
    g = got.sort_values(key, ignore_index=True)
    w = want.sort_values(key, ignore_index=True)
    assert len(g) == len(w) and len(g) > 0
    for c in g.columns:
        a, b = g[c].to_numpy(), w[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b, equal_nan=True), c
        else:
            assert (a == b).all(), c


def test_keep_pixels_false_drops_column_keeps_segdata(
        spark, images_fixture, cfg, final_tiles):
    """keep_pixels=False (the segdata-only sink path) must drop ONLY
    the pixels column — identical segmentation, identical tile
    geometry — since the paint stage is memcpy-bound and
    segmentation-only consumers shouldn't move imagery they drop."""
    _, _, images = images_fixture
    from pyshepseg_spark.operators.segment import segment_images_tiled
    nopix, _, _ = segment_images_tiled(images, cfg,
                                       keep_pixels=False)
    assert "pixels" not in nopix.columns
    keys = ["image_id", "tcol", "trow"]
    got = (nopix.select(*keys, "xout", "yout", "segdata")
           .toPandas().sort_values(keys, ignore_index=True))
    want = (final_tiles.select(*keys, "xout", "yout", "segdata")
            .toPandas().sort_values(keys, ignore_index=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got, want)


def test_keep_pixels_false_with_histogram(spark, images_fixture, cfg):
    """with_histogram=True needs the imagery INSIDE the paint kernel
    but must still honour keep_pixels=False on the output: hist
    attached, pixels column absent, hist identical to the default
    path."""
    _, _, images = images_fixture
    from pyshepseg_spark.operators.segment import segment_images_tiled
    nopix, _, _ = segment_images_tiled(
        images, cfg, with_histogram=True, keep_pixels=False)
    withpix, _, _ = segment_images_tiled(
        images, cfg, with_histogram=True, keep_pixels=True)
    assert "pixels" not in nopix.columns
    assert "hist" in nopix.columns
    from pyspark.sql import functions as F

    def hist_rows(df):
        return (df.select("image_id",
                          F.explode("hist").alias("h"))
                .select("image_id", "h.seg_id", "h.band", "h.val",
                        "h.cnt")
                .toPandas()
                .sort_values(["image_id", "seg_id", "band", "val"],
                             ignore_index=True))

    import pandas as pd
    pd.testing.assert_frame_equal(hist_rows(nopix),
                                  hist_rows(withpix))
