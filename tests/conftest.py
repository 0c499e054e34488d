import numpy as np
import pytest

from pyshepseg_spark.operators.segment import SegConfig, segment_images_tiled
from pyshepseg_spark.session import get_spark
from pyshepseg_spark.sources.imagegen import generate_images_pdf

SIZE = 256
N_IMAGES = 3


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pyshepseg_spark_tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def images_fixture(spark):
    pdf, truths = generate_images_pdf(N_IMAGES, size=SIZE,
                                      with_truth=True)
    pdf["num_clusters"] = [int(c.split(": ")[1].split()[0])
                           for c in pdf["caption"]]
    df = spark.createDataFrame(pdf)
    return pdf, truths, df


@pytest.fixture(scope="session")
def cfg():
    return SegConfig(img_null_val=65535, four_connected=False,
                     min_segment_size=50, tile_size=128, overlap=32)


@pytest.fixture(scope="session")
def final_tiles(spark, images_fixture, cfg):
    _, _, images = images_fixture
    final, seg_tiles, _ = segment_images_tiled(images, cfg)
    final = final.cache()
    final.count()
    return final


def reconstruction_fraction(seg: np.ndarray, img: np.ndarray,
                            tol: float = 0.5) -> float:
    """Reference runtests gate (runtests.py:324-376): fraction of
    valid pixels whose per-segment mean reconstructs within tol."""
    nseg = int(seg.max())
    sizes = np.bincount(seg.ravel(), minlength=nseg + 1)
    worst = 1.0
    for b in range(img.shape[0]):
        sums = np.bincount(seg.ravel(),
                           weights=img[b].ravel().astype(np.float64),
                           minlength=nseg + 1)
        means = np.where(sizes > 0, sums / np.maximum(sizes, 1), 0)
        rec = means[seg]
        valid = seg != 0
        worst = min(worst,
                    float((np.abs(rec[valid] - img[b][valid])
                           <= tol).mean()))
    return worst
