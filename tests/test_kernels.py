"""Kernel unit tests (no Spark): exactness against direct sequential
models of the reference algorithms."""

import numpy as np
import pytest

from pyshepseg_spark.kernels.kmeans import (apply_spectral_clusters,
                                            auto_max_spectral_diff,
                                            diagonal_cluster_centres,
                                            lloyd_kmeans)
from pyshepseg_spark.kernels.shepherd import (clump, clump_slow,
                                              do_shepherd_segmentation,
                                              eliminate_single_pixels,
                                              eliminate_small_segments,
                                              make_seg_size,
                                              relabel_segments)
from pyshepseg_spark.sources.codec import decode_image
from pyshepseg_spark.sources.imagegen import generate_image
from tests.conftest import reconstruction_fraction


def test_clump_matches_sequential_dfs():
    """Hybrid clump == the reference's sequential DFS (scan-order IDs,
    stack discipline, clump-size cap) on randomized inputs."""
    rng = np.random.default_rng(11)
    for _ in range(40):
        h, w = rng.integers(4, 48, 2)
        img = rng.integers(0, 4, (h, w)).astype(np.uint16)
        for fc in (True, False):
            for cap in (7, 10000):
                a, na = clump(img, 3, four_connected=fc,
                              max_clump_size=cap)
                b, nb = clump_slow(img, 3, four_connected=fc,
                                   max_clump_size=cap)
                assert na == nb
                assert np.array_equal(a, b)


def test_clump_null_handling():
    img = np.array([[1, 0, 1], [1, 0, 1], [1, 0, 1]], dtype=np.uint16)
    out, nxt = clump(img, 0, four_connected=True)
    assert out[0, 1] == 0 and out[1, 1] == 0
    assert out[0, 0] == 1 and out[0, 2] == 2
    assert nxt == 3


def test_make_seg_size_and_relabel():
    seg = np.array([[1, 1, 3], [3, 3, 5]], dtype=np.uint32)
    sizes = make_seg_size(seg)
    assert list(sizes) == [0, 2, 0, 3, 0, 1]
    relabel_segments(seg, sizes, 1)
    # IDs 2 and 4 unused -> 3 becomes 2, 5 becomes 3
    assert sorted(np.unique(seg).tolist()) == [1, 2, 3]
    assert seg[1, 2] == 3 and seg[0, 2] == 2


def test_eliminate_single_pixels_merges_into_nearest():
    # one odd pixel inside a flat field merges into it
    img = np.full((1, 5, 5), 100, dtype=np.uint16)
    img[0, 2, 2] = 105
    seg, nxt = clump(img[0], 65535, four_connected=True)
    sizes = make_seg_size(seg)
    eliminate_single_pixels(img, seg, sizes, 1, nxt - 1, True)
    assert seg.max() == 1
    assert (seg == 1).all()


def test_eliminate_small_segments_respects_max_diff():
    # small blob spectrally distant beyond maxSpectralDiff survives
    img = np.full((1, 8, 8), 100, dtype=np.uint16)
    img[0, 3:5, 3:5] = 5000
    seg, nxt = clump(img[0], 65535, four_connected=True)
    before = seg.max()
    s = seg.copy()
    n = eliminate_small_segments(s, img, int(before), 50, 10.0, True)
    assert n == 0  # veto: distance 4900 > 10
    s2 = seg.copy()
    n2 = eliminate_small_segments(s2, img, int(before), 50, 1e6, True)
    assert n2 == 1 and s2.max() == 1


def test_diagonal_centres_and_lloyd_deterministic():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 1000, (5000, 3)).astype(np.uint16)
    init = diagonal_cluster_centres(x, 8)
    assert init.shape == (8, 3)
    c1 = lloyd_kmeans(x, init)
    c2 = lloyd_kmeans(x, init)
    assert np.array_equal(c1, c2)


def test_apply_clusters_null_mask():
    img = np.zeros((2, 3, 3), dtype=np.uint16)
    img[:, 1, 1] = 65535
    centres = np.array([[0.0, 0.0], [500.0, 500.0]])
    lab = apply_spectral_clusters(centres, img, 65535)
    assert lab[1, 1] == 0
    assert lab[0, 0] == 1  # cluster index 0 -> id 1


def test_auto_max_spectral_diff_modes():
    centres = np.array([[0.0], [3.0], [6.0]])
    # pairwise dists: 3, 6, 3 -> median 3
    assert auto_max_spectral_diff(centres, "auto", 50) == 3.0
    assert auto_max_spectral_diff(centres, None, 50) == 60.0
    assert auto_max_spectral_diff(centres, 7.5, 50) == 7.5


@pytest.mark.parametrize("i", [0, 1])
def test_reconstruction_property(i):
    """The reference test suite's primary gate: per-segment means
    reconstruct the image within 0.5 on 100% of valid pixels
    (runtests.py:110-113)."""
    row, truth = generate_image(i, size=256)
    img = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
    k = int(row["caption"].split(": ")[1].split()[0])
    res = do_shepherd_segmentation(
        img, num_clusters=k, min_segment_size=50,
        max_spectral_diff="auto", img_null_val=65535,
        four_connected=False, fixed_kmeans_init=True)
    assert reconstruction_fraction(res.segimg, img) == 1.0
    # null margin preserved exactly
    assert ((res.segimg == 0) == (truth == 0)).all()
    # contiguous IDs 1..max
    sizes = make_seg_size(res.segimg)
    assert (sizes[1:] > 0).all()


def test_kmeanspp_n_init_inertia_class():
    """The reference-DEFAULT clustering option (k-means++ x n_init=5,
    keep best inertia — shepseg.py:301-311). Nondeterministic in the
    reference, seeded here: parity target is 'same inertia class',
    not bitwise. On well-separated blobs the best-of-5 k-means++ fit
    must (a) be reproducible for a fixed seed, (b) reach an inertia
    no worse than the deterministic diagonal-init path, (c) recover
    every blob."""
    import numpy as np
    from pyshepseg_spark.kernels.kmeans import (
        _inertia, fit_kmeans_plusplus, fit_spectral_clusters_sample)

    rng = np.random.default_rng(7)
    blobs = np.array([[100.0, 100.0], [1000.0, 200.0],
                      [500.0, 900.0], [50.0, 700.0]])
    x = np.concatenate([
        b + rng.normal(0, 5.0, size=(500, 2)) for b in blobs])
    pp = fit_kmeans_plusplus(x, 4, n_init=5, seed=0)
    pp2 = fit_spectral_clusters_sample(x, 4, fixed_kmeans_init=False,
                                       n_init=5, seed=0)
    assert np.array_equal(pp, pp2)          # reproducible
    fixed = fit_spectral_clusters_sample(x, 4, fixed_kmeans_init=True)
    assert _inertia(x, pp) <= _inertia(x, fixed) * 1.0001
    # every blob centre recovered within a few noise sigmas
    for b in blobs:
        assert np.min(((pp - b) ** 2).sum(axis=1)) < (3 * 5.0) ** 2
