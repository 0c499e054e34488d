"""Spectral k-means kernels, pure numpy (no sklearn in this container).

Reimplements the reference's clustering step
(/root/reference/pyshepseg/shepseg.py:252-449) with a plain Lloyd
iteration. The deterministic path used by the reference's own test
suite (``fixedKMeansInit=True`` → diagonal initial centres, single
run; shepseg.py:308-310,364-397) is reproduced exactly up to Lloyd
convergence; the nondeterministic k-means++/n_init=5 default is
deliberately NOT reproduced (it is nondeterministic in the reference
too — SURVEY.md §7 hard-part 2).

In the Spark pipeline the fit runs once on the driver over a global
stride sample (tiling.py:196-210 semantics via DataFrame sample) and
the (k, nbands) centre matrix is broadcast to every tile kernel — the
cross-tile consistency device (tiling.py:13-16).
"""

from __future__ import annotations

import numpy as np


def diagonal_cluster_centres(x_sample, num_clusters):
    """Evenly spaced centres along the diagonal of the data bounding
    box, end points one step in from the corners (shepseg.py:364-397).

    Like the reference we keep the sample's dtype for the initial
    centres (integer truncation included), then Lloyd runs in float64.
    """
    band_min = x_sample.min(axis=0)
    band_max = x_sample.max(axis=0)
    step = (band_max - band_min) / (num_clusters + 1)
    idx = np.arange(1, num_clusters + 1)[:, None]
    return (band_min[None, :] + idx * step).astype(x_sample.dtype)


def lloyd_kmeans(x, init_centres, max_iter=300, tol=1e-6):
    """Plain Lloyd k-means from fixed initial centres (deterministic).

    Empty clusters keep their previous centre (sklearn instead
    relocates them; with the diagonal init over the fixture data no
    cluster goes empty, so results agree).
    """
    x = x.astype(np.float64)
    centres = init_centres.astype(np.float64).copy()
    k = centres.shape[0]
    prev_assign = None
    for _ in range(max_iter):
        # blocked distances to bound memory
        assign = np.empty(x.shape[0], dtype=np.int64)
        mindist = np.empty(x.shape[0], dtype=np.float64)
        step = max(1, 4_000_000 // k)
        for s in range(0, x.shape[0], step):
            blk = x[s:s + step]
            dd = ((blk[:, None, :] - centres[None, :, :]) ** 2).sum(axis=2)
            assign[s:s + step] = np.argmin(dd, axis=1)
            mindist[s:s + step] = dd[np.arange(len(blk)),
                                     assign[s:s + step]]
        # sklearn-style empty-cluster relocation: move each empty
        # cluster's centre onto a (distinct) farthest-from-centre
        # sample, so a collapsed init still finds all modes.
        counts0 = np.bincount(assign, minlength=k)
        empty = np.flatnonzero(counts0 == 0)
        if len(empty):
            far = np.argsort(-mindist, kind="stable")[:len(empty)]
            for e, f in zip(empty, far):
                centres[e] = x[f]
                assign[f] = e
        if prev_assign is not None and np.array_equal(assign, prev_assign):
            break
        prev_assign = assign
        sums = np.zeros_like(centres)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        for b in range(x.shape[1]):
            sums[:, b] = np.bincount(assign, weights=x[:, b], minlength=k)
        nonempty = counts > 0
        new_centres = centres.copy()
        new_centres[nonempty] = sums[nonempty] / counts[nonempty, None]
        shift = ((new_centres - centres) ** 2).sum()
        centres = new_centres
        if shift <= tol:
            break
    return centres


def fit_spectral_clusters(img, num_clusters, subsample_pcnt, img_null_val,
                          fixed_kmeans_init):
    """Fit k-means on a deterministic stride sample of the image
    (shepseg.py:252-314). Returns the (k, nbands) centre matrix.
    """
    nbands = img.shape[0]
    x_full = img.transpose(1, 2, 0).reshape(-1, nbands)
    if img_null_val is not None:
        x_full = x_full[(x_full != img_null_val).all(axis=1)]
    skip = int(round(100.0 / subsample_pcnt))
    x_sample = x_full[::skip]
    if not fixed_kmeans_init:
        # Deterministic stand-in for k-means++/n_init=5: seed RNG from
        # data so results are reproducible run-to-run.
        rng = np.random.default_rng(12345)
        idx = rng.choice(len(x_sample), size=min(num_clusters,
                                                 len(x_sample)),
                         replace=False)
        init = x_sample[np.sort(idx)]
    else:
        init = diagonal_cluster_centres(x_sample, num_clusters)
    return lloyd_kmeans(x_sample, init)


def fit_spectral_clusters_sample(x_sample, num_clusters,
                                 fixed_kmeans_init=True):
    """Driver-side fit over an already-collected global sample
    (tiling.py:196-224 fitSpectralClustersWholeFile analogue for the
    Spark pipeline). ``x_sample`` is (n, nbands), nulls already
    removed."""
    if fixed_kmeans_init:
        init = diagonal_cluster_centres(x_sample, num_clusters)
    else:
        rng = np.random.default_rng(12345)
        idx = rng.choice(len(x_sample),
                         size=min(num_clusters, len(x_sample)),
                         replace=False)
        init = x_sample[np.sort(idx)]
    return lloyd_kmeans(x_sample, init)


def apply_spectral_clusters(centres, img, img_null_val):
    """Nearest-centre label per pixel, +1 so cluster IDs start at 1;
    null pixels (any band == img_null_val) get 0 (shepseg.py:317-361).
    """
    nbands, nrows, ncols = img.shape
    x = img.transpose(1, 2, 0).reshape(-1, nbands).astype(np.float64)
    # blocked argmin to bound memory
    k = centres.shape[0]
    assign = np.empty(x.shape[0], dtype=np.int64)
    step = max(1, 8_000_000 // max(k, 1))
    c = centres.astype(np.float64)
    cc = (c ** 2).sum(axis=1)
    for s in range(0, x.shape[0], step):
        blk = x[s:s + step]
        # |x-c|^2 = |x|^2 - 2 x.c + |c|^2 ; |x|^2 constant per row
        d = blk @ c.T
        d *= -2.0
        d += cc[None, :]
        # add |x|^2 to keep distances exact (ties broken identically
        # to the naive form since the row constant shifts all entries)
        d += (blk ** 2).sum(axis=1)[:, None]
        assign[s:s + step] = np.argmin(d, axis=1)
    clusters = (assign + 1).reshape(nrows, ncols)
    if img_null_val is not None:
        clusters[(img == img_null_val).any(axis=0)] = 0
    return clusters.astype(np.uint32)


def auto_max_spectral_diff(centres, max_spectral_diff, dist_pcntile):
    """Resolve 'auto'/None maxSpectralDiff from pairwise centre
    distances (shepseg.py:400-449)."""
    if max_spectral_diff == 'auto' or max_spectral_diff is None:
        diff = centres[:, None, :] - centres[None, :, :]
        dist = np.sqrt((diff ** 2).sum(axis=2)).astype(np.float32)
        iu = np.triu_indices(centres.shape[0], k=1)
        pair = dist[iu]
        if max_spectral_diff == 'auto':
            return float(np.percentile(pair, dist_pcntile))
        return float(10.0 * pair.max())
    return float(max_spectral_diff)
