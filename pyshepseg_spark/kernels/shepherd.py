"""Shepherd segmentation kernels, pure numpy.

From-scratch reimplementation of the per-tile segmentation algorithm of
the reference (Shepherd et al 2019), with the same deterministic
semantics but vectorized numpy instead of numba:

- ``clump``           ~ /root/reference/pyshepseg/shepseg.py:452-541
- ``make_seg_size``   ~ shepseg.py:544-569
- ``eliminate_single_pixels`` ~ shepseg.py:572-736
- ``relabel_segments``~ shepseg.py:739-777
- ``build_segment_spectra`` ~ shepseg.py:780-813
- ``eliminate_small_segments`` ~ shepseg.py:918-1123
- ``do_shepherd_segmentation`` ~ shepseg.py:130-249

These run *inside* Spark Arrow UDFs (applyInPandas/mapInPandas), one
tile per group — embarrassingly parallel across tiles/images. No Spark
imports here; this module is plain numpy so it is cheap to ship to
executors and unit-test locally.

Determinism notes (SURVEY.md §7 "hard parts"):
- clump IDs are assigned in row-major scan order of each clump's seed
  pixel, with the DFS stack discipline and the MAX_CLUMP_SIZE cap
  replicated exactly (the cap changes results, not just speed).
- elimination passes are two-phase (decide-all-then-apply) exactly as
  in the reference, so vectorized decisions match the sequential code.
- spectral sums use float32 accumulation like the reference
  (shepseg.py:805).

Known deliberate deviation: neighbour spectral distances are computed
in int64 (true squared Euclidean distance). The reference subtracts
unsigned ints inside numba, which wraps modulo 2^16 for uint16 imagery
(shepseg.py:730) — a latent overflow we do not reproduce. On the
flat-colour Voronoi fixture both give identical results.
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    MAX_CLUMP_SIZE,
    MAXPASSES,
    MINSEGID,
    SEGNULLVAL,
    SegIdType,
)


# ---------------------------------------------------------------------------
# clump: connected components with scan-order IDs and a size cap
# ---------------------------------------------------------------------------

def clump_slow(img, ignore_val, four_connected=True, clump_id=MINSEGID,
               max_clump_size=MAX_CLUMP_SIZE):
    """Direct sequential model of the reference DFS clump
    (shepseg.py:452-541). Used as the oracle in unit tests and as the
    exact fragmenter for oversized components in :func:`clump`.

    Scan row-major; on the first unvisited non-null pixel start a DFS
    (LIFO stack). Neighbour visit order is x-outer/y-inner over the
    clamped 3x3 window. The clump stops growing once ``max_clump_size``
    neighbours have been added (the seed does not count).
    """
    ysize, xsize = img.shape
    # 1-px ignore_val border removes all bounds checks from the DFS:
    # out-of-image neighbours hit border cells that can never match
    # val — identical outcome to the reference's clamped window, and
    # the neighbour VISIT ORDER (x-outer / y-inner over the window)
    # is preserved by the fixed delta sequence below. Flat Python
    # lists beat numpy scalar indexing ~10x here (no numba).
    w = xsize + 2
    ig = int(ignore_val)
    padded = np.full((ysize + 2, xsize + 2), ig, dtype=np.int64)
    padded[1:-1, 1:-1] = img
    flat = padded.ravel().tolist()
    out = [0] * ((ysize + 2) * w)
    if four_connected:
        # cx=x-1(cy=y), cx=x(cy=y-1, y+1), cx=x+1(cy=y)
        deltas = (-1, -w, w, 1)
    else:
        # cx x-1..x+1 outer, cy y-1..y+1 inner (self skipped)
        deltas = (-1 - w, -1, -1 + w, -w, w, 1 - w, 1, 1 + w)
    for y in range(1, ysize + 1):
        base = y * w
        for x in range(1, xsize + 1):
            p = base + x
            if flat[p] != ig and out[p] == 0:
                val = flat[p]
                clump_size = 0
                stack = [p]
                out[p] = clump_id
                while stack and clump_size < max_clump_size:
                    sp = stack.pop()
                    for d in deltas:
                        q = sp + d
                        # val != ignore_val, so == val implies valid
                        if out[q] == 0 and flat[q] == val:
                            out[q] = clump_id
                            clump_size += 1
                            stack.append(q)
                clump_id += 1
    output = np.asarray(out, dtype=SegIdType).reshape(
        ysize + 2, w)[1:-1, 1:-1]
    output = np.ascontiguousarray(output)
    return output, clump_id


def _runs_of_rows(img, ignore_val):
    """Row-wise run-length encoding of equal-valued pixels.

    Returns (row, start, end, val) arrays; runs of ``ignore_val`` are
    dropped. Fully vectorized.
    """
    ysize, xsize = img.shape
    flat = img.ravel()
    # boundaries where value changes or a new row begins
    change = np.empty(flat.shape[0], dtype=bool)
    change[0] = True
    change[1:] = flat[1:] != flat[:-1]
    row_starts = np.arange(0, flat.shape[0], xsize)
    change[row_starts] = True
    starts = np.flatnonzero(change)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = flat.shape[0]
    vals = flat[starts]
    keep = vals != ignore_val
    starts, ends, vals = starts[keep], ends[keep], vals[keep]
    rows = starts // xsize
    return rows, starts - rows * xsize, ends - rows * xsize, vals


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self, n):
        self.parent = list(range(n))

    def find(self, a):
        p = self.parent
        root = a
        while p[root] != root:
            root = p[root]
        while p[a] != root:
            p[a], a = root, p[a]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def _components_from_runs(img, ignore_val, four_connected):
    """Union-find connected components over row runs (no size cap).

    Returns (labels, comp_sizes, comp_first) where ``labels`` is an
    int32 image of component indices (-1 for null), ``comp_sizes`` the
    pixel count per component, and ``comp_first`` the row-major scan
    position of each component's first pixel.
    """
    ysize, xsize = img.shape
    rows, starts, ends, vals = _runs_of_rows(img, ignore_val)
    n = len(rows)
    uf = _UnionFind(n)
    # link runs in consecutive rows whose column spans touch
    reach = 0 if four_connected else 1
    row_bounds = np.searchsorted(rows, np.arange(ysize + 1))
    for r in range(1, ysize):
        a0, a1 = row_bounds[r], row_bounds[r + 1]        # runs in row r
        b0, b1 = row_bounds[r - 1], row_bounds[r]        # runs in row r-1
        if a0 == a1 or b0 == b1:
            continue
        bi = b0
        for ai in range(a0, a1):
            s, e, v = starts[ai], ends[ai], vals[ai]
            while bi < b1 and ends[bi] + reach <= s:
                bi += 1
            bj = bi
            while bj < b1 and starts[bj] < e + reach:
                if vals[bj] == v:
                    uf.union(ai, bj)
                bj += 1
    roots = np.fromiter((uf.find(i) for i in range(n)), dtype=np.int64,
                        count=n)
    uniq, comp_of_run = np.unique(roots, return_inverse=True)
    ncomp = len(uniq)
    lengths = ends - starts
    comp_sizes = np.zeros(ncomp, dtype=np.int64)
    np.add.at(comp_sizes, comp_of_run, lengths)
    scan_pos = rows.astype(np.int64) * xsize + starts
    comp_first = np.full(ncomp, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(comp_first, comp_of_run, scan_pos)

    labels = np.full(ysize * xsize, -1, dtype=np.int64)
    # paint runs with component index
    for i in range(n):
        base = rows[i] * xsize
        labels[base + starts[i]: base + ends[i]] = comp_of_run[i]
    return labels.reshape(ysize, xsize), comp_sizes, comp_first


def clump(img, ignore_val, four_connected=True, clump_id=MINSEGID,
          max_clump_size=MAX_CLUMP_SIZE):
    """Connected-component clumping with scan-order IDs and the
    reference's clump-size cap (shepseg.py:452-541 semantics).

    Fast path: run-based union-find components; any component whose
    size exceeds ``max_clump_size`` is re-traversed with the exact DFS
    (clump_slow) so its capped fragmentation matches the reference
    bit-for-bit. Fragment IDs are then assigned by row-major scan order
    of each fragment's seed pixel, which is exactly the order the
    reference's single sequential scan would discover them.

    Returns (clumpimg uint32, next_clump_id).
    """
    ysize, xsize = img.shape
    labels, comp_sizes, comp_first = _components_from_runs(
        img, ignore_val, four_connected)

    big = np.flatnonzero(comp_sizes > max_clump_size)
    output = np.zeros((ysize, xsize), dtype=SegIdType)

    if len(big) == 0:
        # every component is a single clump; order by first pixel
        order = np.argsort(comp_first, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        valid = labels >= 0
        output[valid] = (rank[labels[valid]] + clump_id).astype(SegIdType)
        return output, clump_id + len(comp_sizes)

    # general path: fragment oversized components with the exact DFS,
    # cropped to their bounding boxes. Fragment/component IDs are then
    # assigned by scan position of each seed — exactly the discovery
    # order of the reference's single sequential scan.
    seeds = []  # (scan_pos, comp_idx, frag_info or None)
    big_set = set(int(c) for c in big)
    small_mask = comp_sizes <= max_clump_size
    for c in np.flatnonzero(small_mask):
        seeds.append((int(comp_first[c]), int(c), None))
    frag_paint = []  # (scan_pos, y0, x0, fragimg, fid)
    for c in big:
        comp_rows, comp_cols = np.nonzero(labels == c)
        y0, y1 = comp_rows.min(), comp_rows.max() + 1
        x0, x1 = comp_cols.min(), comp_cols.max() + 1
        sub = np.where(labels[y0:y1, x0:x1] == c,
                       img[y0:y1, x0:x1], ignore_val)
        frag, nfrag = clump_slow(sub, ignore_val, four_connected,
                                 clump_id=1,
                                 max_clump_size=max_clump_size)
        flat = frag.ravel()
        # first-occurrence scan position of each fragment, in one pass
        first_local = np.full(nfrag, -1, dtype=np.int64)
        seen = np.zeros(nfrag, dtype=bool)
        nz = np.flatnonzero(flat)
        fids = flat[nz]
        # np.unique keeps first occurrence with return_index
        uniq, first_idx = np.unique(fids, return_index=True)
        first_local[uniq] = nz[first_idx]
        subw = x1 - x0
        for fid in range(1, nfrag):
            ly, lx = divmod(int(first_local[fid]), subw)
            pos = (y0 + ly) * xsize + (x0 + lx)
            seeds.append((pos, -1, len(frag_paint)))
            frag_paint.append((y0, x0, frag, fid))
    seeds.sort(key=lambda t: t[0])
    # vectorized paint for whole (small) components
    comp_id = np.zeros(len(comp_sizes), dtype=np.int64)
    for pos, c, fref in seeds:
        if c >= 0:
            comp_id[c] = clump_id
        else:
            y0, x0, frag, fid = frag_paint[fref]
            view = output[y0:y0 + frag.shape[0], x0:x0 + frag.shape[1]]
            view[frag == fid] = clump_id
        clump_id += 1
    small_pix = (labels >= 0) & small_mask[np.maximum(labels, 0)]
    output[small_pix] = comp_id[labels[small_pix]].astype(SegIdType)
    return output, clump_id


# ---------------------------------------------------------------------------
# histogram / relabel / spectra
# ---------------------------------------------------------------------------

def make_seg_size(seg):
    """Pixel count per segment ID (shepseg.py:544-569).

    Index 0 is the null segment.
    """
    return np.bincount(seg.ravel().astype(np.int64),
                       minlength=int(seg.max()) + 1)


def relabel_segments(seg, seg_size, min_seg_id=MINSEGID):
    """Contiguous relabel: every unused ID below shifts later IDs down
    (shepseg.py:739-777). Modifies ``seg`` in place.
    """
    n = len(seg_size)
    unused = np.zeros(n, dtype=np.int64)
    if n > min_seg_id + 1:
        unused[min_seg_id + 1:] = np.cumsum(
            seg_size[min_seg_id:-1] == 0)
    np.copyto(seg, (seg.astype(np.int64) - unused[seg]).astype(seg.dtype))


def build_segment_spectra(seg, img, max_seg_id):
    """Per-segment per-band pixel sums, float32 accumulation
    (shepseg.py:780-813)."""
    nbands = img.shape[0]
    spect_sum = np.zeros((max_seg_id + 1, nbands), dtype=np.float32)
    flat_seg = seg.ravel().astype(np.int64)
    for b in range(nbands):
        np.add.at(spect_sum[:, b], flat_seg,
                  img[b].ravel().astype(np.float32))
    return spect_sum


# ---------------------------------------------------------------------------
# single-pixel elimination
# ---------------------------------------------------------------------------

# neighbour offsets in the reference's visit order: rows outer, cols
# inner (shepseg.py:721-722); centre included but always rejected by the
# seg-size-> 1 test.
_NBR8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
         (1, -1), (1, 0), (1, 1)]


def _nearest_neighbour_choices(img, seg, seg_size, rows, cols,
                               four_connected):
    """Vectorized findNearestNeighbourPixel (shepseg.py:677-736) for a
    batch of target pixels. Returns the chosen new segment ID per
    pixel, or SEGNULLVAL where no neighbour qualifies.

    Tie-break: first neighbour in visit order achieving the strict
    minimum distance — np.argmin returns the first minimum, matching
    the sequential strict-< update.
    """
    nbands, nrows, ncols = img.shape
    n = len(rows)
    imgl = img.astype(np.int64)
    dists = np.empty((n, len(_NBR8)), dtype=np.int64)
    nbrseg = np.zeros((n, len(_NBR8)), dtype=np.int64)
    valid = np.zeros((n, len(_NBR8)), dtype=bool)
    for k, (di, dj) in enumerate(_NBR8):
        if four_connected and di != 0 and dj != 0:
            continue
        ii = rows + di
        jj = cols + dj
        ok = (ii >= 0) & (ii < nrows) & (jj >= 0) & (jj < ncols)
        iic = np.clip(ii, 0, nrows - 1)
        jjc = np.clip(jj, 0, ncols - 1)
        s = seg[iic, jjc].astype(np.int64)
        ok &= seg_size[s] > 1
        d = ((imgl[:, rows, cols] - imgl[:, iic, jjc]) ** 2).sum(axis=0)
        dists[:, k] = d
        nbrseg[:, k] = s
        valid[:, k] = ok
    big = np.iinfo(np.int64).max
    masked = np.where(valid, dists, big)
    best = np.argmin(masked, axis=1)
    found = valid[np.arange(n), best]
    chosen = np.where(found, nbrseg[np.arange(n), best], SEGNULLVAL)
    return chosen


def eliminate_single_pixels(img, seg, seg_size, min_seg_id, max_seg_id,
                            four_connected):
    """Iteratively merge 1-pixel segments into the spectrally nearest
    neighbouring pixel whose segment has >1 pixels
    (shepseg.py:572-674). Two-phase per iteration (decide all, then
    apply), matching the reference exactly; iterate to fixpoint, then
    contiguous relabel. Modifies seg/seg_size in place.
    """
    total = 0
    while True:
        singles = seg_size[seg] == 1
        if not singles.any():
            break
        rows, cols = np.nonzero(singles)
        chosen = _nearest_neighbour_choices(img, seg, seg_size, rows, cols,
                                            four_connected)
        merge = chosen != SEGNULLVAL
        if not merge.any():
            break
        r, c, new = rows[merge], cols[merge], chosen[merge]
        old = seg[r, c].astype(np.int64)
        seg[r, c] = new.astype(seg.dtype)
        seg_size[old] = 0
        np.add.at(seg_size, new, 1)
        total += int(merge.sum())
    relabel_segments(seg, seg_size, min_seg_id)
    return total


# ---------------------------------------------------------------------------
# small-segment elimination
# ---------------------------------------------------------------------------

def _make_segment_locations(seg, seg_size):
    """Per-segment pixel coordinates in row-major insertion order
    (shepseg.py:880-915). dict segid -> (n,2) int32 array."""
    order = np.argsort(seg.ravel(), kind="stable")
    nrows, ncols = seg.shape
    rr = (order // ncols).astype(np.int32)
    cc = (order % ncols).astype(np.int32)
    sorted_ids = seg.ravel()[order]
    bounds = np.searchsorted(sorted_ids, np.arange(len(seg_size) + 1))
    loc = {}
    for sid in range(MINSEGID, len(seg_size)):
        a, b = bounds[sid], bounds[sid + 1]
        if b > a:
            loc[sid] = np.stack([rr[a:b], cc[a:b]], axis=1)
    return loc


def _find_merge_segment(seg_id, rowcols, seg, seg_size, spect_sum,
                        max_spectral_diff_sqr, four_connected):
    """Vectorized findMergeSegment (shepseg.py:1003-1063) for one
    segment: best strictly-larger neighbouring segment by mean-spectra
    squared distance (float32, like the reference), tie-break first in
    (pixel insertion order x window order)."""
    nrows, ncols = seg.shape
    npix = len(rowcols)
    spect = spect_sum[seg_id] / np.float32(npix)
    i = rowcols[:, 0].astype(np.int64)
    j = rowcols[:, 1].astype(np.int64)
    cand_seg = np.zeros((npix, len(_NBR8)), dtype=np.int64)
    valid = np.zeros((npix, len(_NBR8)), dtype=bool)
    for k, (di, dj) in enumerate(_NBR8):
        if four_connected and di != 0 and dj != 0:
            continue
        ii = i + di
        jj = j + dj
        ok = (ii >= 0) & (ii < nrows) & (jj >= 0) & (jj < ncols)
        iic = np.clip(ii, 0, nrows - 1)
        jjc = np.clip(jj, 0, ncols - 1)
        s = seg[iic, jjc].astype(np.int64)
        ok &= (s != seg_id) & (s != SEGNULLVAL)
        ok &= seg_size[s] > seg_size[seg_id]
        cand_seg[:, k] = s
        valid[:, k] = ok
    if not valid.any():
        return SEGNULLVAL
    flat_seg = cand_seg.ravel()
    flat_ok = valid.ravel()
    idx = np.flatnonzero(flat_ok)
    segs = flat_seg[idx]
    nbr_spect = spect_sum[segs] / seg_size[segs].astype(np.float32)[:, None]
    d = ((spect[None, :] - nbr_spect) ** 2).sum(axis=1, dtype=np.float32)
    k = int(np.argmin(d))
    if d[k] > max_spectral_diff_sqr:
        return SEGNULLVAL
    return int(segs[k])


def eliminate_small_segments(seg, img, max_seg_id, min_seg_size,
                             max_spectral_diff, four_connected,
                             min_seg_id=MINSEGID):
    """Eliminate segments smaller than min_seg_size, smallest first
    (shepseg.py:918-1000). For each target size, run passes (<=
    MAXPASSES) of two-phase decide/apply merges into the spectrally
    nearest strictly-larger neighbour, vetoed beyond
    max_spectral_diff. Ends with a contiguous relabel.
    Modifies seg in place; returns number eliminated.
    """
    spect_sum = build_segment_spectra(seg, img, max_seg_id)
    seg_size = make_seg_size(seg)
    if len(seg_size) < max_seg_id + 1:
        seg_size = np.pad(seg_size, (0, max_seg_id + 1 - len(seg_size)))
    seg_loc = _make_segment_locations(seg, seg_size)
    max_diff_sqr = np.float32(max_spectral_diff) ** 2

    num_elim = 0
    for target in range(1, min_seg_size):
        count = int((seg_size == target).sum())
        prev = -1
        passes = 0
        while count != prev and passes < MAXPASSES:
            prev = count
            todo = np.flatnonzero(seg_size == target)
            todo = todo[todo >= min_seg_id]
            merges = []
            for sid in todo:
                sid = int(sid)
                tgt = _find_merge_segment(
                    sid, seg_loc[sid], seg, seg_size, spect_sum,
                    max_diff_sqr, four_connected)
                if tgt != SEGNULLVAL:
                    merges.append((sid, tgt))
            # apply phase (doMerge, shepseg.py:1066-1123): targets are
            # strictly larger so they are never merged away this pass.
            for sid, tgt in merges:
                rc = seg_loc.pop(sid)
                seg[rc[:, 0], rc[:, 1]] = tgt
                seg_loc[tgt] = np.concatenate([seg_loc[tgt], rc])
                spect_sum[tgt] += spect_sum[sid]
                spect_sum[sid] = 0
                seg_size[tgt] += seg_size[sid]
                seg_size[sid] = 0
                num_elim += 1
            count = int((seg_size == target).sum())
            passes += 1

    relabel_segments(seg, seg_size, min_seg_id)
    return num_elim


# ---------------------------------------------------------------------------
# full per-tile pipeline
# ---------------------------------------------------------------------------

class SegmentationResult:
    """Mirror of shepseg.py:104-127."""

    def __init__(self):
        self.segimg = None
        self.centres = None
        self.max_spectral_diff = None
        self.single_pixels_eliminated = None
        self.small_segments_eliminated = None


def do_shepherd_segmentation(img, num_clusters=60,
                             cluster_subsample_pcnt=1,
                             min_segment_size=50,
                             max_spectral_diff='auto',
                             img_null_val=None,
                             four_connected=True,
                             fixed_kmeans_init=False,
                             centres=None,
                             spect_dist_pcntile=50,
                             max_clump_size=MAX_CLUMP_SIZE):
    """Whole-array Shepherd segmentation (shepseg.py:130-249).

    ``centres`` (k, nbands float64) plays the role of the reference's
    pre-fitted kmeansObj — in the Spark pipeline the driver fits once
    on a global sample and broadcasts it for cross-tile consistency
    (tiling.py:13-16).
    """
    from .kmeans import (apply_spectral_clusters, auto_max_spectral_diff,
                         fit_spectral_clusters)

    if centres is None:
        centres = fit_spectral_clusters(
            img, num_clusters, cluster_subsample_pcnt, img_null_val,
            fixed_kmeans_init)
    clusters = apply_spectral_clusters(centres, img, img_null_val)

    seg, next_id = clump(clusters, SEGNULLVAL,
                         four_connected=four_connected,
                         clump_id=MINSEGID,
                         max_clump_size=max_clump_size)
    max_seg_id = next_id - 1

    seg_size = make_seg_size(seg)
    old_max = max_seg_id
    eliminate_single_pixels(img, seg, seg_size, MINSEGID, max_seg_id,
                            four_connected)
    max_seg_id = int(seg.max())
    n_single = old_max - max_seg_id

    max_spectral_diff = auto_max_spectral_diff(
        centres, max_spectral_diff, spect_dist_pcntile)

    n_small = eliminate_small_segments(
        seg, img, max_seg_id, min_segment_size, max_spectral_diff,
        four_connected, MINSEGID)

    res = SegmentationResult()
    res.segimg = seg
    res.centres = centres
    res.max_spectral_diff = max_spectral_diff
    res.single_pixels_eliminated = n_single
    res.small_segments_eliminated = n_small
    return res
