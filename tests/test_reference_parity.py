"""Run the ACTUAL reference implementation (pure-Python, numba/
sklearn stubbed to no-ops) against the engine's Shepherd kernel on
identical arrays with identical cluster centres: the north-star's
"bitwise tile assignments plus allclose segment rasters versus the
reference" check, in-process.

The container has no numba/sklearn/GDAL, so the reference's jitted
functions execute as plain Python — semantically identical, just
slow — which is why the images here are small.
"""

import sys
import types as pytypes
from types import SimpleNamespace

import numpy as np
import pytest


def _install_stubs():
    """Minimal numba + sklearn stand-ins so /root/reference/pyshepseg
    /shepseg.py imports and runs as pure Python."""
    if "numba" in sys.modules:
        return

    numba = pytypes.ModuleType("numba")

    def njit(*args, **kw):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    numba.njit = njit

    class _Ty:
        def __getitem__(self, item):
            return self

        def __call__(self, *a, **kw):
            return self

    tmod = pytypes.ModuleType("numba.core.types")
    for name in ["uint32", "uint8", "int32", "int64", "float32",
                 "float64", "boolean"]:
        setattr(tmod, name, _Ty())
    core = pytypes.ModuleType("numba.core")
    core.types = tmod

    typed = pytypes.ModuleType("numba.typed")

    class Dict(dict):
        @staticmethod
        def empty(key_type=None, value_type=None):
            return Dict()

    typed.Dict = Dict

    exp = pytypes.ModuleType("numba.experimental")

    def jitclass(spec=None):
        def deco(cls):
            cls.class_type = SimpleNamespace(instance_type=None)
            return cls
        if isinstance(spec, type):
            return deco(spec)
        return deco

    exp.jitclass = jitclass
    numba.core = core
    numba.typed = typed
    numba.experimental = exp
    sys.modules.update({
        "numba": numba, "numba.core": core,
        "numba.core.types": tmod, "numba.typed": typed,
        "numba.experimental": exp})

    sk = pytypes.ModuleType("sklearn")
    skc = pytypes.ModuleType("sklearn.cluster")

    class KMeans:  # pragma: no cover - the test always passes kmeansObj
        def __init__(self, **kw):
            raise RuntimeError("sklearn stub: fit path not used")

    skc.KMeans = KMeans
    sk.cluster = skc
    sys.modules.update({"sklearn": sk, "sklearn.cluster": skc})


@pytest.fixture(scope="module")
def refseg():
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    import pyshepseg.shepseg as refmod
    return refmod


@pytest.mark.parametrize("seed,four", [(0, False), (1, True)])
def test_kernel_bitwise_matches_reference(refseg, seed, four):
    """Identical centres in -> bitwise-identical segment raster out
    (clump scan order + MAX_CLUMP_SIZE cap, single-pixel fixpoint,
    small-segment elimination passes, relabel)."""
    from pyshepseg_spark.kernels.kmeans import fit_spectral_clusters
    from pyshepseg_spark.kernels.shepherd import do_shepherd_segmentation
    from pyshepseg_spark.sources.codec import decode_image
    from pyshepseg_spark.sources.imagegen import generate_image

    row, _ = generate_image(seed, size=96, k=8)
    img = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
    centres = fit_spectral_clusters(img, 8, 100.0, 65535, True)

    mine = do_shepherd_segmentation(
        img, num_clusters=8, centres=centres, min_segment_size=50,
        max_spectral_diff="auto", img_null_val=65535,
        four_connected=four)

    class _KM:
        """Fitted-KMeans stand-in: argmin of squared distance, same
        tie-break as sklearn's predict (first minimum)."""
        cluster_centers_ = centres

        def predict(self, x):
            d = ((x[:, None, :].astype(np.float64)
                  - centres[None, :, :]) ** 2).sum(axis=2)
            return np.argmin(d, axis=1)

    km = _KM()
    ref = refseg.doShepherdSegmentation(
        img, numClusters=8, kmeansObj=km, minSegmentSize=50,
        maxSpectralDiff="auto", imgNullVal=65535, fourConnected=four)

    a = np.asarray(mine.segimg, dtype=np.int64)
    b = np.asarray(ref.segimg, dtype=np.int64)
    assert a.shape == b.shape
    frac = (a == b).mean()
    assert frac == 1.0, f"segment rasters differ on {1-frac:.4%} px"
    assert float(mine.max_spectral_diff) == pytest.approx(
        float(ref.maxSpectralDiff))
