"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline, and an IVF
(inverted-file) variant as the scale path: k-means coarse quantizer
(reusing the engine's deterministic Lloyd kernel) assigns each vector
to a cell; queries probe only the ``nprobe`` nearest cells, an
equi-join on cell id instead of the all-pairs cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..kernels.kmeans import lloyd_kmeans


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a, b):
    """Cosine similarity Column between two array<float/double>
    columns — JVM-side HOF fold, shared by the top-k operators here
    and the embedding near-dup verify (batch + streaming)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(queries, corpus, k=5,
                     q_id="q_id", c_id="vec_id",
                     q_vec="embedding", c_vec="embedding"):
    """Exact cosine top-k: broadcast the (small) query side, cross
    join, JVM-side dot products (F.aggregate/F.zip_with), row_number
    window keeps k. Deterministic ties: (-cosine, corpus id)."""
    q = queries.select(F.col(q_id).alias("q_id"),
                       F.col(q_vec).alias("qv"))
    from .skew import spread_small_scan
    c = spread_small_scan(corpus.select(F.col(c_id).alias("c_id"),
                                        F.col(c_vec).alias("cv")))
    j = c.crossJoin(F.broadcast(q))
    cos = _dot("qv", "cv") / (_norm("qv") * _norm("cv"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("c_id").asc())
    return (j.withColumn("cosine", cos)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", "cosine", "rank"))


def train_ivf_centroids(corpus, n_cells=16, vec_col="embedding",
                        sample=4096, seed=42):
    """Coarse quantizer: deterministic Lloyd over a driver-collected
    sample (diagonal init — same kernel as the segmentation fit)."""
    pdf = (corpus.select(vec_col).limit(sample).toPandas())
    x = np.stack([np.asarray(v, dtype=np.float64)
                  for v in pdf[vec_col]])
    # diagonal init over the bounding box
    mn, mx = x.min(axis=0), x.max(axis=0)
    step = (mx - mn) / (n_cells + 1)
    init = mn[None, :] + np.arange(1, n_cells + 1)[:, None] * step
    return lloyd_kmeans(x, init)


def _assign_cells_udf(centroids: np.ndarray, nprobe: int = 1):
    cent = centroids.astype(np.float32)

    @pandas_udf("array<int>")
    def assign(vs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float32) for v in vs])
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        idx = np.argsort(d, axis=1)[:, :nprobe]
        return pd.Series([r.tolist() for r in idx])

    return assign


def ivf_topk(queries, corpus, centroids, k=5, nprobe=4,
             q_id="q_id", c_id="vec_id",
             q_vec="embedding", c_vec="embedding"):
    """IVF ANN: corpus vectors live in their nearest cell; each query
    probes its ``nprobe`` nearest cells. The cross join becomes an
    equi-join on cell — candidate count drops by ~n_cells/nprobe.
    Recall < 1 only when a true neighbour lives outside the probed
    cells (raise nprobe for recall, classic IVF trade-off)."""
    from .skew import spread_small_scan
    one = _assign_cells_udf(centroids, 1)
    probe = _assign_cells_udf(centroids, nprobe)
    c = spread_small_scan(corpus.select(F.col(c_id).alias("c_id"),
                                        F.col(c_vec).alias("cv"))) \
        .withColumn("cell", one(F.col("cv"))[0])
    q = queries.select(F.col(q_id).alias("q_id"),
                       F.col(q_vec).alias("qv")) \
        .withColumn("cell", F.explode(probe(F.col("qv"))))
    j = c.join(F.broadcast(q), "cell")
    cos = _dot("qv", "cv") / (_norm("qv") * _norm("cv"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("c_id").asc())
    return (j.withColumn("cosine", cos)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", "cosine", "rank"))
