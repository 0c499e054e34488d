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


def train_pq_codebooks(corpus, m=8, nbits=4, vec_col="embedding",
                       sample=4096, seed=42):
    """Product-quantizer codebooks (Jégou et al. 2011): the vector
    space splits into ``m`` subspaces; each gets its own 2**nbits
    codewords via the engine's deterministic Lloyd kernel over a
    bounded driver sample (the same sample-fit protocol as
    train_ivf_centroids and the reference's own k-means prepare
    step). Returns ndarray (m, 2**nbits, d/m).

    At 100 TB this is the memory story for ANN: a 64-dim float
    vector (256 B) compresses to m bytes of codes (8 B at m=8) —
    the inverted lists fit in RAM where raw vectors cannot."""
    pdf = corpus.select(vec_col).limit(sample).toPandas()
    x = np.stack([np.asarray(v, dtype=np.float64)
                  for v in pdf[vec_col]])
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    ncodes, dsub = 1 << nbits, d // m
    books = np.empty((m, ncodes, dsub))
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        mn, mx = xs.min(axis=0), xs.max(axis=0)
        step = (mx - mn) / (ncodes + 1)
        init = mn[None, :] + np.arange(1, ncodes + 1)[:, None] * step
        books[j] = lloyd_kmeans(xs, init)
    return books


def pq_encode(corpus, codebooks, vec_col="embedding",
              code_col="pq_code", centroids=None):
    """Encode vectors to their per-subspace nearest-codeword indices
    (array<int>, length m): one vectorized argmin per Arrow batch.
    The stored form for PQ search — at scale this column is written
    next to (or instead of) the raw vector. Pass the IVF
    ``centroids`` to also store each vector's coarse ``cell``: with
    (cell, pq_code) persisted at write time the ANN scan never
    touches a raw vector again."""
    books = codebooks.astype(np.float32)
    m, _, dsub = books.shape

    @pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(v, dtype=np.float32) for v in vs])
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            xs = x[:, j * dsub:(j + 1) * dsub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2) \
                .sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series([r.tolist() for r in codes])

    out = corpus.withColumn(code_col, enc(F.col(vec_col)))
    if centroids is not None:
        one = _assign_cells_udf(centroids, 1)
        out = out.withColumn("cell", one(F.col(vec_col))[0])
    return out


def ivf_pq_topk(queries, corpus, centroids, codebooks, k=5,
                nprobe=4, refine_factor=0,
                q_id="q_id", c_id="vec_id",
                q_vec="embedding", c_vec="embedding",
                code_col="pq_code"):
    """IVF-PQ ANN — the full 100 TB shape: IVF cell equi-join prunes
    the candidate set (as ivf_topk), then candidates are scored from
    their PQ codes alone by asymmetric distance computation (ADC):
    per query a (m x 2**nbits) lookup table of subspace dot products
    is built ONCE driver-side, and each candidate's approximate
    cosine is a table gather-sum over its m byte codes — no raw
    vector is touched in the scan, so the scan reads bytes, not
    floats. cos(q, x^) is exact in the RECONSTRUCTION x^: numerator
    = sum_j <q_j, c_{j,code_j}>, |x^| = sqrt(sum_j |c_{j,code_j}|^2)
    (a query-independent norm table).

    ``refine_factor`` > 1 re-ranks the top refine_factor*k PQ
    candidates with the EXACT cosine over the raw vectors (one
    semi-join back to the corpus, cost scales with k, not corpus) —
    with exhaustive probing (nprobe = n_cells) and a refine window
    covering the corpus this returns exactly brute_force_topk
    (tested). If ``code_col`` / ``cell`` already exist on the corpus
    (pq_encode with centroids — the production write path) the
    stored columns are used and the scan is vector-free; otherwise
    both are derived on the fly from the raw vectors."""
    from .skew import spread_small_scan
    books = codebooks.astype(np.float32)
    m, ncodes, dsub = books.shape
    # query-independent reconstruction-norm table
    norm_tab = (books ** 2).sum(axis=2)          # (m, ncodes)

    qpdf = queries.select(F.col(q_id).alias("q_id"),
                          F.col(q_vec).alias("qv")).toPandas()
    qmat = np.stack([np.asarray(v, dtype=np.float32)
                     for v in qpdf["qv"]])
    qnorm = np.linalg.norm(qmat, axis=1)
    # ADC lookup tables for ALL queries: (nq, m, ncodes)
    luts = np.einsum("qjd,jcd->qjc",
                     qmat.reshape(len(qmat), m, dsub), books)
    qidx = {int(i): p for p, i in enumerate(qpdf["q_id"])}

    c = corpus
    if code_col not in c.columns or "cell" not in c.columns:
        c = pq_encode(c, codebooks, vec_col=c_vec,
                      code_col=code_col, centroids=centroids)
    c = spread_small_scan(c.select(F.col(c_id).alias("c_id"),
                                   F.col(code_col).alias("code"),
                                   "cell"))

    probe = _assign_cells_udf(centroids, nprobe)
    q = (queries.select(F.col(q_id).alias("q_id"),
                        F.col(q_vec).alias("qv"))
         .withColumn("cell", F.explode(probe(F.col("qv")))))

    @pandas_udf("double")
    def adc(codes: pd.Series, qids: pd.Series) -> pd.Series:
        cm = np.stack([np.asarray(v, dtype=np.int64) for v in codes])
        qi = np.asarray([qidx[int(v)] for v in qids])
        gather = luts[qi[:, None], np.arange(m)[None, :], cm]
        num = gather.sum(axis=1)
        rnorm = np.sqrt(norm_tab[np.arange(m)[None, :], cm]
                        .sum(axis=1))
        denom = rnorm * qnorm[qi]
        return pd.Series(np.where(denom > 0, num / denom, 0.0))

    j = c.join(F.broadcast(q.select("q_id", "cell")), "cell")
    scored = j.withColumn("pq_cosine", adc(F.col("code"),
                                           F.col("q_id")))
    w = Window.partitionBy("q_id").orderBy(F.col("pq_cosine").desc(),
                                           F.col("c_id").asc())
    kk = k * refine_factor if refine_factor and refine_factor > 1 \
        else k
    top = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= kk))
    if not refine_factor or refine_factor <= 1:
        return top.select("q_id", "c_id",
                          F.col("pq_cosine").alias("cosine"), "rank")
    # exact re-rank of the short PQ candidate list
    cand = top.select("q_id", "c_id")
    vecs = corpus.select(F.col(c_id).alias("c_id"),
                         F.col(c_vec).alias("cv"))
    qv = queries.select(F.col(q_id).alias("q_id"),
                        F.col(q_vec).alias("qv"))
    # cand is k*refine_factor rows per query — broadcast it against
    # the big vector table so the re-rank never shuffles the corpus
    rej = (vecs.join(F.broadcast(cand), "c_id")
           .join(F.broadcast(qv), "q_id")
           .withColumn("cosine", _dot("qv", "cv")
                       / (_norm("qv") * _norm("cv"))))
    w2 = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                            F.col("c_id").asc())
    return (rej.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", "cosine", "rank"))


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
