"""Embedding similarity search: exact cosine top-k + LSH-bucketed ANN.

Training-data-pipeline operators over an ``array<float>`` embedding column:

- ``cosine_topk``: brute-force exact baseline.  The dot product stays
  JVM-side (``zip_with`` + ``aggregate``); candidates are a crossJoin of
  the (small) query set against the corpus — a broadcast nested loop,
  which IS the right plan for exact search.
- ``lsh_neardup`` / ``lsh_topk``: random-hyperplane (sign) LSH — SimHash
  for real vectors.  ``bands`` independent b-bit signatures; vectors
  sharing a band bucket become candidates (the MinHash-LSH band trick,
  same shape as the tender pipeline §2.5), then exact cosine re-ranks.
  At 10^9 vectors the bucket join shuffles on (band, signature) — no
  quadratic blowup; skewed buckets are capped like tender's redundancy
  cap.

Hyperplanes are seeded numpy normals materialized as a literal array
column, so signatures are computed JVM-side too; only determinism, no UDF.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k: (query_id, vec_id, cos) with rank <= k."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), "_v", F.col("_norm").alias("_cn")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"), F.col("_norm").alias("_qn")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def hyperplanes(dim: int, bands: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(0.0, 1.0, (bands * bits, dim))


def with_lsh_signatures(
    df: DataFrame, planes: np.ndarray, bands: int, bits: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add (band, signature) rows: signature = packed sign bits of the
    band's hyperplane projections, computed with JVM expressions."""
    v = _as_double(F.col(vec_col))
    out = df.withColumn("_v", v)
    band_rows = []
    for b in range(bands):
        sig = F.lit(0).cast("long")
        for i in range(bits):
            plane = planes[b * bits + i]
            proj = F.aggregate(
                F.zip_with(
                    F.col("_v"),
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            sig = sig + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        band_rows.append(F.struct(F.lit(b).alias("band"), sig.alias("sig")))
    return out.withColumn("_bands", F.array(*band_rows))


def lsh_neardup(
    df: DataFrame, dim: int, bands: int = 8, bits: int = 12, threshold: float = 0.9,
    vec_col: str = "embedding", id_col: str = "vec_id",
    max_bucket: int = 200, seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (cos > threshold) via banded sign-LSH +
    exact re-rank of bucket candidates.

    ``dim`` is required: inferring it with ``df.first()`` would trigger a
    driver-side job in the middle of the pipeline (a planning-time action
    on a 10^9-row table)."""
    planes = hyperplanes(dim, bands, bits, seed)
    sigs = with_lsh_signatures(df, planes, bands, bits, vec_col).select(
        F.col(id_col).alias("vec_id"), "_v",
        F.sqrt(_dot(F.col("_v"), F.col("_v"))).alias("_n"),
        F.explode("_bands").alias("bb"),
    ).select("vec_id", "_v", "_n", F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig"))

    buckets = (
        sigs.groupBy("band", "sig")
        .agg(F.collect_list(F.struct("vec_id", "_v", "_n")).alias("members"))
        .where(F.size("members").between(2, max_bucket))
    )
    pairs = (
        buckets.select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n"))
            ).alias("cos"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return pairs.where(F.col("cos") > threshold)


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame,
    vec_col: str = "_v", id_col: str = "vec_id", cent_id: str = "cell",
) -> DataFrame:
    """Coarse-quantizer assignment: each corpus vector -> its nearest
    centroid by cosine (ties by centroid id).  Centroids are broadcast —
    the corpus side never shuffles, so assignment is a map-only stage on
    a 10^10-row table; cos is rounded to 4 dp before the argmax so the
    engine and the SQL oracle rank identically."""
    c = centroids.select(
        F.col(cent_id), F.col(vec_col).alias("_cv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_cn"),
    )
    scored = (
        corpus.withColumn("_n", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))
        .join(F.broadcast(c))
        .select(
            id_col, vec_col, "_n", cent_id,
            F.round(
                _dot(F.col(vec_col), F.col("_cv")) / (F.col("_n") * F.col("_cn")), 4
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cos"), cent_id)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, vec_col, "_n", cent_id)
    )


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, n_cells: int, n_probe: int, k: int,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate nearest neighbours: (query_id, vec_id, cos).

    The inverted-file scale path for ANN (vs the brute-force cosine_topk
    baseline): corpus vectors land in `n_cells` coarse cells once
    (ivf_assign, map-only vs broadcast centroids); each query probes its
    `n_probe` nearest cells and exact-reranks ONLY those cells' members.
    Candidate generation is an equi-join on the cell id — a hash join on
    a low-cardinality key instead of the N x Q cross product, which is
    what survives at 10^9 corpus rows.  Deterministic by construction
    (seed centroids = first n_cells corpus vectors, 4-dp rounded ranks),
    so the SQL oracle (q_ann_ivf) mirrors it bit-for-bit."""
    emb = corpus.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    )
    cents = emb.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("_v")
    )
    assigned = ivf_assign(emb, cents, "_v", "vec_id", "cell")

    q = emb.join(queries.select(F.col(id_col).alias("vec_id")), "vec_id").select(
        F.col("vec_id").alias("qid"), F.col("_v").alias("_qv"),
        F.sqrt(_dot(F.col("_v"), F.col("_v"))).alias("_qn"),
    )
    cq = cents.select("cell", F.col("_v").alias("_cv"),
                      F.sqrt(_dot(F.col("_v"), F.col("_v"))).alias("_cn"))
    probe_scored = q.join(F.broadcast(cq)).select(
        "qid", "_qv", "_qn", "cell",
        F.round(_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 4).alias("_cos"),
    )
    wp = Window.partitionBy("qid").orderBy(F.desc("_cos"), "cell")
    probed = (
        probe_scored.withColumn("_rn", F.row_number().over(wp))
        .where(F.col("_rn") <= n_probe)
        .select("qid", "_qv", "_qn", "cell")
    )

    cand = probed.join(assigned, "cell").where(F.col("vec_id") != F.col("qid")).select(
        "qid", "vec_id",
        F.round(_dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_n")), 4).alias("cos"),
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), "vec_id")
    return (
        cand.withColumn("_rn", F.row_number().over(wk))
        .where(F.col("_rn") <= k)
        .select(F.col("qid").alias("query_id"), "vec_id", "cos")
    )
