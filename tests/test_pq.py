"""Product quantization: encode determinism, compression shape, and the
ADC recall contract vs exact L2 search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from texrex_spark.operators.pq import (
    adc_tables,
    encode_batch,
    pq_encode,
    pq_topk,
    train_codebooks,
)


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    vecs = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return ids, vecs


def test_train_deterministic(emb_np):
    _, vecs = emb_np
    a = train_codebooks(vecs[:32], m=8, k=16)
    b = train_codebooks(vecs[:32], m=8, k=16)
    assert np.array_equal(a, b)
    assert a.shape == (8, 16, 8)


def test_encode_shape_and_reconstruction_error(emb_np):
    _, vecs = emb_np
    books = train_codebooks(vecs, m=8, k=16)
    codes = encode_batch(vecs, books)
    assert codes.shape == (len(vecs), 8) and codes.dtype == np.uint8
    # quantized reconstruction must be closer than the zero vector
    recon = np.concatenate(
        [books[j][codes[:, j]] for j in range(8)], axis=1
    )
    err = ((vecs - recon) ** 2).sum(axis=1)
    base = (vecs ** 2).sum(axis=1)
    assert (err < base).all()


def test_adc_matches_exact_on_quantized_points(emb_np):
    """ADC distance of a vector to its OWN code equals the reconstruction
    error (the defining identity of asymmetric distance)."""
    _, vecs = emb_np
    books = train_codebooks(vecs, m=8, k=16)
    codes = encode_batch(vecs, books)
    q = vecs[0]
    tab = adc_tables(q, books)
    adc = tab[np.arange(8)[None, :], codes].sum(axis=1)
    recon = np.concatenate([books[j][codes[:, j]] for j in range(8)], axis=1)
    exact = ((q[None, :] - recon) ** 2).sum(axis=1)
    assert np.allclose(adc, exact)


def test_pq_topk_finds_planted_twins(spark):
    """On structured data (each query has a planted near-duplicate) ADC
    must surface the twin at the top.  (On iid random vectors distance
    concentration makes ANY sketch's top-10 arbitrary — that is the
    data's property, not the index's; the planted layout is what dedup /
    retrieval workloads actually look like.)"""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((25, 64))
    twins = base + 0.05 * rng.standard_normal((25, 64))
    vecs = np.concatenate([base, twins])      # ids: 0..24 bases, 100.. twins
    ids = np.concatenate([np.arange(25), 100 + np.arange(25)])
    books = train_codebooks(vecs, m=8, k=16)
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    enc = pq_encode(emb, books, vec_col="v")
    queries = [(int(ids[i]), vecs[i]) for i in range(5)]
    got = pq_topk(enc, queries, books, k=3)
    top = {}
    for r in got.collect():
        top.setdefault(r.query_id, []).append(r.vec_id)
    hits = sum(1 for qid, _ in queries if qid + 100 in top[qid])
    assert hits >= 4  # twin in ADC top-3 for >= 4 of 5 queries
