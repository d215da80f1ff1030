"""Product quantization (PQ) for billion-scale embedding search.

Jegou, Douze, Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split a d-dim vector into M subvectors, vector-quantize each
against its own K-centroid codebook, store M uint8 codes (d=64, M=8, K=16
=> 8 bytes/vector instead of 256), and search with asymmetric distance
computation (ADC): per query build an (M, K) table of subspace distances
once, then a candidate's distance is a sum of M table lookups.

Spark shape:
- ``train_codebooks`` runs numpy k-means on a BOUNDED DETERMINISTIC sample
  on the driver (sample-based training is the standard practice at scale —
  the codebook is a few KB and broadcast; never a distributed iteration).
  Deterministic: seeds = the sample's first K subvectors, a FIXED number of
  Lloyd iterations, ties to the lower centroid id.
- ``pq_encode`` maps the corpus through one Arrow-batched pandas UDF
  (argmin over K per subspace = one (batch, K) matmul per subspace) —
  map-only, no shuffle, the encoded table is 32x smaller.
- ``pq_topk`` scores candidates with ADC in one mapInPandas pass over the
  encoded corpus (codes gathered against the broadcast distance tables,
  np.take + sum) and TakeOrdered's the global top-k (k rows, never the
  corpus, reach the driver).

Compresses the IVF cell-probe path's residuals in a real system; here it
is the standalone ADC search, oracled by an engine-kernel snapshot
(q_pq_codes) and a recall contract vs exact search (tests).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_codebooks(
    sample: np.ndarray, m: int = 8, k: int = 16, iterations: int = 2
) -> np.ndarray:
    """(m, k, d/m) codebooks from a (n, d) sample; deterministic."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.empty((m, k, sub), dtype=np.float64)
    x = sample.astype(np.float64).reshape(n, m, sub)
    for j in range(m):
        xj = x[:, j, :]
        cents = xj[:k].copy()  # deterministic seeds: first k subvectors
        for _ in range(iterations):
            d2 = ((xj[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties -> lower centroid id
            for c in range(k):
                members = xj[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def encode_batch(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) -> (n, m) uint8 codes."""
    n, d = vecs.shape
    m, k, sub = books.shape
    x = vecs.astype(np.float64).reshape(n, m, sub)
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        d2 = ((x[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    return codes


def pq_encode(
    df: DataFrame, books: np.ndarray,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>) — map-only Arrow pass, 32x smaller table."""
    m, k, sub = books.shape

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ) if len(pdf) else np.zeros((0, m * sub))
            codes = encode_batch(vecs, books)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": [c.tolist() for c in codes]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        work, f"{id_col} long, codes array<int>"
    )


def adc_tables(query: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(m, k) squared-distance lookup tables for one query."""
    m, k, sub = books.shape
    q = query.astype(np.float64).reshape(m, sub)
    return ((q[:, None, :] - books) ** 2).sum(axis=2)


def pq_topk(
    encoded: DataFrame, queries: list[tuple[int, np.ndarray]],
    books: np.ndarray, k: int = 10, id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k per query over the encoded corpus.

    queries: [(query_id, vector)] — the query set is small by definition
    (it rides into the closure with the few-KB codebooks).  One
    mapInPandas pass scores every (query, candidate) pair via table
    gathers; a TakeOrdered per query returns k rows to the driver."""
    from pyspark.sql import Window

    tables = {qid: adc_tables(v, books) for qid, v in queries}
    m = books.shape[0]

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            cols = np.arange(m)
            out = {}
            for qid, tab in tables.items():
                out[qid] = tab[cols[None, :], codes].sum(axis=1)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(list(out), len(ids)),
                    id_col: np.tile(ids, len(out)),
                    "adc_dist": np.concatenate([out[q] for q in out]),
                }
            )

    scored = encoded.mapInPandas(
        work, f"query_id long, {id_col} long, adc_dist double"
    ).where(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.round("adc_dist", 6).asc(), id_col
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", id_col, F.round("adc_dist", 4).alias("adc_dist"))
    )
