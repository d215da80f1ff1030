"""Training-data text operators over a documents table: SimHash, exact and
near dedup helpers, language ID, quality scoring, token counting, rolling
document fingerprints.

These complement the oracle-checked SQL-expressible variants in
plans/queries.py with the engine-native (vectorized numpy / JVM) paths:

- ``simhash_udf``: 64-bit SimHash over token hashes (Charikar); the
  weighted-bit-majority kernel is a numpy pass per Arrow batch.
- ``hamming_neardup``: SimHash near-dup via band rotation — k 16-bit
  chunks as join keys catch all pairs within Hamming distance <= 3 on one
  chunk-equal band (pigeonhole), then exact popcount filter, JVM-side.
- ``doc_fingerprint``: Rabin-64 rolling fingerprint of normalized text
  (the perfect-dedup content key, trduplicatedetector.pas:114-122 —
  SimpleFingerprint sampled bytes replaced by a real rolling hash).
- ``exact_dedup``: content-hash keep-first (order by a deterministic key).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.poly64 import POLYS64
from ..functions.rabin import Rabin64

_HASHER: Rabin64 | None = None


def _hasher() -> Rabin64:
    global _HASHER
    if _HASHER is None:
        _HASHER = Rabin64(POLYS64[1])
    return _HASHER


def simhash64(tokens: list[str]) -> int:
    """Charikar SimHash: sum of +-1 bit votes of token Rabin hashes."""
    if not tokens:
        return 0
    h = _hasher()
    hashes = h.hash_matrix  # noqa: F841  (vectorized path below)
    votes = np.zeros(64, dtype=np.int64)
    keys = [t.encode("utf-8") for t in tokens]
    by_len: dict[int, list[bytes]] = {}
    for k in keys:
        if k:
            by_len.setdefault(len(k), []).append(k)
    for length, ks in by_len.items():
        mat = np.frombuffer(b"".join(ks), dtype=np.uint8).reshape(len(ks), length)
        hs = h.hash_matrix(mat)  # (n,) uint64
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes += (2 * bits - 1).sum(axis=0)
    sim = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            sim |= np.uint64(1) << np.uint64(i)
    return int(sim.astype(np.int64).view(np.int64))


def simhash_batch(texts: pd.Series) -> np.ndarray:
    """Whole-Arrow-batch SimHash: tokenize every doc, flatten all tokens,
    ONE hash_matrix pass per distinct token byte-length over the entire
    batch, then segment-reduce the +-1 bit votes back to docs with
    np.add.reduceat.  Identical output to simhash64 per doc, with no
    per-document Python loop in the hashing or voting."""
    h = _hasher()
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    toks_per_doc = [t.split() if isinstance(t, str) else [] for t in texts]
    counts = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=n)
    total = int(counts.sum())
    if total == 0:
        return out
    flat = [tok.encode("utf-8") for toks in toks_per_doc for tok in toks]
    hashes = np.zeros(total, dtype=np.uint64)
    by_len: dict[int, list[int]] = {}
    for i, k in enumerate(flat):
        by_len.setdefault(len(k), []).append(i)
    for length, idxs in by_len.items():
        ia = np.asarray(idxs)
        mat = np.frombuffer(b"".join(flat[i] for i in idxs), dtype=np.uint8).reshape(
            len(ia), length
        )
        hashes[ia] = h.hash_matrix(mat)
    nonempty = np.flatnonzero(counts > 0)
    starts = np.concatenate(([0], np.cumsum(counts[nonempty])[:-1]))
    sims = np.zeros(len(nonempty), dtype=np.uint64)
    # bit-plane chunks of 16 keep the vote matrix at 64 B/token peak
    for lo in range(0, 64, 16):
        shifts = np.arange(lo, lo + 16, dtype=np.uint64)[None, :]
        bits = (
            2 * ((hashes[:, None] >> shifts) & np.uint64(1)).astype(np.int32) - 1
        )
        votes = np.add.reduceat(bits, starts, axis=0)  # (docs, 16)
        sims |= (
            (votes > 0).astype(np.uint64) << shifts
        ).sum(axis=1, dtype=np.uint64)
    out[nonempty] = sims.view(np.int64)
    return out


def simhash_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(texts))

    return _simhash


_MD5_WS = None  # compiled lazily per worker


def simhash_md5_batch(texts: pd.Series) -> list:
    """Portable md5-SimHash twin of ``simhash_batch``: 60-bit token hashes
    (first 15 md5 hex digits), +-1 bit votes, whitespace class
    [ \\t\\n\\r\\f]+ — bit-for-bit the quantity q_simhash_neardup's SQL
    oracle derives (bit j set iff 2 * count(bit_j) > n_tokens).

    Whole-batch numpy voting like ``simhash_batch``: one md5 pass over the
    flattened token stream, bit-plane vote chunks, np.add.reduceat back to
    docs.  Docs with zero (non-empty) tokens return None — they must stay
    absent from the pair join, exactly as the explode+groupBy derivation
    dropped them."""
    import hashlib
    import re

    global _MD5_WS
    if _MD5_WS is None:
        _MD5_WS = re.compile("[ \t\n\r\f]+")
    ws = _MD5_WS
    n = len(texts)
    out: list = [None] * n
    toks_per_doc = [
        [tk for tk in ws.split(txt) if tk] if isinstance(txt, str) else []
        for txt in texts
    ]
    counts = np.fromiter((len(x) for x in toks_per_doc), dtype=np.int64, count=n)
    total = int(counts.sum())
    if total == 0:
        return out
    md5 = hashlib.md5
    # first 15 hex digits == first 60 bits of the digest
    hashes = np.fromiter(
        (
            int.from_bytes(md5(tk.encode("utf-8")).digest()[:8], "big") >> 4
            for toks in toks_per_doc
            for tk in toks
        ),
        dtype=np.uint64,
        count=total,
    )
    nonempty = np.flatnonzero(counts > 0)
    starts = np.concatenate(([0], np.cumsum(counts[nonempty])[:-1]))
    sims = np.zeros(len(nonempty), dtype=np.uint64)
    halves = counts[nonempty][:, None]
    # bit-plane chunks keep the vote matrix small (simhash_batch's shape)
    for lo in range(0, 60, 15):
        shifts = np.arange(lo, lo + 15, dtype=np.uint64)[None, :]
        bits = ((hashes[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
        votes = np.add.reduceat(bits, starts, axis=0)  # (docs, 15)
        sims |= ((2 * votes.astype(np.int64) > halves).astype(np.uint64) << shifts).sum(
            axis=1, dtype=np.uint64
        )
    signed = sims.view(np.int64)
    for row, doc_i in enumerate(nonempty):
        out[int(doc_i)] = int(signed[row])
    return out


def simhash_md5_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash_md5(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash_md5_batch(texts), dtype=object)

    # Callers filter on the result (IS NOT NULL); without this the
    # optimizer pushes that filter below the projection and evaluates the
    # kernel TWICE — once below the fan-out repartition, i.e. single-task
    # (guide §4.4: two ArrowEvalPython nodes, observed).  The kernel is
    # pure, but nondeterministic-marking is the documented way to pin a
    # single evaluation.
    return _simhash_md5.asNondeterministic()


def doc_fingerprint_udf():
    """Rabin-64 of the whole normalized text (whitespace-collapsed)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        h = _hasher()
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if isinstance(t, str) and t:
                key = " ".join(t.split()).encode("utf-8")
                out[i] = np.uint64(h.hash(key)).astype(np.int64)
        return pd.Series(out)

    return _fp


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Perfect-duplicate removal: md5 content key, keep smallest id
    (order-respecting variant of trduplicatedetector.pas semantics)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def hamming_neardup(
    df: DataFrame, simhash_col: str = "simhash", id_col: str = "doc_id",
    max_distance: int = 3, max_bucket: int = 200,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= max_distance.

    Four 16-bit chunks as band keys (pigeonhole: distance <= 3 over 64
    bits guarantees one equal chunk); exact popcount via bit_count."""
    chunks = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col(simhash_col), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
        )
        for i in range(4)
    ]
    sigs = df.select(
        F.col(id_col).alias("doc_id"), F.col(simhash_col).alias("sh"),
        F.explode(F.array(*chunks)).alias("c"),
    ).select("doc_id", "sh", F.col("c.band").alias("band"), F.col("c.key").alias("key"))
    buckets = (
        sigs.groupBy("band", "key")
        .agg(F.collect_list(F.struct("doc_id", "sh")).alias("m"))
        .where(F.size("m").between(2, max_bucket))
    )
    pairs = (
        buckets.select(F.explode("m").alias("a"), "m")
        .select("a", F.explode("m").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.sh").bitwiseXOR(F.col("b.sh"))
            ).alias("hamming"),
        )
        # distance filter BEFORE the distinct: hamming is a pure function
        # of (doc_a, doc_b), so filtering first is result-identical but
        # the dedup Exchange moves only the passing pairs (guide §2.3
        # "shuffle fewer bytes" — a multi-band match otherwise ships every
        # duplicate candidate pair into the shuffle)
        .where(F.col("hamming") <= max_distance)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs
