"""Partitioned deterministic URL-seen set: the 10^10-scale bloom filter.

The reference keeps one in-process scaling bloom (trwalkers.pas:486,
trbloom.pas:169-209).  At 10^10 URLs / ε=1e-6 that is -ln(ε)/ln²2 ≈ 28.8
bits/URL ≈ 36 GB of bitmap (plus scaling-growth overhead) — far beyond one
task's memory, so the rebuild shards it: bucket =
rabin64(url) mod P, one deterministic ``ScalingBloomFilter`` per bucket,
bitmaps persisted to shared storage, probed/updated inside ``mapInPandas``
(SURVEY.md §2.3 "URL-seen check+add", §4 custom work #1).

Determinism contract (SURVEY.md §7.4): bucket assignment uses the Rabin
hash with POLYS64[0] (shared numpy kernel — identical in the oracle), and
adds use *set-at-once* bulk semantics (membership judged against the
pre-batch bitmap, exact duplicates deduped first; bloom.add_bulk), so the
final bitmaps are a pure function of the set of (round, url) adds —
independent of task scheduling AND of row order within a partition.

Storage layout (checkpoint_dir):
    bucket-{i:05d}.pkl         current bitmap for bucket i (pickle of
                               ScalingBloomFilter.state())
    bucket-{i:05d}.pkl.tmp-*   in-flight write, renamed atomically

Each executor task loads only the buckets present in its input partition;
``repartition(P, bucket)`` makes that ~1 bucket per task.  On a real
cluster the directory lives on the shared FS (HDFS/S3+consistency layer);
the commit protocol is write-new + atomic rename, and the driver-side
``commit_round`` manifest pins which bitmap generation a resume sees.
"""

from __future__ import annotations

import glob
import json
import os
import pickle
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.bloom import ScalingBloomFilter
from ..functions.poly64 import POLYS64
from ..functions.rabin import Rabin64

_BUCKET_RABIN: Rabin64 | None = None


def _bucket_hasher() -> Rabin64:
    global _BUCKET_RABIN
    if _BUCKET_RABIN is None:
        _BUCKET_RABIN = Rabin64(POLYS64[0])
    return _BUCKET_RABIN


def bucket_of(url: str, partitions: int) -> int:
    """Oracle-side bucket assignment."""
    return int(_bucket_hasher().hash(url.encode("utf-8")) % partitions)


def bucket_udf(partitions: int):
    """Arrow-batched bucket assignment (same Rabin kernel, vectorized).

    r06: the per-row Python (encode list comprehension + a dict-of-lists
    length grouping) is replaced by a C-loop encode and argsort-based
    length grouping (guide §4.2)."""

    @pandas_udf("int")
    def _bucket(urls: pd.Series) -> pd.Series:
        h = _bucket_hasher()
        keys = urls.str.encode("utf-8").to_numpy()
        n = len(keys)
        out = np.zeros(n, dtype=np.int64)
        if n == 0:
            return pd.Series(out)
        lens = np.fromiter(map(len, keys), dtype=np.int64, count=n)
        order = np.argsort(lens, kind="stable")
        slens = lens[order]
        cuts = np.flatnonzero(np.diff(slens)) + 1
        for grp in np.split(order, cuts):
            length = int(lens[grp[0]])
            if length == 0:
                continue
            mat = np.frombuffer(
                b"".join(keys[i] for i in grp), dtype=np.uint8
            ).reshape(len(grp), length)
            out[grp] = (h.hash_matrix(mat) % np.uint64(partitions)).astype(np.int64)
        return pd.Series(out)

    return _bucket


class PartitionedSeenSet:
    """Sizing rule (assert-checked when ``expected_urls`` is given): each
    bucket's bitmap must FIT IN ONE TASK'S MEMORY, so

        partitions >= expected_urls * bits_per_url(error_rate)
                      / (max_memory_mb_per_bucket * 8e6)

    where bits_per_url = -ln(e)/ln^2(2) (~= 28.8 bits at e=1e-6, the
    trbloom.pas:241-249 formula).  At 10^10 URLs / e=1e-6 the total bitmap
    is ~36 GB, so the default 32 buckets (~1.1 GB each, before
    scaling-growth overhead) would blow the 256 MB/task budget — you need
    >= ~150 buckets by memory alone, and more for task parallelism.  Use
    ``partitions_for`` to derive the bucket count from the crawl's expected
    frontier size."""

    def __init__(
        self,
        storage_dir: str,
        partitions: int = 32,
        error_rate: float = 1e-6,
        max_memory_mb_per_bucket: int = 256,
        expected_urls: int | None = None,
        filter_kind: str = "bloom",
        cuckoo_capacity_per_bucket: int = 2_000_000,
    ):
        """filter_kind: "bloom" (scaling, default — the reference's
        structure, trbloom.pas) or "cuckoo" (functions/cuckoo.py —
        deletable, fixed-capacity; use retract() to un-see URLs)."""
        if filter_kind not in ("bloom", "cuckoo"):
            raise ValueError(f"unknown filter_kind {filter_kind!r}")
        self.dir = storage_dir
        self.partitions = partitions
        self.error_rate = error_rate
        self.max_mb = max_memory_mb_per_bucket
        self.filter_kind = filter_kind
        self.cuckoo_capacity = cuckoo_capacity_per_bucket
        if expected_urls is not None:
            need = self.partitions_for(
                expected_urls, error_rate, max_memory_mb_per_bucket
            )
            if partitions < need:
                raise ValueError(
                    f"seen-set bucket bitmaps would exceed the per-task memory "
                    f"budget: {expected_urls:.3g} URLs at e={error_rate} need "
                    f">= {need} buckets of <= {max_memory_mb_per_bucket} MB, "
                    f"got partitions={partitions}"
                )
        os.makedirs(storage_dir, exist_ok=True)

    @staticmethod
    def bits_per_url(error_rate: float) -> float:
        """Broder-Mitzenmacher bits/member (trbloom.pas:241-249)."""
        ln2 = float(np.log(2.0))
        return float(-np.log(error_rate)) / (ln2 * ln2)

    @classmethod
    def partitions_for(
        cls, expected_urls: int, error_rate: float = 1e-6,
        max_memory_mb_per_bucket: int = 256,
    ) -> int:
        """Minimum bucket count so each bucket's bitmap fits the budget."""
        total_bits = expected_urls * cls.bits_per_url(error_rate)
        budget_bits = max_memory_mb_per_bucket * 8_000_000
        return max(1, int(np.ceil(total_bits / budget_bits)))

    # -- bucket IO (runs on executors) ----------------------------------

    def _bucket_path(self, bucket: int) -> str:
        return os.path.join(self.dir, f"bucket-{bucket:05d}.pkl")

    def _load_bucket(self, bucket: int):
        from ..functions.cuckoo import CuckooFilter

        path = self._bucket_path(bucket)
        if os.path.exists(path):
            with open(path, "rb") as f:
                st = pickle.load(f)
            if st.get("kind") == "cuckoo":
                return CuckooFilter.from_state(st)
            return ScalingBloomFilter.from_state(st)
        if self.filter_kind == "cuckoo":
            return CuckooFilter(self.cuckoo_capacity)
        return ScalingBloomFilter(self.error_rate, self.max_mb)

    def _save_bucket(self, bucket: int, filt: ScalingBloomFilter) -> None:
        path = self._bucket_path(bucket)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(filt.state(), f)
        os.replace(tmp, path)

    # -- DataFrame ops ----------------------------------------------------

    def with_bucket(self, df: DataFrame, url_col: str = "url_norm") -> DataFrame:
        return df.withColumn("bloom_bucket", bucket_udf(self.partitions)(F.col(url_col)))

    def _run(
        self, df: DataFrame, url_col: str, mutate: bool, dedup_round: bool = False
    ) -> DataFrame:
        """Probe (mutate=False) or check-and-add (mutate=True).

        Returns the input plus ``seen`` boolean (True = already in the set
        before this call; for mutate=True a row's duplicates later in the
        same round are seen=True) and per-row lineage columns
        (bloom_bucket, bloom_scalings).

        dedup_round=True additionally marks exact-duplicate URLs within
        this call seen=True after their first occurrence even in probe
        mode — fusing the round's exact dedup into this pass so the
        scheduler needs no separate groupBy shuffle (equal URLs colocate
        here anyway, the bucket IS a url hash).
        """
        seen_self = self

        def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cache: dict[int, ScalingBloomFilter] = {}
            dirty: set[int] = set()
            round_seen: set[str] = set()
            for pdf in batches:
                if pdf.empty:
                    yield pdf.assign(seen=pd.Series(dtype=bool), bloom_scalings=pd.Series(dtype="int32"))
                    continue
                seen = np.zeros(len(pdf), dtype=bool)
                scalings = np.zeros(len(pdf), dtype=np.int32)
                for bucket, grp in pdf.groupby("bloom_bucket"):
                    b = int(bucket)
                    if b not in cache:
                        cache[b] = seen_self._load_bucket(b)
                    filt = cache[b]
                    urls = grp[url_col].to_numpy()
                    # exact within-batch dedup: bulk semantics are defined
                    # over the SET of keys (order-independent); among equal
                    # urls only the first row (original order) counts as new
                    uniq, first_idx, inverse = np.unique(
                        urls, return_index=True, return_inverse=True
                    )
                    keys = [u.encode("utf-8") for u in uniq]
                    if mutate:
                        new_u = filt.add_bulk(keys)
                        dirty.add(b)
                    else:
                        new_u = ~filt.check_bulk(keys)
                    if dedup_round and round_seen:
                        dup = np.fromiter(
                            (u in round_seen for u in uniq), dtype=bool, count=len(uniq)
                        )
                        new_u &= ~dup
                    if dedup_round:
                        round_seen.update(uniq[new_u].tolist())
                    newly = np.zeros(len(urls), dtype=bool)
                    newly[first_idx[new_u]] = True
                    loc = pdf.index.get_indexer(grp.index.to_numpy())
                    seen[loc] = ~newly
                    scalings[loc] = filt.scalings
                yield pdf.assign(seen=seen, bloom_scalings=scalings)
            if mutate:
                for b in dirty:
                    seen_self._save_bucket(b, cache[b])

        # 4x partition headroom (r06): hashing P bucket values into P
        # partitions leaves ~1/e of them empty and stacks 2-3 buckets on
        # one task (guide §2.5 "synthetic keys with too few distinct
        # values"); 4P bins make a multi-bucket task unlikely while every
        # bucket still lands wholly in one task (same hash), preserving
        # the single-writer invariant for the bitmap files.
        bucketed = self.with_bucket(df, url_col).repartition(
            self.partitions * 4, F.col("bloom_bucket")
        )
        schema = (
            ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in bucketed.schema)
            + ", seen boolean, bloom_scalings int"
        )
        return bucketed.mapInPandas(work, schema)

    def probe(
        self, df: DataFrame, url_col: str = "url_norm", dedup_round: bool = False
    ) -> DataFrame:
        """Read-only membership: input + seen flag (no bitmap writes)."""
        return self._run(df, url_col, mutate=False, dedup_round=dedup_round)

    def check_and_add(self, df: DataFrame, url_col: str = "url_norm") -> DataFrame:
        """Mutating add; rows that were new get seen=False.  The write is a
        side effect of the action that consumes the returned DataFrame —
        call within one round's materialization only once."""
        return self._run(df, url_col, mutate=True)

    def retract(self, df: DataFrame, url_col: str = "url_norm") -> DataFrame:
        """Un-see URLs so they can be re-admitted (a fetch that died before
        its document committed, a forced recrawl).  Cuckoo buckets only —
        the bloom filter cannot delete; calling this on bloom buckets
        raises inside the tasks.  Returns the input + ``deleted`` flag;
        duplicate url_norm values within the batch delete once but ALL
        carry the flag (counting rows where deleted=true is stable under
        input duplication)."""
        seen_self = self

        def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cache: dict[int, object] = {}
            dirty: set[int] = set()
            for pdf in batches:
                if pdf.empty:
                    yield pdf.assign(deleted=pd.Series(dtype=bool))
                    continue
                deleted = np.zeros(len(pdf), dtype=bool)
                for bucket, grp in pdf.groupby("bloom_bucket"):
                    b = int(bucket)
                    if b not in cache:
                        cache[b] = seen_self._load_bucket(b)
                    filt = cache[b]
                    if not hasattr(filt, "delete_bulk"):
                        raise TypeError(
                            "retract() needs cuckoo buckets; this seen-set "
                            "holds bloom bitmaps (filter_kind='bloom')"
                        )
                    urls = grp[url_col].to_numpy()
                    uniq, inverse = np.unique(urls, return_inverse=True)
                    done = filt.delete_bulk([u.encode("utf-8") for u in uniq])
                    dirty.add(b)
                    # one physical delete per distinct URL; the flag
                    # propagates to EVERY row carrying that URL so
                    # count(deleted) is stable under input duplication
                    hit = np.zeros(len(uniq), dtype=bool)
                    hit[done] = True
                    loc = pdf.index.get_indexer(grp.index.to_numpy())
                    deleted[loc] = hit[inverse]
                yield pdf.assign(deleted=deleted)
            for b in dirty:
                seen_self._save_bucket(b, cache[b])

        bucketed = self.with_bucket(df, url_col).repartition(
            self.partitions, F.col("bloom_bucket")
        )
        schema = (
            ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in bucketed.schema)
            + ", deleted boolean"
        )
        return bucketed.mapInPandas(work, schema)

    # -- metrics / manifest ----------------------------------------------

    def stats(self) -> dict:
        from ..functions.cuckoo import CuckooFilter

        out = {"buckets": 0, "adds": 0, "rejects": 0, "memory_bits": 0, "scalings": 0}
        for path in glob.glob(os.path.join(self.dir, "bucket-*.pkl")):
            with open(path, "rb") as f:
                st = pickle.load(f)
            filt = (
                CuckooFilter.from_state(st)
                if st.get("kind") == "cuckoo"
                else ScalingBloomFilter.from_state(st)
            )
            out["buckets"] += 1
            out["adds"] += filt.adds
            out["rejects"] += filt.rejects
            out["memory_bits"] += filt.memory_bits
            out["scalings"] += filt.scalings
        return out

    def commit_round(self, round_no: int, extra: dict | None = None) -> None:
        manifest = {"round": round_no, "stats": self.stats(), **(extra or {})}
        tmp = os.path.join(self.dir, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.dir, "manifest.json"))
