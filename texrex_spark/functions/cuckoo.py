"""Cuckoo filter: the deletable URL-seen-set alternative to the scaling
bloom filter (functions/bloom.py).

Fan, Andersen, Kaminsky, Mitzenmacher, "Cuckoo Filter: Practically Better
Than Bloom" (CoNEXT 2014): 4-slot buckets of 16-bit fingerprints,
partial-key cuckoo hashing — slot candidates i1 = h(x) and
i2 = i1 XOR h'(fp(x)), so an entry can relocate between its two buckets
knowing only the stored fingerprint.  Unlike the bloom filter this
supports DELETE (retract a URL so it can be recrawled — e.g. a fetch that
died before the document was committed) at a comparable bits/key cost
(~18.4 bits/key at 95% load vs 28.8 bits/key for the bloom at e=1e-6).

The reference keeps only a scaling bloom (trbloom.pas:169-209); the north
star names "bloom/cuckoo-filter URL-seen set", so both are provided behind
the same bulk API and the partitioned seen-set (operators/seenset.py)
takes ``filter_kind="cuckoo"``.

Determinism: membership answers are a pure function of the table state;
the table state is a pure function of the SEQUENCE of bulk adds/deletes
because every bulk operation processes its keys in sorted-unique order
(callers pass np.unique output) and the kick loop is seeded per filter.
Lookups (check_bulk) are fully vectorized numpy; only the residual
insert of NEW keys walks a Python loop (rare past the first round: the
steady-state frontier is mostly seen).
"""

from __future__ import annotations

import numpy as np

from .poly64 import POLYS64
from .rabin import Rabin64

SLOTS = 4
MAX_KICKS = 500
# Knuth/Murmur-style odd multiplier for the fingerprint -> bucket-delta
# hash; any fixed odd constant works for partial-key cuckoo hashing.
_FP_MULT = np.uint64(0x5BD1E9955BD1E995)

_HASHER: Rabin64 | None = None


def _hasher() -> Rabin64:
    global _HASHER
    if _HASHER is None:
        _HASHER = Rabin64(POLYS64[2])
    return _HASHER


def _hash_keys(keys: list[bytes]) -> np.ndarray:
    """Rabin-64 of each key, batched by byte length (one hash_matrix pass
    per distinct length — the same batching as seenset.bucket_udf)."""
    h = _hasher()
    out = np.zeros(len(keys), dtype=np.uint64)
    by_len: dict[int, list[int]] = {}
    for i, k in enumerate(keys):
        by_len.setdefault(len(k), []).append(i)
    for length, idxs in by_len.items():
        if length == 0:
            continue
        mat = np.frombuffer(b"".join(keys[i] for i in idxs), dtype=np.uint8).reshape(
            len(idxs), length
        )
        out[np.asarray(idxs)] = h.hash_matrix(mat)
    return out


class CuckooFilter:
    """Fixed-capacity cuckoo filter, (m, 4) uint16 fingerprint table.

    capacity: expected number of stored keys; the table is sized to the
    next power of two holding them at <= 95% load.  Inserts past that
    land in a bounded overflow stash (still correct, linearly probed);
    ``is_full`` trips when the stash exceeds its bound, mirroring
    ScalingBloomFilter.is_full as the caller's re-shard signal."""

    STASH_MAX = 64

    def __init__(self, capacity: int):
        m = 1
        while m * SLOTS * 0.95 < capacity:
            m *= 2
        self.m = m
        self.table = np.zeros((m, SLOTS), dtype=np.uint16)
        self.stash: list[int] = []  # (bucket << 16 | fp) overflow entries
        self.adds = 0
        self.rejects = 0
        self.deletes = 0
        self.kicks = 0

    # -- hashing ---------------------------------------------------------

    def _derive(self, hashes: np.ndarray):
        """(fp, i1, i2) per key.  fp is the high 16 bits (0 -> 1 so empty
        slots are distinguishable); i2 = i1 XOR h'(fp) mod m."""
        mask = np.uint64(self.m - 1)
        fp = (hashes >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (hashes & mask).astype(np.int64)
        delta = ((fp.astype(np.uint64) * _FP_MULT) >> np.uint64(32)) & mask
        i2 = (i1 ^ delta.astype(np.int64)) & int(mask)
        return fp, i1, i2

    def _alt(self, bucket: int, fp: int) -> int:
        # Python-int twin of _derive's delta (uint64 wraparound multiply)
        mask = self.m - 1
        delta = (((fp * int(_FP_MULT)) & 0xFFFFFFFFFFFFFFFF) >> 32) & mask
        return (bucket ^ delta) & mask

    # -- bulk ops (keys must be unique; callers pass np.unique output) ---

    def check_hashes(self, hashes: np.ndarray) -> np.ndarray:
        fp, i1, i2 = self._derive(hashes)
        hit = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        if self.stash:
            st = np.asarray(self.stash, dtype=np.int64)
            packed1 = (i1 << 16) | fp.astype(np.int64)
            packed2 = (i2 << 16) | fp.astype(np.int64)
            hit |= np.isin(packed1, st) | np.isin(packed2, st)
        return hit

    def check_bulk(self, keys: list[bytes]) -> np.ndarray:
        return self.check_hashes(_hash_keys(keys))

    def add_bulk(self, keys: list[bytes]) -> np.ndarray:
        """Insert keys not already present; returns True for NEW keys
        (the same convention as ScalingBloomFilter.add_bulk)."""
        hashes = _hash_keys(keys)
        present = self.check_hashes(hashes)
        fp, i1, i2 = self._derive(hashes)
        new = ~present
        for j in np.flatnonzero(new):
            self._insert(int(i1[j]), int(i2[j]), int(fp[j]))
        self.adds += int(new.sum())
        self.rejects += int(present.sum())
        return new

    def _insert(self, b1: int, b2: int, fp: int) -> None:
        for b in (b1, b2):
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return
        # evict: deterministic kick walk (slot 0 of the second bucket)
        b = b2
        for _ in range(MAX_KICKS):
            row = self.table[b]
            victim = int(row[0])
            row[:-1] = row[1:]
            row[-1] = fp
            fp = victim
            b = self._alt(b, fp)
            self.kicks += 1
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return
        self.stash.append((b << 16) | fp)

    def delete_bulk(self, keys: list[bytes]) -> np.ndarray:
        """Remove one stored copy of each present key; True = deleted.
        (Only delete keys you inserted — the cuckoo-filter contract.)"""
        hashes = _hash_keys(keys)
        fp, i1, i2 = self._derive(hashes)
        out = np.zeros(len(keys), dtype=bool)
        for j in range(len(keys)):
            f = int(fp[j])
            done = False
            for b in (int(i1[j]), int(i2[j])):
                row = self.table[b]
                hits = np.flatnonzero(row == f)
                if len(hits):
                    row[hits[0]] = 0
                    done = True
                    break
                packed = (b << 16) | f
                if packed in self.stash:
                    self.stash.remove(packed)
                    done = True
                    break
            if done:
                out[j] = True
                self.deletes += 1
        return out

    # -- capacity / persistence ------------------------------------------

    @property
    def scalings(self) -> int:
        """Interface parity with ScalingBloomFilter (cuckoo never scales;
        the per-row lineage column reports 0)."""
        return 0

    @property
    def load_factor(self) -> float:
        return float((self.table != 0).sum()) / (self.m * SLOTS)

    def is_full(self) -> bool:
        return len(self.stash) > self.STASH_MAX

    @property
    def memory_bits(self) -> int:
        return self.m * SLOTS * 16

    def state(self) -> dict:
        return {
            "kind": "cuckoo",
            "m": self.m,
            "table": self.table.tobytes(),
            "stash": list(self.stash),
            "adds": self.adds,
            "rejects": self.rejects,
            "deletes": self.deletes,
            "kicks": self.kicks,
        }

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        obj = cls.__new__(cls)
        obj.m = st["m"]
        obj.table = np.frombuffer(st["table"], dtype=np.uint16).reshape(
            st["m"], SLOTS
        ).copy()
        obj.stash = list(st["stash"])
        obj.adds = st["adds"]
        obj.rejects = st.get("rejects", 0)
        obj.deletes = st["deletes"]
        obj.kicks = st["kicks"]
        return obj
