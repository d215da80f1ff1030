"""Deterministic bloom filters with the reference's exact sizing semantics.

Parity targets (/root/reference/src/units/trbloom.pas):

- ``calc_bits_needed(n, p) = trunc(-(n * ln p) / ln(2)^2) + 1``  (:289-294)
- ``k = round((m / n) * ln 2)``                                   (:241-242)
- bit indices: ``rabin_i(key) mod m`` for the first-k deterministic
  polynomials (:356-369 with trrabinhash.pas:294-306)
- observed error rate ``(1 - (1 - 1/m)^(k*adds))^k``              (:427-435)
- scaling filter (Almeida et al. 2007): start at ``n0 = round(1/p)``,
  add a doubled-capacity sub-filter whenever the newest sub-filter's
  observed error rate reaches p (:449-465, 504-524, 546-582).

Membership is a pure function of (m, k, polynomials, key set), so a numpy
bitmap here, a partitioned bitmap inside ``mapInPandas`` on executors, and
the single-process oracle all agree bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np

from .rabin import get_provider

_U64 = np.uint64


def calc_bits_needed(expected_members: int, error_rate: float) -> int:
    """trbloom.pas:289-294 (trunc + 1, not ceil)."""
    return int(-(expected_members * math.log(error_rate)) / (math.log(2) ** 2)) + 1


def hash_function_count(bits_needed: int, expected_members: int) -> int:
    """trbloom.pas:241-242.  Pascal Round() is banker's rounding, like Python's."""
    return round((bits_needed / expected_members) * math.log(2))


class BloomFilter:
    """Fixed-size Broder-Mitzenmacher filter (TTrBloomFilter)."""

    def __init__(self, expected_members: int, error_rate: float):
        if expected_members < 1:
            raise ValueError("too low expected members number")
        self.expected_members = expected_members
        self.error_rate_target = error_rate
        self.m = calc_bits_needed(expected_members, error_rate)
        self.k = hash_function_count(self.m, expected_members)
        self.provider = get_provider(self.k)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.adds = 0
        self.rejects = 0

    def _indices(self, key: bytes) -> np.ndarray:
        return self.provider.hash_all(key) % _U64(self.m)

    def _get(self, idx: np.ndarray) -> np.ndarray:
        return (self.bits[idx >> _U64(6)] >> (idx & _U64(63))) & _U64(1)

    def _set(self, idx: np.ndarray) -> None:
        np.bitwise_or.at(self.bits, (idx >> _U64(6)), _U64(1) << (idx & _U64(63)))

    def check(self, key: bytes) -> bool:
        idx = self._indices(key)
        return bool(self._get(idx).all())

    def add(self, key: bytes) -> bool:
        """True iff the key was newly added (trbloom.pas:344-382)."""
        idx = self._indices(key)
        if self._get(idx).all():
            self.rejects += 1
            return False
        self._set(idx)
        self.adds += 1
        return True

    def add_batch(self, keys: list[bytes]) -> np.ndarray:
        """Vectorized-hash batch add, preserving per-key sequential add order.

        Returns a bool array: True where the key was newly added.  The
        bit-set updates stay sequential (a later duplicate in the same batch
        must be rejected), but the k hashes per key are computed in one
        vectorized pass.
        """
        if not keys:
            return np.zeros(0, dtype=bool)
        hashes = self.provider.hash_batch(keys) % _U64(self.m)  # (n, k)
        out = np.zeros(len(keys), dtype=bool)
        for i in range(len(keys)):
            idx = hashes[i]
            if self._get(idx).all():
                self.rejects += 1
            else:
                self._set(idx)
                self.adds += 1
                out[i] = True
        return out

    def check_bulk(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for pre-computed (n, k) bit indices."""
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        present = self._get(hashes.reshape(-1)).reshape(hashes.shape)
        return present.all(axis=1)

    def add_bulk(self, hashes: np.ndarray) -> np.ndarray:
        """Bulk-batch add with *set-at-once* semantics: membership is
        evaluated against the pre-batch bitmap for every key, then all new
        keys' bits are set together.  Unlike sequential ``add_batch`` this
        is independent of within-batch order (callers must dedup exact
        keys first) — the property the distributed seen-set needs for
        partition-order-free determinism.  Differs from sequential adds
        only when an earlier in-batch key would have induced a bloom false
        positive on a later one (p ~ the filter's error rate).
        """
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        seen = self.check_bulk(hashes)
        new = ~seen
        if new.any():
            self._set(hashes[new].reshape(-1))
        self.adds += int(new.sum())
        self.rejects += int(seen.sum())
        return new

    def hash_indices(self, keys: list[bytes]) -> np.ndarray:
        """(n, k) bit indices for a key batch (one vectorized Rabin pass)."""
        return self.provider.hash_batch(keys) % _U64(self.m)

    @property
    def observed_error_rate(self) -> float:
        p0 = (1.0 - 1.0 / self.m) ** (self.k * self.adds)
        return (1.0 - p0) ** self.k

    @property
    def is_full(self) -> bool:
        return self.observed_error_rate >= self.error_rate_target

    @property
    def memory_bits(self) -> int:
        return self.m

    def state(self) -> dict:
        return {
            "expected_members": self.expected_members,
            "error_rate": self.error_rate_target,
            "bits": self.bits,
            "adds": self.adds,
            "rejects": self.rejects,
        }

    @classmethod
    def from_state(cls, st: dict) -> "BloomFilter":
        f = cls(st["expected_members"], st["error_rate"])
        f.bits = st["bits"].copy()
        f.adds = st["adds"]
        f.rejects = st["rejects"]
        return f


class ScalingBloomFilter:
    """Self-scaling filter (TTrScalingBloomFilter, trbloom.pas:449-582)."""

    def __init__(self, error_rate: float, max_memory_mb: int = 1024):
        self.error_rate_target = error_rate
        # Reference quirk kept as-is: 8242880 "bits per MB" (trbloom.pas:453).
        self.max_memory_bits = max_memory_mb * 8242880
        self.out_of_memory = False
        self.filters = [BloomFilter(round(error_rate**-1), error_rate)]

    def check(self, key: bytes) -> bool:
        return any(f.check(key) for f in self.filters)

    def check_bulk(self, keys: list[bytes]) -> np.ndarray:
        """Vectorized membership across the scaling chain."""
        out = np.zeros(len(keys), dtype=bool)
        if not keys:
            return out
        pending = np.arange(len(keys))
        for f in self.filters:
            if pending.size == 0:
                break
            seen = f.check_bulk(f.hash_indices([keys[i] for i in pending]))
            out[pending[seen]] = True
            pending = pending[~seen]
        return out

    def add(self, key: bytes) -> bool:
        for f in self.filters[:-1]:
            if f.check(key):
                return False
        added = self.filters[-1].add(key)
        if added and self.filters[-1].is_full and not self.out_of_memory:
            self._grow()
        return added

    def add_batch(self, keys: list[bytes]) -> np.ndarray:
        return np.fromiter((self.add(k) for k in keys), dtype=bool, count=len(keys))

    def add_bulk(self, keys: list[bytes]) -> np.ndarray:
        """Vectorized set-at-once batch add across the scaling chain.

        Per-key semantics mirror sequential ``add``: a key already present
        in ANY sub-filter is a reject; new keys go into the newest filter;
        the chain grows (capacity doubling) when the newest filter crosses
        its error-rate target, and the *remaining* keys of the same batch
        continue into the new filter.  Callers pass exact-deduped keys so
        the result is order-independent (see BloomFilter.add_bulk).
        """
        out = np.zeros(len(keys), dtype=bool)
        if not keys:
            return out
        pending = np.arange(len(keys))
        # reject anything present in filters closed before this batch
        checked_closed = len(self.filters) - 1
        for f in self.filters[:checked_closed]:
            if pending.size == 0:
                return out
            idx = f.hash_indices([keys[i] for i in pending])
            seen = f.check_bulk(idx)
            pending = pending[~seen]
        # chunked insert into the newest filter; growth between chunks
        # closes the previous newest filter, so each chunk re-checks
        # against any filter closed since the batch started.  Chunk size
        # tracks the live filter's capacity so the growth trigger fires at
        # (approximately) the same fill level as sequential adds.
        pos = 0
        while pos < pending.size:
            if self.filters[-1].is_full and not self.out_of_memory:
                self._grow()
            chunk = max(64, self.filters[-1].expected_members - self.filters[-1].adds)
            take = pending[pos : pos + chunk]
            pos += chunk
            kb = [keys[i] for i in take]
            for f in self.filters[checked_closed:-1]:
                seen = f.check_bulk(f.hash_indices(kb))
                take = take[~seen]
                kb = [keys[i] for i in take]
                if take.size == 0:
                    break
            if take.size == 0:
                continue
            last = self.filters[-1]
            new = last.add_bulk(last.hash_indices(kb))
            out[take] = new
        return out

    def _grow(self) -> None:
        new_size = self.filters[-1].expected_members * 2
        need = calc_bits_needed(new_size, self.error_rate_target)
        if self.memory_bits + need > self.max_memory_bits:
            self.out_of_memory = True
            return
        self.filters.append(BloomFilter(new_size, self.error_rate_target))

    @property
    def adds(self) -> int:
        return sum(f.adds for f in self.filters)

    @property
    def rejects(self) -> int:
        return sum(f.rejects for f in self.filters)

    @property
    def scalings(self) -> int:
        return len(self.filters) - 1

    @property
    def memory_bits(self) -> int:
        return sum(f.m for f in self.filters)

    def state(self) -> dict:
        return {
            "error_rate": self.error_rate_target,
            "max_memory_bits": self.max_memory_bits,
            "out_of_memory": self.out_of_memory,
            "filters": [f.state() for f in self.filters],
        }

    @classmethod
    def from_state(cls, st: dict) -> "ScalingBloomFilter":
        obj = cls.__new__(cls)
        obj.error_rate_target = st["error_rate"]
        obj.max_memory_bits = st["max_memory_bits"]
        obj.out_of_memory = st["out_of_memory"]
        obj.filters = [BloomFilter.from_state(fs) for fs in st["filters"]]
        return obj
