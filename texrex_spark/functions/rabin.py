"""Deterministic table-driven Rabin-64 fingerprinting, numpy-vectorized.

Semantics match the reference's TTrRabin64 / TTrHashProvider
(/root/reference/src/units/trrabinhash.pas:111-250, 274-336), which in turn
follows Sean Owen's public-domain Java rabinhash implementation
(http://sourceforge.net/projects/rabinhash/):

- 64 left-shift residues of the polynomial (LMods), split into eight
  256-entry XOR tables (one per byte lane of the 64-bit state).
- hash(s): feed ``len(s) mod 8`` leading bytes one at a time into the state
  (``W = (W << 8) ^ b``), then consume the rest in 8-byte big-endian blocks
  (``W = shift(W) ^ block``).
- The deterministic provider is "the first n polynomials" of the fixed
  1000-entry table (trrabinhash.pas:294-306); see poly64.py.

Known property kept for fidelity: inputs shorter than 8 bytes never reach
the table-mixing block loop, so their hash is the raw big-endian value —
identical across ALL polynomials.  Callers hashing short keys (the bloom
filters, the shingler) must feed keys >= 8-9 bytes; the reference does the
same (URLs are long; shingles are padded to >= 9 chars,
trshingler.pas:127-129).

The whole kernel is uint64 numpy; batches of equal-length keys hash in a
single vectorized pass per byte position, so pandas-UDF callers stay
Arrow-batched with no per-row Python in the hot loop.
"""

from __future__ import annotations

import numpy as np

from .poly64 import POLYS64

_U64 = np.uint64
_HIGH_BIT = _U64(1) << _U64(63)


def _build_tables(poly: int) -> np.ndarray:
    """8x256 uint64 XOR tables for one polynomial (trrabinhash.pas:138-190)."""
    poly = _U64(poly)
    mods = np.zeros(64, dtype=np.uint64)
    mods[0] = poly
    for i in range(1, 64):
        last = mods[i - 1]
        this = last << _U64(1)
        if last & _HIGH_BIT:
            this ^= poly
        mods[i] = this
    tables = np.zeros((8, 256), dtype=np.uint64)
    for i in range(256):
        ctrl, j = i, 0
        while j < 8 and ctrl > 0:
            if ctrl & 1:
                for t in range(8):
                    tables[t, i] ^= mods[j + 8 * t]
            ctrl >>= 1
            j += 1
    return tables


class Rabin64:
    """One Rabin hash function over byte strings (single polynomial)."""

    def __init__(self, poly: int):
        self.poly = poly
        self.tables = _build_tables(poly)
        # scalar fast path: plain-int tables.  The numpy kernel pays ~1 ms
        # of array setup per call, which swamps single-key hashing (the
        # div-dedup loop hashes one short string at a time); Python-int
        # table lookups do the same hash in a few microseconds.
        self._pytables = self.tables.tolist()

    def hash(self, data: bytes) -> int:
        """Single-key hash, bit-identical to hash_matrix (differentially
        tested) but scalar: starter bytes then 8-byte big-endian blocks
        (trrabinhash.pas:207-250)."""
        tab = self._pytables
        w = 0
        length = len(data)
        starter = length % 8
        for i in range(starter):
            w = ((w << 8) ^ data[i]) & 0xFFFFFFFFFFFFFFFF
        for block in range(starter, length, 8):
            shifted = (
                tab[0][w & 0xFF]
                ^ tab[1][(w >> 8) & 0xFF]
                ^ tab[2][(w >> 16) & 0xFF]
                ^ tab[3][(w >> 24) & 0xFF]
                ^ tab[4][(w >> 32) & 0xFF]
                ^ tab[5][(w >> 40) & 0xFF]
                ^ tab[6][(w >> 48) & 0xFF]
                ^ tab[7][(w >> 56) & 0xFF]
            )
            w = shifted ^ int.from_bytes(data[block : block + 8], "big")
        return w

    def hash_matrix(self, mat: np.ndarray) -> np.ndarray:
        """Hash a (n, L) uint8 matrix of n equal-length keys -> (n,) uint64."""
        t3 = getattr(self, "_tables3", None)
        if t3 is None:
            t3 = self._tables3 = self.tables[None, :, :]
        if mat.shape[1] == 0:
            return np.zeros(mat.shape[0], dtype=np.uint64)
        if (mat.shape[1] - mat.shape[1] % 8) // 8 <= _POS_BLOCK_CAP:
            pos = getattr(self, "_pos", None)
            if pos is None:
                pos = self._pos = _PosTables(t3)
            return _hash_matrix_bypos(mat, pos)[:, 0]
        return _hash_matrix_multi(mat, t3)[0]

    # Variable-length batching exploits that Rabin-64 is the remainder of
    # the key read as a GF(2) polynomial: LEADING zero bytes leave the
    # remainder unchanged (the state stays 0 through them and byte 0's
    # contribution is 0 in every position table), so keys of different
    # lengths can be FRONT-padded with NULs to one common multiple-of-8
    # width and pushed through the equal-length matrix kernel
    # bit-identically (property pinned in test_rabin).
    _BATCH_MAX_LEN = 512  # = 8 * _POS_BLOCK_CAP; beyond this, scalar per key

    def _rev_postable(self, width: int) -> np.ndarray:
        """(width, 256) uint64 contribution table indexed by REVERSED byte
        position r: with keys front-NUL-padded to a multiple of 8 every
        byte is a block byte, and the byte at reversed position r = 8q+s
        undergoes exactly q block shifts in lane s — so R[r] = C[r//8,
        r%8] is width-independent and ONE table serves every batch width
        (grown on demand, ~2 KB per byte position)."""
        rev = getattr(self, "_rev", None)
        if rev is None or rev.shape[0] < width:
            t3 = getattr(self, "_tables3", None)
            if t3 is None:
                t3 = self._tables3 = self.tables[None, :, :]
            pos = getattr(self, "_pos", None)
            if pos is None:
                pos = self._pos = _PosTables(t3)
            c = pos.grown(width // 8)  # (m_max+1, 8, 256, 1)
            # reversed order within each block step is lane 7..0 mirrored:
            # r = 8q+s uses C[q, s], and c[q] is laid out (u, 256) with
            # u = lane index — identical, so a straight reshape works.
            rev = np.ascontiguousarray(
                c[: width // 8, :, :, 0].reshape(-1, 256)
            )
            self._rev = rev
        return rev[:width]

    def hash_batch(self, keys: list) -> list:
        """Hash a list of byte strings of ANY lengths -> list of ints,
        bit-identical to [self.hash(k) for k in keys] (differentially
        tested).  Keys are front-NUL-padded to the batch maximum (leading
        zeros never change a polynomial remainder), column-reversed, and
        hashed as ONE numpy gather + XOR-reduce over the reversed-position
        table; oversized keys (> 512 B, where padding waste and table
        growth stop paying) fall back to the scalar kernel individually."""
        n = len(keys)
        if n == 0:
            return []
        lens = [len(k) for k in keys]
        lmax = max(lens)
        if lmax == 0:
            return [0] * n
        if lmax > self._BATCH_MAX_LEN:
            return [self.hash(k) for k in keys]
        width = lmax + (-lmax) % 8
        rev = np.zeros((n, width), dtype=np.uint8)
        for i, k in enumerate(keys):
            if lens[i]:
                rev[i, : lens[i]] = np.frombuffer(k, np.uint8)[::-1]
        tab = self._rev_postable(width)
        contrib = tab[np.arange(width), rev]  # (n, width) u64 gather
        return [int(h) for h in np.bitwise_xor.reduce(contrib, axis=1)]


# Position-table layout (the fast batch path).  Rabin-64 is GF(2)-linear
# in the input bytes: every byte's contribution to the final state is a
# fixed linear 8->64-bit map determined only by (a) how many block steps
# m the state undergoes after the byte enters and (b) the byte's lane u
# within its entry word.  So
#
#     hash_p(key) = XOR_b  C_p[m(b), u(b)][ key[b] ]
#
# with C_p[m, u][v] = S_p^m(v * x^(8u)), S_p the per-block shift map the
# 8x256 lane tables implement.  Hashing a batch of n equal-length keys
# under P polynomials then costs ONE contiguous row-gather of shape
# (n, P) per byte position — no per-lane index arithmetic, no scattered
# u64 gathers — and measures ~4x faster than the block-serial kernel
# below, which is kept as the differential-test oracle and the fallback
# for very long keys (the C cache grows with the block count; capped at
# _POS_BLOCK_CAP so a pathological key can't allocate unbounded tables).
_POS_BLOCK_CAP = 64

# Compact the per-position tables to the observed byte alphabet only while
# the union stays under this many values: past it the working-set shrink
# that motivates compaction (see _PosTables.compact_for) mostly evaporates
# while the remap pass still costs a full read of the key matrix.
_COMPACT_ALPHABET_CAP = 160


class _PosTables:
    """Lazily grown per-position contribution tables for a (P,8,256)
    lane-table stack.  C has shape (m_max+1, 8, 256, P), C[m, u] laid out
    (256, P) so ``C[m, u][bytes]`` row-gathers the P contributions of a
    whole byte column at once."""

    def __init__(self, tables: np.ndarray):
        self.tables = tables  # (P, 8, 256)
        p = tables.shape[0]
        v = np.arange(256, dtype=np.uint64)
        c0 = np.empty((1, 8, 256, p), dtype=np.uint64)
        for u in range(8):
            c0[0, u, :, :] = (v << _U64(8 * u))[:, None]
        self.c = c0
        self._tabs_by_len: dict[int, list] = {}
        # alphabet-compacted twin of c (see compact_for): byte values
        # actually observed, remap table, compacted copy, per-length view
        # cache keyed to the alphabet version, and a permanent off switch
        # once the union alphabet stops paying for itself.
        self._alpha: np.ndarray | None = None
        self._alpha_mask: np.ndarray | None = None
        self._alpha_remap: np.ndarray | None = None
        self._alpha_version = 0
        self._cc: np.ndarray | None = None
        self._ctabs_by_len: dict[int, tuple[int, list]] = {}
        self._compact_off = False

    def tabs_for(self, length: int) -> list:
        """Per-byte (256, P) contribution views for one key length,
        memoized (shingle streams revisit the same few lengths)."""
        tabs = self._tabs_by_len.get(length)
        if tabs is None:
            starter = length % 8
            nblocks = (length - starter) // 8
            c = self.grown(nblocks)
            tabs = [
                c[nblocks, starter - 1 - b] if b < starter
                else c[nblocks - 1 - (b - starter) // 8, 7 - (b - starter) % 8]
                for b in range(length)
            ]
            self._tabs_by_len[length] = tabs
        return tabs

    def compact_for(self, length: int, mat: np.ndarray):
        """(remap, per-byte tabs) views into an alphabet-compacted twin of
        ``c``, or None when the observed alphabet is too wide to pay off.

        The full per-length working set is L x (256, P) ~= 9 MB at P=100 —
        when 32 executor workers gather from their own copies concurrently
        they thrash the shared L3.  Real shingle text touches only ~30-80
        distinct byte values, so keeping ONE compacted copy of ``c``
        (shape (m, 8, A, P)) shrinks the per-worker set to ~1-2 MB
        (L2-resident; measured ~2.3x parallel wall on a 32-process pool, a
        wash single-threaded).  All key lengths share the twin through
        views, exactly like tabs_for over ``c``, so memory is bounded by
        A/256 of ``c`` itself.  The alphabet is a process-lifetime union
        that grows (one recompact) when a batch brings new bytes —
        steady-state batches recompact never; past _COMPACT_ALPHABET_CAP
        compaction turns off permanently for this table stack."""
        if self._compact_off:
            return None
        present = np.flatnonzero(np.bincount(mat.ravel(), minlength=256))
        alpha = self._alpha
        nblocks = (length - length % 8) // 8
        if alpha is None or not self._alpha_mask[present].all():
            alpha = (
                present
                if alpha is None
                else np.union1d(present, alpha)
            )
            if len(alpha) > _COMPACT_ALPHABET_CAP:
                self._compact_off = True
                self._cc = None
                self._ctabs_by_len.clear()
                return None
            self._alpha = alpha
            mask = np.zeros(256, dtype=bool)
            mask[alpha] = True
            self._alpha_mask = mask
            remap = np.zeros(256, dtype=np.uint8)
            remap[alpha] = np.arange(len(alpha), dtype=np.uint8)
            self._alpha_remap = remap
            self._alpha_version += 1
            self._cc = None
        if self._cc is None or self._cc.shape[0] <= nblocks:
            self.grown(nblocks)  # make sure c covers this length first
            self._cc = np.ascontiguousarray(self.c[:, :, self._alpha, :])
            self._alpha_version += 1
            self._ctabs_by_len.clear()
        hit = self._ctabs_by_len.get(length)
        if hit is not None and hit[0] == self._alpha_version:
            return self._alpha_remap, hit[1]
        starter = length % 8
        cc = self._cc
        tabs = [
            cc[nblocks, starter - 1 - b] if b < starter
            else cc[nblocks - 1 - (b - starter) // 8, 7 - (b - starter) % 8]
            for b in range(length)
        ]
        self._ctabs_by_len[length] = (self._alpha_version, tabs)
        return self._alpha_remap, tabs

    def grown(self, m_max: int) -> np.ndarray:
        while self.c.shape[0] <= m_max:
            flat, pbase = _flat_layout(self.tables)
            p = self.tables.shape[0]
            w = self.c[-1].reshape(-1, p)  # (2048, P)
            s = np.zeros_like(w)
            idx = np.empty(w.shape, dtype=np.intp)
            for t in range(8):
                lane = (w >> _U64(8 * t)) & _U64(0xFF)
                np.add(lane.astype(np.intp), pbase.T, out=idx)
                s ^= flat[t][idx]
            self.c = np.concatenate((self.c, s.reshape(1, 8, 256, p)))
        return self.c


def _hash_matrix_bypos(
    mat: np.ndarray, pos: _PosTables, chunk: int = 512
) -> np.ndarray:
    """Hash a (n, L) uint8 matrix under P polynomials -> (n, P) uint64
    via the per-position contribution tables (bit-identical to
    _hash_matrix_multi; differentially tested).

    chunk=512 keeps the (chunk, P) accumulator AND the per-byte gathered
    temp at ~400 KB each — both L2-resident — instead of streaming them
    through DRAM per byte position; measured ~1.9x over chunk=2048 on a
    100k x 45 B x 100-poly shingle batch."""
    n, length = mat.shape
    p = pos.tables.shape[0]
    # per-byte (m, u): starter byte b enters at lane (starter-1-b) and
    # sees all nblocks shifts; block-k byte sees nblocks-k shifts.
    compact = pos.compact_for(length, mat)
    if compact is not None:
        remap, tabs = compact
        mat = remap[mat]
    else:
        tabs = pos.tabs_for(length)
    out = np.empty((n, p), dtype=np.uint64)
    for s in range(0, n, chunk):
        sl = mat[s : s + chunk]
        acc = tabs[0][sl[:, 0]]
        for b in range(1, length):
            acc ^= tabs[b][sl[:, b]]
        out[s : s + chunk] = acc
    return out


# Flattened per-lane table layout cache: id(tables) -> (8 x (P*256,) flat
# arrays, (P,1) row-base offsets).  Keeping the source array in the value
# pins its id.  The flat layout turns the hot gather
# ``tables[pidx, t, lane]`` (fancy 3-index) into a 1-D take, ~25% faster
# and allocation-free.
_FLAT_CACHE: dict[int, tuple] = {}


def _flat_layout(tables: np.ndarray):
    key = id(tables)
    hit = _FLAT_CACHE.get(key)
    if hit is not None and hit[0] is tables:
        return hit[1], hit[2]
    p = tables.shape[0]
    flat = [np.ascontiguousarray(tables[:, t, :]).reshape(-1) for t in range(8)]
    pbase = (np.arange(p, dtype=np.intp) * 256)[:, None]
    _FLAT_CACHE[key] = (tables, flat, pbase)
    if len(_FLAT_CACHE) > 64:  # bound the cache; entries are ~1.6 MB/100 polys
        _FLAT_CACHE.pop(next(iter(_FLAT_CACHE)))
    return flat, pbase


def _hash_matrix_multi(
    mat: np.ndarray, tables: np.ndarray, chunk: int = 2048
) -> np.ndarray:
    """Hash a (n, L) uint8 matrix under P polynomials at once.

    tables: (P, 8, 256) uint64.  Returns (P, n) uint64.
    Mirrors trrabinhash.pas:207-250: starter bytes first, then 8-byte blocks.

    Keys are processed in ``chunk``-sized slices so the (P, chunk)
    intermediates stay cache-resident: with the full batch they stream
    through DRAM once per byte-lane per block, which saturates memory
    bandwidth when many executor cores hash concurrently (measured: +64%
    total CPU at 32 vs 8 cores before chunking).
    """
    n = mat.shape[0]
    p = tables.shape[0]
    flat, pbase = _flat_layout(tables)
    out = np.empty((p, n), dtype=np.uint64)
    for s in range(0, n, chunk):
        _hash_chunk(mat[s : s + chunk], flat, pbase, out[:, s : s + chunk])
    return out


def _hash_chunk(
    mat: np.ndarray, flat: list, pbase: np.ndarray, out: np.ndarray
) -> None:
    n, length = mat.shape
    p = pbase.shape[0]
    w = np.zeros((p, n), dtype=np.uint64)
    starter = length % 8
    cols = mat.T.astype(np.uint64)  # (L, n)
    for s in range(starter):
        w = (w << _U64(8)) ^ cols[s][None, :]
    mask = _U64(0xFF)
    shifted = np.zeros_like(w)
    idx = np.empty((p, n), dtype=np.intp)
    for block in range(starter, length, 8):
        # ComputeShifted: eight 1-D table takes on the byte lanes of W.
        shifted[:] = 0
        for t in range(8):
            lane = (w >> _U64(8 * t)) & mask
            np.add(lane.astype(np.intp), pbase, out=idx)
            shifted ^= flat[t][idx]
        blk = np.zeros(n, dtype=np.uint64)
        for b in range(8):
            blk = (blk << _U64(8)) ^ cols[block + b]
        np.bitwise_xor(shifted, blk[None, :], out=w)
    out[:] = w


class HashProvider:
    """n deterministic Rabin functions = first n POLYS64 (trrabinhash.pas:294-306)."""

    def __init__(self, n: int):
        if n > len(POLYS64):
            raise ValueError(f"at most {len(POLYS64)} deterministic hash functions")
        self.n = n
        self.tables = np.stack([_build_tables(POLYS64[i]) for i in range(n)])
        self._pos = _PosTables(self.tables)

    def hash(self, data: bytes, index: int) -> int:
        mat = np.frombuffer(data, dtype=np.uint8)[None, :]
        return int(_hash_matrix_multi(mat, self.tables[index : index + 1])[0, 0])

    def hash_all(self, data: bytes) -> np.ndarray:
        """All n hashes of one key -> (n,) uint64."""
        mat = np.frombuffer(data, dtype=np.uint8)[None, :]
        return _hash_matrix_multi(mat, self.tables)[:, 0]

    def hash_matrix(self, mat: np.ndarray) -> np.ndarray:
        """Hash a (n, L) uint8 matrix of equal-length keys -> (n, P) uint64,
        dispatching to the position-table kernel for shingle-sized rows and
        the block-lane kernel past its cache cap."""
        n, length = mat.shape
        if length == 0:
            return np.zeros((n, self.n), dtype=np.uint64)
        if (length - length % 8) // 8 <= _POS_BLOCK_CAP:
            return _hash_matrix_bypos(mat, self._pos)
        return _hash_matrix_multi(mat, self.tables).T

    def hash_batch(self, keys: list[bytes]) -> np.ndarray:
        """All n hashes of many keys -> (len(keys), n) uint64.

        Duplicate keys hash once (shingle streams repeat stopword-heavy
        5-grams heavily; pure function, so the scatter-back is exact),
        then unique keys group by length so each group is one fully
        vectorized pass.
        """
        out = np.zeros((len(keys), self.n), dtype=np.uint64)
        first_of: dict[bytes, int] = {}
        by_len: dict[int, list[int]] = {}
        dup_src: list[int] = []
        dup_dst: list[int] = []
        for i, k in enumerate(keys):
            j = first_of.setdefault(k, i)
            if j == i:
                by_len.setdefault(len(k), []).append(i)
            else:
                dup_src.append(j)
                dup_dst.append(i)
        for length, idxs in by_len.items():
            if length == 0:
                continue  # empty key hashes to 0 under this scheme
            mat = np.frombuffer(b"".join(keys[i] for i in idxs), dtype=np.uint8)
            mat = mat.reshape(len(idxs), length)
            out[np.asarray(idxs), :] = self.hash_matrix(mat)
        if dup_dst:
            out[np.asarray(dup_dst), :] = out[np.asarray(dup_src), :]
        return out


_PROVIDER_CACHE: dict[int, HashProvider] = {}


def get_provider(n: int) -> HashProvider:
    """Process-wide provider cache (table construction is the expensive part)."""
    if n not in _PROVIDER_CACHE:
        _PROVIDER_CACHE[n] = HashProvider(n)
    return _PROVIDER_CACHE[n]
