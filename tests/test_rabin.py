"""Rabin-64 kernel tests.

The table-driven kernel is checked against an independent bit-at-a-time
GF(2) polynomial-division implementation of the same public construction
(Sean Owen's rabinhash; reference semantics trrabinhash.pas:207-250):
for messages of >= 8 bytes the hash is the residue of the message bit
polynomial modulo the degree-64 polynomial; shorter messages are the raw
big-endian value of the starter bytes (never reduced).
"""

import numpy as np
import pytest

from texrex_spark.functions.poly64 import POLYS64
from texrex_spark.functions.rabin import HashProvider, Rabin64, get_provider

MASK = (1 << 64) - 1


def slow_rabin(data: bytes, poly: int) -> int:
    """Bitwise long division in GF(2); independent of the table kernel."""
    w = 0
    starter = len(data) % 8
    for b in data[:starter]:
        w = ((w << 8) & MASK) ^ b
    for block_start in range(starter, len(data), 8):
        # shift W left by 64 bits modulo (x^64 + poly), one bit at a time
        for _ in range(64):
            high = w >> 63
            w = (w << 1) & MASK
            if high:
                w ^= poly
        w ^= int.from_bytes(data[block_start : block_start + 8], "big")
    return w


@pytest.mark.parametrize("poly_idx", [0, 1, 2, 3, 4, 99])
def test_matches_bitwise_division(poly_idx):
    r = Rabin64(POLYS64[poly_idx])
    cases = [
        b"a",
        b"abcdefg",
        b"abcdefgh",
        b"abcdefghi",
        b"http://example.com/path?q=1",
        bytes(range(256))[:40],
        "päge-ünïcode".encode("utf-8"),
        b"x" * 64,
    ]
    for data in cases:
        assert r.hash(data) == slow_rabin(data, POLYS64[poly_idx]), data


def test_short_strings_are_raw_value():
    # < 8 bytes -> starter loop only, no reduction (trrabinhash.pas:222-232)
    r = Rabin64(POLYS64[0])
    assert r.hash(b"A") == ord("A")
    assert r.hash(b"AB") == (ord("A") << 8) | ord("B")


def test_batch_matches_scalar():
    p = HashProvider(10)
    keys = [b"alpha", b"beta", b"gamma-longer-key", b"", b"12345678", b"123456789"]
    batch = p.hash_batch(keys)
    assert batch.shape == (6, 10)
    for i, k in enumerate(keys):
        if not k:
            assert (batch[i] == 0).all()
            continue
        for j in range(10):
            assert int(batch[i, j]) == p.hash(k, j)


def test_provider_deterministic_across_instances():
    a = HashProvider(5).hash_all(b"determinism")
    b = HashProvider(5).hash_all(b"determinism")
    assert (a == b).all()
    assert get_provider(5) is get_provider(5)


def test_distinct_polynomials_give_distinct_hashes():
    p = HashProvider(100)
    h = p.hash_all(b"the quick brown fox jumps over the lazy dog")
    assert len(set(h.tolist())) == 100


def test_equal_length_matrix_path():
    r = Rabin64(POLYS64[7])
    keys = [b"aaaaaaaaaaaa", b"bbbbbbbbbbbb", b"cccccccccccc"]
    mat = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(3, 12)
    out = r.hash_matrix(mat)
    for i, k in enumerate(keys):
        assert int(out[i]) == r.hash(k)

def test_alphabet_compaction_paths_match_block_kernel():
    """The alphabet-compacted position-table path (rabin._PosTables.
    compact_for) must be bit-identical to the block-serial oracle across
    its state transitions: first narrow-alphabet batch, alphabet growth,
    a second key length sharing the compacted twin, the >cap fallback
    that turns compaction off, and post-off batches."""
    from texrex_spark.functions import rabin

    p = HashProvider(20)
    rng = np.random.default_rng(11)
    narrow = np.frombuffer(b"ABCDEFGHIJKLMNOPQRSTUVWXYZ ", dtype=np.uint8)
    wide = np.frombuffer(bytes(range(256)), dtype=np.uint8)

    def check(mat):
        got = p.hash_matrix(mat)
        want = rabin._hash_matrix_multi(mat, p.tables).T
        assert np.array_equal(got, want)

    check(narrow[rng.integers(0, 27, size=(500, 45))])     # build twin
    assert p._pos._cc is not None and not p._pos._compact_off
    mixed = np.concatenate([narrow, np.frombuffer(b"0123456789", dtype=np.uint8)])
    check(mixed[rng.integers(0, 37, size=(500, 45))])      # alphabet grows
    assert len(p._pos._alpha) == 37
    check(mixed[rng.integers(0, 37, size=(200, 17))])      # second length, shared twin
    check(mixed[rng.integers(0, 37, size=(200, 88))])      # longer key grows cc rows
    check(wide[rng.integers(0, 256, size=(200, 45))])      # cap exceeded
    assert p._pos._compact_off and p._pos._cc is None
    check(narrow[rng.integers(0, 27, size=(200, 45))])     # still correct after off


def test_leading_zero_invariance():
    # Rabin-64 is the remainder of the key as a GF(2) polynomial, so
    # front-NUL padding never changes it — the property Rabin64.hash_batch
    # relies on to pad variable-length keys to one matrix width.
    r = Rabin64(POLYS64[3])
    for s in [b"a", b"hello", b"abcdefgh", b"abcdefghi", b"x" * 37]:
        for pad in (1, 5, 8, 13):
            assert r.hash(b"\x00" * pad + s) == r.hash(s)


def test_rabin64_hash_batch_matches_scalar():
    r = Rabin64(POLYS64[0])
    keys = [
        b"", b"a", b"short", b"exactly8", b"nine-byte",
        b"a much longer div text with some repetition " * 3,
        b"x" * 513,  # over _BATCH_MAX_LEN -> scalar fallback inside
        b"short",     # duplicate
    ]
    assert r.hash_batch(keys) == [r.hash(k) for k in keys]
    big = [f"div text number {i}".encode() for i in range(200)]
    assert r.hash_batch(big) == [r.hash(k) for k in big]
