"""Bloom filter parity tests (sizing formulas, add/check, scaling growth)."""

import math

from texrex_spark.functions.bloom import (
    BloomFilter,
    ScalingBloomFilter,
    calc_bits_needed,
    hash_function_count,
)


def test_sizing_formulas():
    # m = trunc(-(n ln p)/ln(2)^2)+1 ; k = round((m/n) ln 2)  (trbloom.pas:241-294)
    m = calc_bits_needed(1000, 0.01)
    assert m == int(-(1000 * math.log(0.01)) / (math.log(2) ** 2)) + 1
    assert m == 9586
    k = hash_function_count(m, 1000)
    assert k == round((m / 1000) * math.log(2)) == 7
    # the crawler's configuration: error 1e-6 (trwalkers.pas:486)
    m6 = calc_bits_needed(10_000, 1e-6)
    assert hash_function_count(m6, 10_000) == 20


def test_add_check_reject():
    f = BloomFilter(1000, 0.001)
    assert not f.check(b"http://a.example/")
    assert f.add(b"http://a.example/") is True
    assert f.check(b"http://a.example/")
    assert f.add(b"http://a.example/") is False  # rejected, counted
    assert f.adds == 1 and f.rejects == 1


def test_no_false_negatives_and_low_false_positives():
    f = BloomFilter(2000, 0.001)
    keys = [f"http://h{i}.example/p/{i}" for i in range(2000)]
    for k in keys:
        assert f.add(k.encode()) is True
    for k in keys:
        assert f.check(k.encode())
    fp = sum(f.check(f"http://other{i}.example/x".encode()) for i in range(5000))
    assert fp <= 25  # ~0.1% target; generous bound


def test_batch_add_matches_sequential():
    keys = [f"u{i % 700}".encode() for i in range(1000)]  # contains repeats
    a = BloomFilter(5000, 0.001)
    seq = [a.add(k) for k in keys]
    b = BloomFilter(5000, 0.001)
    batch = b.add_batch(keys)
    assert seq == batch.tolist()
    assert (a.bits == b.bits).all()


def test_determinism_is_structural():
    # same (n, p, key set, order) -> identical bitmaps in separate instances
    a, b = BloomFilter(500, 0.01), BloomFilter(500, 0.01)
    for i in range(300):
        a.add(f"k{i}".encode())
        b.add(f"k{i}".encode())
    assert (a.bits == b.bits).all()


def test_scaling_growth():
    s = ScalingBloomFilter(0.01)  # initial capacity round(1/p) = 100
    assert s.filters[0].expected_members == 100
    for i in range(1000):
        s.add(f"key-{i}".encode())
    assert s.scalings >= 1  # grew at least once
    # capacities double: 100, 200, 400, ...
    caps = [f.expected_members for f in s.filters]
    assert all(caps[i + 1] == caps[i] * 2 for i in range(len(caps) - 1))
    # no false negatives across sub-filters
    assert all(s.check(f"key-{i}".encode()) for i in range(1000))
    # re-adding anything is a reject
    assert s.add(b"key-0") is False


def test_scaling_memory_cap():
    s = ScalingBloomFilter(0.01, max_memory_mb=0)  # cap below first growth
    for i in range(500):
        s.add(f"key-{i}".encode())
    assert s.out_of_memory
    assert s.scalings == 0


def test_state_roundtrip():
    s = ScalingBloomFilter(0.01)
    for i in range(400):
        s.add(f"key-{i}".encode())
    s2 = ScalingBloomFilter.from_state(s.state())
    assert s2.adds == s.adds and s2.scalings == s.scalings
    assert all(s2.check(f"key-{i}".encode()) for i in range(400))
    assert s2.add(b"key-7") is False
    assert s2.add(b"brand-new") is True


def test_bulk_add_matches_sequential_on_distinct_keys():
    keys = [f"http://h{i}.example/{i}".encode() for i in range(3000)]
    seq = BloomFilter(5000, 0.001)
    seq_res = [seq.add(k) for k in keys]
    blk = BloomFilter(5000, 0.001)
    blk_res = blk.add_bulk(blk.hash_indices(keys))
    assert seq_res == blk_res.tolist()
    assert (seq.bits == blk.bits).all()
    # second bulk pass: everything rejected
    again = blk.add_bulk(blk.hash_indices(keys))
    assert not again.any()


def test_scaling_bulk_add_grows_and_dedups():
    s = ScalingBloomFilter(0.01)
    # realistic URL-length keys: Rabin degrades for keys < 8 bytes (the
    # starter-byte path never mixes; faithful to the reference algorithm)
    keys = [f"http://h{i % 97}.example/page/{i}".encode() for i in range(2000)]
    new = s.add_bulk(keys)
    # false "seen" compound across the scaling chain: the reference reuses
    # the same p per sub-filter (trbloom.pas:461-462, no Almeida tightening
    # ratio), so expected error here is ~#filters * p, not p.  At the
    # crawler's p=1e-6 this is negligible; at the test's p=0.01 it is a few
    # percent.
    assert int(new.sum()) >= 1890
    assert s.scalings >= 1
    # membership across chain, vectorized
    assert s.check_bulk(keys).all()
    assert not s.check_bulk([b"never-added-1", b"never-added-2"]).any()
    # re-add: all rejects even across grown filters
    assert not s.add_bulk(keys).any()
