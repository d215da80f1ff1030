"""Cuckoo filter kernel + partitioned seen-set integration.

Contract mirrors functions/bloom.py's ScalingBloomFilter where they
overlap (bulk add/check, state round-trip, per-bucket persistence) and
adds the cuckoo-only delete path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from texrex_spark.functions.cuckoo import CuckooFilter
from texrex_spark.operators.seenset import PartitionedSeenSet


def _keys(n, prefix="http://h"):
    return sorted({f"{prefix}{i}.example/p{i}".encode() for i in range(n)})


def test_no_false_negatives_and_new_mask():
    f = CuckooFilter(20000)
    ks = _keys(10000)
    new = f.add_bulk(ks)
    assert new.all()
    assert f.check_bulk(ks).all()
    again = f.add_bulk(ks)
    assert not again.any()
    assert f.adds == 10000 and f.rejects == 10000


def test_false_positive_rate_bounded():
    f = CuckooFilter(20000)
    f.add_bulk(_keys(10000))
    fresh = _keys(20000, prefix="http://x")
    fp = int(f.check_bulk(fresh).sum())
    # 16-bit fingerprints, 2 buckets x 4 slots: theory ~ 8/2^16 ~ 1.2e-4
    assert fp / len(fresh) < 1e-3


def test_delete_restores_unseen():
    f = CuckooFilter(5000)
    ks = _keys(2000)
    f.add_bulk(ks)
    done = f.delete_bulk(ks[:500])
    assert done.all()
    assert not f.check_bulk(ks[:500]).any()
    assert f.check_bulk(ks[500:]).all()


def test_state_roundtrip_and_determinism():
    a, b = CuckooFilter(5000), CuckooFilter(5000)
    ks = _keys(3000)
    a.add_bulk(ks)
    b.add_bulk(ks)
    assert a.table.tobytes() == b.table.tobytes()  # same sequence -> same state
    c = CuckooFilter.from_state(a.state())
    assert c.check_bulk(ks).all()
    assert c.m == a.m and c.adds == a.adds


def test_high_load_stash_and_is_full():
    f = CuckooFilter(1000)  # m*4*0.95 >= 1000 -> m=512, 2048 slots
    ks = _keys(2040)  # ~99.6% load forces kicks and possibly stash
    f.add_bulk(ks)
    assert f.check_bulk(ks).all()  # stash entries still found
    assert f.load_factor > 0.9


def test_seenset_cuckoo_roundtrip(spark, tmp_path):
    ss = PartitionedSeenSet(
        str(tmp_path / "seen"), partitions=4,
        filter_kind="cuckoo", cuckoo_capacity_per_bucket=10_000,
    )
    urls = spark.range(300).select(
        F.concat(F.lit("http://s"), (F.col("id") % 13).cast("string"),
                 F.lit(".example/"), F.col("id").cast("string")).alias("url_norm")
    )
    r1 = ss.check_and_add(urls)
    assert r1.where("seen").count() == 0 and r1.count() == 300
    r2 = ss.check_and_add(urls)
    assert r2.where("NOT seen").count() == 0
    # retract a third, then probe: only those become unseen again
    third = urls.where(F.substring_index("url_norm", "/", -1).cast("long") % 3 == 0)
    n_third = third.count()
    deleted = ss.retract(third)
    assert deleted.where("deleted").count() == n_third
    probe = ss.probe(urls)
    assert probe.where("NOT seen").count() == n_third
    st = ss.stats()
    assert st["buckets"] == 4 and st["adds"] == 300


def test_seenset_bloom_retract_raises(spark, tmp_path):
    ss = PartitionedSeenSet(str(tmp_path / "seenb"), partitions=2)
    urls = spark.range(10).select(
        F.concat(F.lit("http://b.example/"), F.col("id").cast("string")).alias(
            "url_norm"
        )
    )
    ss.check_and_add(urls).count()
    with pytest.raises(Exception):
        ss.retract(urls).count()


def test_seenset_retract_flags_all_duplicate_rows(spark, tmp_path):
    """Duplicate url_norm values in a retract batch delete ONE stored
    copy but every row carrying that URL gets deleted=true, so row
    counts over the flag are stable under input duplication."""
    from texrex_spark.operators.seenset import PartitionedSeenSet

    ss = PartitionedSeenSet(
        str(tmp_path / "seen"), partitions=2,
        filter_kind="cuckoo", cuckoo_capacity_per_bucket=1000,
    )
    urls = spark.range(20).select(
        F.concat(F.lit("http://dup.example/"), F.col("id").cast("string")).alias(
            "url_norm"
        )
    )
    ss.check_and_add(urls).count()
    doubled = urls.unionByName(urls)
    deleted = ss.retract(doubled)
    assert deleted.where("deleted").count() == 40  # every duplicate row flagged
    assert ss.probe(urls).where("NOT seen").count() == 20  # one copy deleted each
