"""Deboilerplater features/MLP, geolocation range join, tender/tecl batch."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from texrex_spark.clean.boilerplate import (
    BoilerplateConfig,
    FannNet,
    deboilerplate,
    div_features,
)
from texrex_spark.clean.geo import GeoBlocks, geolocate, ip_to_int
from texrex_spark.clean.stripper import Div
from texrex_spark.operators.neardup import tecl, tender


def _divs():
    return [
        Div(text="This is a proper sentence with some length. And another one.",
            container="p", open_tags=1, close_tags=1, first_raw=0, last_raw=120),
        Div(text="home | contact | imprint", container="div", anchors=3,
            open_tags=4, close_tags=2, first_raw=120, last_raw=180),
        Div(text="More running text that continues the article with words.",
            container="p", open_tags=1, close_tags=1, first_raw=180, last_raw=300),
    ]


def test_features_shape_and_ranges():
    divs = _divs()
    feats = div_features(divs, "html5", raw_size=400)
    assert feats.shape == (3, 37)
    # all features designed to live in [0, 1]
    assert (feats >= 0).all() and (feats <= 1.0 + 1e-9).all()
    # doctype one-hot: html5 -> index 23
    assert feats[0, 23] == 1.0 and feats[0, 21] == 0.0
    # container one-hot: p -> index 27
    assert feats[0, 27] == 1.0
    # ends-in-punctuation for div 0
    assert feats[0, 20] == 1.0
    # smoothing features populated
    assert feats[1, 35] > 0 and feats[1, 36] > 0


def test_fann_deterministic_net_and_decision():
    divs = _divs()
    net = FannNet.deterministic(seed=7)
    res = deboilerplate(divs, "html5", 400, net, BoilerplateConfig(min_chars_below=10))
    scores = [d.boilerplate_score for d in divs]
    assert all(0.0 <= s <= 1.0 for s in scores)
    net2 = FannNet.deterministic(seed=7)
    divs2 = _divs()
    deboilerplate(divs2, "html5", 400, net2, BoilerplateConfig(min_chars_below=10))
    assert scores == [d.boilerplate_score for d in divs2]
    assert res.boilerplate_divs + res.non_boilerplate_divs == 3


def test_fann_parse_roundtrip():
    # build a tiny net, serialize in FANN_FLO_2.1 shape, parse, compare
    net = FannNet.deterministic(n_in=4, n_hidden=3, seed=1)
    lines = ["FANN_FLO_2.1", "layer_sizes=5 4 2"]
    neurons = []
    for _ in range(5):
        neurons.append("(0, 0, 0.00000000000000000000e+00)")
    for _ in range(3):
        neurons.append("(5, 3, 5.00000000000000000000e-01)")
    neurons.append("(0, 3, 0.00000000000000000000e+00)")  # hidden bias
    neurons.append("(4, 3, 5.00000000000000000000e-01)")  # output neuron
    neurons.append("(0, 3, 0.00000000000000000000e+00)")  # output bias
    lines.append("neurons (num_inputs, activation_function, activation_steepness)=" + " ".join(neurons))
    conns = []
    for j in range(3):
        for k in range(5):
            conns.append(f"({k}, {net.weights[0][k, j]:.20e})")
    for k in range(4):
        conns.append(f"({k + 5}, {net.weights[1][k, 0]:.20e})")
    lines.append("connections (connected_to_neuron, weight)=" + " ".join(conns))
    parsed = FannNet.parse("\n".join(lines))
    x = np.random.default_rng(3).random((5, 4))
    assert np.allclose(parsed.run(x), net.run(x))


def test_geo_ip_to_int_and_lookup():
    assert ip_to_int("1.2.3.4") == (1 << 24) + (2 << 16) + (3 << 8) + 4
    assert ip_to_int("255.255.255.255") == 2**32 - 1
    assert ip_to_int("bogus") == 0 and ip_to_int("1.2.3.999") == 0
    blocks = GeoBlocks(
        lowers=[100, 300, 1000],
        uppers=[199, 350, 2000],
        loc_ids=[1, 2, 3],
        locations={
            1: {"country": "DE", "region": "BE", "city": "Berlin"},
            2: {"country": "FR", "region": "IDF", "city": "Paris"},
            3: {"country": "US", "region": "CA", "city": "SF"},
        },
    )
    ips = np.array([150, 99, 200, 340, 1500, 5000], dtype=np.uint32)
    assert blocks.lookup(ips).tolist() == [1, -1, -1, 2, 3, -1]


def test_geolocate_spark(spark):
    blocks = GeoBlocks(
        lowers=[ip_to_int("10.0.0.0")],
        uppers=[ip_to_int("10.255.255.255")],
        loc_ids=[7],
        locations={7: {"country": "DE", "region": "BY", "city": "Munich"}},
    )
    df = spark.createDataFrame(
        [("a", "10.1.2.3"), ("b", "192.168.0.1")], ["doc_id", "ip"]
    )
    rows = {r["doc_id"]: r for r in geolocate(df, blocks).collect()}
    assert rows["a"]["country"] == "DE" and rows["a"]["city"] == "Munich"
    assert rows["b"]["country"] is None


def test_tender_tecl_golden(spark):
    # crafted fingerprints: doc A and B share 6 of 8 hashes (dup pair,
    # smaller loses), C shares only 2 with A (kept), D is disjoint
    fp = lambda *v: [int(x) for x in v]  # noqa: E731
    docs = spark.createDataFrame(
        [
            ("A", fp(1, 2, 3, 4, 5, 6, 7, 8), 1000),
            ("B", fp(1, 2, 3, 4, 5, 6, 70, 80), 500),   # smaller -> blacklisted
            ("C", fp(1, 2, 30, 40, 50, 60, 71, 81), 800),
            ("D", fp(100, 200, 300, 400, 500, 600, 700, 800), 900),
        ],
        "doc_id string, fingerprint array<long>, doc_size int",
    )
    bl = tender(docs, min_shared=5, max_redundancy=200)
    assert [r["doc_id"] for r in bl.collect()] == ["B"]

    corpus = docs.select("doc_id", "doc_size")
    kept = tecl(corpus, bl)
    assert sorted(r["doc_id"] for r in kept.collect()) == ["A", "C", "D"]
    white = tecl(corpus, bl, white=True)
    assert [r["doc_id"] for r in white.collect()] == ["B"]


def test_tender_redundancy_cap(spark):
    # one hash value shared by many docs: bucket over the cap is skipped
    rows = [(f"doc{i}", [7, 100 + i], 100 + i) for i in range(300)]
    docs = spark.createDataFrame(
        rows, "doc_id string, fingerprint array<long>, doc_size int"
    )
    bl = tender(docs, min_shared=1, max_redundancy=200)
    # hash 7's bucket has 300 docs -> skipped entirely; other hashes unique
    assert bl.count() == 0


def test_tender_ties_and_prior_blacklist(spark):
    docs = spark.createDataFrame(
        [
            ("X", [1, 2, 3, 4, 5], 100),
            ("Y", [1, 2, 3, 4, 5], 100),  # equal size: lexicographically smaller loses
        ],
        "doc_id string, fingerprint array<long>, doc_size int",
    )
    bl = tender(docs, min_shared=5)
    assert [r["doc_id"] for r in bl.collect()] == ["X"]
    # prior blacklist removes X before grouping -> no pairs at all
    prior = spark.createDataFrame([("X",)], ["doc_id"])
    bl2 = tender(docs, min_shared=5, prior_blacklist=prior)
    assert bl2.count() == 0


def test_chain_with_deboilerplater():
    from texrex_spark.clean.chain import ChainConfig, clean_document
    from texrex_spark.sources import synth

    corpus = synth.generate(n_hosts=4, n_docs=20, seed=5)
    cfg = ChainConfig(
        use_assessment=False,
        use_deboilerplater=True,
        boilerplate_net=FannNet.deterministic(seed=11),
        boilerplate=BoilerplateConfig(min_chars_below=50, min_divs_below=1),
    )
    doc = corpus.docs[0]
    r = clean_document(doc.doc_id, doc.url, doc.raw_html, cfg)
    assert r.spans  # pipeline still produces spans
    # deterministic across runs
    r2 = clean_document(doc.doc_id, doc.url, doc.raw_html, cfg)
    assert r.valid == r2.valid and r.spans == r2.spans
