"""Export sinks, HyDRA/rofl, SimHash/ANN similarity, multimodal plumbing,
and the streaming metrics aggregation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from texrex_spark.clean.hydra import Unigrams, dehyphenate
from texrex_spark.clean.rofl import fix_runons
from texrex_spark.operators import export, multimodal, similarity, textops


# ---------------- hydra / rofl ----------------


def test_hydra_decisions():
    uni = Unigrams({"unterwerfen": 50, "unter-werfen": 5, "unter-": 10, "werfen": 10,
                    "tele-fon": 80, "telefon": 3, "tele-": 1, "fon": 2})
    # merger wins: unter- werfen -> unterwerfen
    assert dehyphenate("wir unter- werfen uns", uni) == "wir unterwerfen uns"
    # concat (hyphen kept) wins: tele- fon -> tele-fon
    assert dehyphenate("per tele- fon bitte", uni) == "per tele-fon bitte"
    # a single letter before '-' is not a candidate (left pattern {2,})
    assert dehyphenate("per e- mail bitte", uni) == "per e- mail bitte"
    # unknown pair left alone
    assert dehyphenate("xx- yy", uni) == "xx- yy"
    # German NN-compound fallback -> concatenate (hyphen kept, :471-477)
    assert dehyphenate("Donau- Dampfer", Unigrams({}), german=True) == "Donau-Dampfer"
    # trailing punctuation is carried (the $2 'after' group)
    assert dehyphenate("wir unter- werfen, uns", uni) == "wir unterwerfen, uns"


def test_rofl_runon_fix():
    words = {"ende", "it", "was", "good"}
    assert fix_runons("ende.It was", words) == "ende. It was"
    # unknown halves untouched
    assert fix_runons("xyz.Abc def", words) == "xyz.Abc def"
    # ignore lists respected
    assert fix_runons("ende.It", words, prefix_ignore={"ende"}) == "ende.It"


# ---------------- export sinks ----------------


@pytest.fixture(scope="module")
def cleaned_df(spark):
    from texrex_spark.clean.chain import ChainConfig, clean_docs
    from texrex_spark.sources import synth

    corpus = synth.generate(n_hosts=5, n_docs=30, seed=21)
    df = synth.docs_df(spark, corpus).select("doc_id", "url", "raw_html")
    return clean_docs(df, ChainConfig(use_assessment=False, shingle_hashes=8)).cache()


def test_xml_corpus(spark, cleaned_df):
    xml = export.xml_corpus(cleaned_df).collect()
    assert len(xml) > 0
    doc = xml[0]["xml"]
    assert doc.startswith("<doc url=") and doc.endswith("</doc>")
    assert '<div idx="' in doc
    assert 'host="' in doc and 'bdc="' in doc


def test_links_shingles_tokens_sinks(spark, cleaned_df):
    links = export.links_sink(cleaned_df)
    assert {"src_url", "link", "relation", "badness"} <= set(links.columns)
    assert links.count() > 0
    sh = export.shingles_sink(cleaned_df)
    assert sh.columns == ["minhash", "doc_id", "doc_size"]
    per_doc = sh.groupBy("doc_id").count().collect()
    assert all(r["count"] == 8 for r in per_doc)  # 8 hashes configured
    toks = export.tokens_sink(cleaned_df, top_k=5)
    assert toks.groupBy("doc_id").count().agg(F.max("count")).first()[0] <= 5


def test_cowinterleave(spark, cleaned_df):
    rows = export.cowinterleave(cleaned_df).collect()
    assert len(rows) > 0
    assert all("\n" not in r["line"] and "\t" not in r["line"] for r in rows)


# ---------------- textops: simhash / dedup ----------------


def test_simhash_properties():
    a = textops.simhash64("the quick brown fox jumps over the lazy dog".split())
    b = textops.simhash64("the quick brown fox jumps over the lazy cat".split())
    c = textops.simhash64("completely different words entirely unrelated".split())
    ham = lambda x, y: bin((x ^ y) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(a, b) < ham(a, c)
    assert textops.simhash64([]) == 0
    assert a == textops.simhash64("the quick brown fox jumps over the lazy dog".split())


def test_hamming_neardup_spark(spark):
    base = textops.simhash64("some moderately long text about crawling".split())
    flip = np.int64(base) ^ np.int64(1 << 5)  # distance 1
    far = textops.simhash64("unrelated content with other tokens".split())
    df = spark.createDataFrame(
        [("a", int(base)), ("b", int(flip)), ("c", int(far))],
        "doc_id string, simhash long",
    )
    pairs = textops.hamming_neardup(df, max_distance=3).collect()
    assert [(p["doc_a"], p["doc_b"], p["hamming"]) for p in pairs] == [("a", "b", 1)]


def test_exact_dedup_spark(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], ["doc_id", "text"]
    )
    kept = textops.exact_dedup(df).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 3]


# ---------------- similarity: exact + LSH ----------------


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(4)
    base = rng.normal(0, 1, (40, 16)).astype(np.float32)
    base[1] = base[0] + rng.normal(0, 0.01, 16).astype(np.float32)  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_cosine_topk(spark, emb_df):
    q = emb_df.where(F.col("vec_id") == 0)
    top = similarity.cosine_topk(emb_df, q, k=3).orderBy("rnk").collect()
    assert top[0]["vec_id"] == 1  # the planted near-duplicate
    assert top[0]["cos"] > 0.99


def test_lsh_neardup_finds_planted_pair(spark, emb_df):
    pairs = similarity.lsh_neardup(
        emb_df, bands=8, bits=8, threshold=0.95, dim=16
    ).collect()
    assert ("a" or True)  # structure check below
    found = {(p["vec_a"], p["vec_b"]) for p in pairs}
    assert (0, 1) in found


# ---------------- multimodal plumbing ----------------


def test_multimodal_pipeline(spark, cleaned_df):
    media = multimodal.synth_media_df(spark, cleaned_df)
    n = media.count()
    assert n > 0
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == n
    assert all(0 <= f["mean_intensity"] <= 255 for f in feats)
    resized = multimodal.resize_stub(media, 8, 8)
    r = resized.first()
    assert r["meta"]["width"] == 8 and len(r["payload"]) == 64
    # deterministic payloads
    again = multimodal.synth_media_df(spark, cleaned_df)
    a = {r["media_ref"]: bytes(r["payload"]) for r in media.collect()}
    b = {r["media_ref"]: bytes(r["payload"]) for r in again.collect()}
    assert a == b


# ---------------- streaming metrics ----------------


def test_fetch_metrics_stream(spark, tmp_path):
    from texrex_spark.streaming.stream_crawl import fetch_metrics_stream

    src = str(tmp_path / "events")
    spark.createDataFrame(
        [
            ("h1.example", "2024-01-01 00:00:10", 1000, True),
            ("h1.example", "2024-01-01 00:00:20", 2000, True),
            ("h2.example", "2024-01-01 00:00:30", 500, False),
        ],
        "host string, fetched_at_s string, bytes long, valid boolean",
    ).withColumn("fetched_at", F.to_timestamp("fetched_at_s")).drop(
        "fetched_at_s"
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "host string, bytes long, valid boolean, fetched_at timestamp"
    ).parquet(src)
    agg = fetch_metrics_stream(stream, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("fetch_metrics")
        .outputMode("append")  # append emits only watermark-closed windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode with a finite source emits nothing until watermark close;
    # use complete-mode snapshot instead for assertion
    q2 = (
        fetch_metrics_stream(stream)
        .writeStream.format("memory")
        .queryName("fetch_metrics_c")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql("SELECT * FROM fetch_metrics_c").collect()
    got = {r["host"]: (r["fetches"], r["bytes"]) for r in rows}
    assert got["h1.example"] == (2, 3000)
    assert got["h2.example"] == (1, 500)


def test_streaming_crawl_driver(spark, tmp_path):
    """Rate-source-driven supersteps: the streaming face of the scheduler.
    Three ticks must crawl the same URLs one batch run of 3 rounds does."""
    from texrex_spark.operators.frontier import FrontierConfig, FrontierScheduler
    from texrex_spark.sources import synth
    from texrex_spark.streaming.stream_crawl import run_streaming_crawl

    corpus = synth.generate(n_hosts=6, n_docs=60, seed=13)
    docs = synth.docs_df(spark, corpus)
    robots = synth.robots_df(spark, corpus)
    seeds = synth.seeds_df(spark, corpus).selectExpr(
        "url", "CAST(seed_idx AS LONG) AS priority"
    )

    cfg = FrontierConfig(seen_partitions=4, bloom_error_rate=1e-4, round_seconds=100)
    stream_sched = FrontierScheduler(spark, cfg, str(tmp_path / "stream"))
    metrics = run_streaming_crawl(
        spark, stream_sched, seeds, docs, robots, rounds=3, timeout_sec=240
    )
    assert len(metrics) == 3
    stream_fetched = stream_sched.seen.stats()["adds"]

    batch_sched = FrontierScheduler(spark, cfg, str(tmp_path / "batch"))
    batch_sched.run(seeds, docs, robots, rounds=3)
    batch_fetched = batch_sched.seen.stats()["adds"]
    assert stream_fetched == batch_fetched


def test_dedup_stream_matches_batch_key(spark, tmp_path):
    """Streaming exact-dedup (dropDuplicatesWithinWatermark on the Rabin
    fingerprint) keeps exactly one survivor per distinct content, the
    same key the batch perfect-dup detector uses."""
    from texrex_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "sdocs")
    rows = [
        (1, "alpha beta gamma", "2024-01-01 00:00:01"),
        (2, "alpha   beta\tgamma", "2024-01-01 00:00:02"),  # ws-normalized dup
        (3, "delta epsilon", "2024-01-01 00:00:03"),
        (4, "alpha beta gamma", "2024-01-01 00:00:04"),     # exact dup
        (5, "zeta eta", "2024-01-01 00:00:05"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).withColumn("ingested_at", F.to_timestamp("ts")).drop("ts").write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, ingested_at timestamp"
    ).parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sdedup").collect()
    # 5 docs, 3 distinct contents (1/2/4 share a fingerprint)
    assert len(out) == 3
    assert len({r["fp"] for r in out}) == 3
    surviving_texts = {" ".join(r["text"].split()) for r in out}
    assert surviving_texts == {"alpha beta gamma", "delta epsilon", "zeta eta"}


def test_dedup_class_key_matches_fingerprint_ws_class(spark):
    """The q_dedup_stream class key (Spark regex + DuckDB regex) collapses
    EXACTLY the whitespace set the engine fingerprint collapses (Python
    str.split semantics) — texts differing only by \\x85/\\xa0/U+2028-class
    whitespace must land in ONE class on all three engines (ADVICE r03 #5)."""
    import duckdb

    from texrex_spark.plans.queries import _PY_WS_DUCK, _PY_WS_SPARK

    texts = [
        "alpha\x85beta",        # NEL
        "alpha\xa0beta",        # NBSP
        "alpha beta",      # line separator
        "alpha \t beta",
        "\u3000alpha beta\u3000",
        "alpha beta",
        "alpha\x1cbeta",        # FS control, isspace in Python
        "gamma  delta ",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    spark_norm = [
        r[0]
        for r in df.select(
            F.trim(F.regexp_replace("text", _PY_WS_SPARK, " "))
        ).collect()
    ]
    con = duckdb.connect()
    duck_norm = [
        con.execute(
            "SELECT trim(regexp_replace(?, ?, ' ', 'g'), ' ')", [t, _PY_WS_DUCK]
        ).fetchone()[0]
        for t in texts
    ]
    py_norm = [" ".join(t.split()) for t in texts]
    assert spark_norm == py_norm
    assert duck_norm == py_norm
    # every codepoint Python str.split collapses is in the class, and none more
    import re

    cover = [chr(c) for c in range(0x11000) if chr(c).isspace()]
    for ch in cover:
        assert re.fullmatch(_PY_WS_SPARK, ch), hex(ord(ch))
