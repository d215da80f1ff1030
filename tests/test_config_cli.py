"""INI config binding (texrex_spark/config.py) + the CLI subcommands
(python -m texrex_spark ...), end-to-end on a synthetic corpus."""

import os

import pytest

from texrex_spark.__main__ import main as cli_main
from texrex_spark.config import chain_config_from_ini, parse_ini

REF_INI = "/root/reference/data/texrex.ini"

MINI_INI = """
[TTrWorkerPool]
UseSimpleFilter=1
UseDeboilerplater=0
UseTextAssessmentMulti=0
UseShingler=1
UseNormalizer=1
UseDivDeduplicator=1

[TTrHtmlStripper]
MinimalLinkLength=20
MaximalLinkLength=512

[TTrSimpleDocumentFilter]
DivThreshold=2
SizeThreshold=50

[TTrSecondPass]
CleanseHashtag=1
EmailReplacer="emailblank"

[TTrShingler]
HashesNumber=25

[TTrNormalizer]
ReplacementFile="utf8.norm"
"""


def test_parse_ini_typing():
    ini = parse_ini('[A]\nX=1\nY=0.5\nZ="q|r"\n# c\nW=plain\n')
    assert ini["A"] == {"X": 1, "Y": 0.5, "Z": "q|r", "W": "plain"}


def test_reference_ini_binds_full_chain():
    """The reference's shipped job file maps onto ChainConfig with its
    trained artifacts loaded and its scheduler keys reported ignored."""
    if not os.path.exists(REF_INI):
        pytest.skip("reference data dir absent")
    job = chain_config_from_ini(REF_INI)
    c = job.chain
    assert c.use_deboilerplater and c.boilerplate_net is not None
    assert c.use_assessment and len(c.profiles) == 4
    assert c.shingle_hashes == 100
    assert len(c.norm_replacements) > 100
    assert c.boilerplate.threshold == 0.55
    assert c.secondpass.cleanse_hashtag is False  # CleanseHashtag=0
    assert c.secondpass.email_replacer == "emailblank"
    assert c.stripper.minimal_link_length == 16
    assert c.use_simple_filter and c.simple_size_threshold == 1000
    assert any(k.startswith("TTrApplication.") for k in job.ignored_keys)
    assert "TTrWorkerPool.WorkerNumber" in job.ignored_keys
    assert job.writer.get("WriteTokens") == 1


def test_mini_ini_overrides():
    job = chain_config_from_ini(MINI_INI)
    c = job.chain
    assert not c.use_deboilerplater and not c.use_assessment
    assert c.shingle_hashes == 25
    assert c.stripper.minimal_link_length == 20
    assert c.simple_size_threshold == 50
    assert c.secondpass.cleanse_hashtag is True


def test_cli_clean_tender_tecl_roundtrip(spark, tmp_path):
    """clean -> tender -> tecl -> cowinterleave -> cowsplit through the
    CLI entry, sharing the test session (the CLI must not stop it)."""
    from texrex_spark.sources import synth

    corpus = synth.generate(n_hosts=6, n_docs=60, seed=99)
    docs = synth.docs_df(spark, corpus).select("doc_id", "url", "raw_html")
    src = str(tmp_path / "src")
    docs.write.parquet(src)

    ini_path = str(tmp_path / "job.ini")
    with open(ini_path, "w") as f:
        f.write(MINI_INI)

    out = str(tmp_path / "out")
    rc = cli_main(
        ["clean", "--ini", ini_path, "--input", src, "--output", out, "--xml",
         "--quiet"]
    )
    assert rc == 0
    cleaned = spark.read.parquet(os.path.join(out, "docs"))
    assert cleaned.count() > 0
    assert "spans" in cleaned.columns and "fingerprint" in cleaned.columns
    xml = spark.read.text(os.path.join(out, "xml"))
    n_doc_tags = xml.where(xml.value.startswith("<doc")).count()
    assert n_doc_tags == cleaned.count()

    bl = str(tmp_path / "bl")
    assert cli_main(["tender", "--input", os.path.join(out, "docs"),
                     "--output", bl, "--min-shared", "3"]) == 0
    surv = str(tmp_path / "surv")
    assert cli_main(["tecl", "--input", os.path.join(out, "docs"),
                     "--blacklist", bl, "--output", surv, "--uniqids"]) == 0
    n_surv = spark.read.parquet(surv).count()
    n_bl = spark.read.parquet(bl).count()
    assert n_surv == cleaned.count() - n_bl

    flat = str(tmp_path / "flat")
    assert cli_main(["cowinterleave", "--input", os.path.join(out, "docs"),
                     "--output", flat]) == 0
    assert spark.read.parquet(flat).count() >= cleaned.count()

    parts = str(tmp_path / "parts")
    assert cli_main(["cowsplit", "--input", flat, "--output", parts,
                     "--max-records", "40"]) == 0
    import glob

    # one parquet file per greedy bucket, under _part=<salt>-<seq>/ dirs
    files = glob.glob(os.path.join(parts, "_part=*", "part-*"))
    assert files
    back = spark.read.parquet(parts)
    assert back.drop("_part").count() == spark.read.parquet(flat).count()
    # cowsplit contract: a document never straddles two files, and a file
    # exceeds the cap only by the tail of the doc it finishes
    from pyspark.sql import functions as SF

    per_doc = back.select("doc_id", SF.input_file_name().alias("f"))
    assert (
        per_doc.groupBy("doc_id").agg(SF.countDistinct("f").alias("nf"))
        .agg(SF.max("nf")).collect()[0][0] == 1
    )
    max_doc = back.groupBy("doc_id").count().agg(SF.max("count")).collect()[0][0]
    max_file = per_doc.groupBy("f").count().agg(SF.max("count")).collect()[0][0]
    assert max_file <= 40 + max_doc - 1
    # spark session still alive and usable after all CLI calls
    assert spark.range(3).count() == 3


def test_cli_synth_crawl_resume(spark, tmp_path):
    """synth -> crawl (3 rounds, snapshotting) -> crawl --resume (2 more):
    the resumed run continues the round counter and dedups against the
    restored seen-set, all through the CLI entry."""
    import json

    web = str(tmp_path / "web")
    assert cli_main(["synth", "--output", web, "--hosts", "8",
                     "--docs", "150", "--seeds", "12"]) == 0
    work = str(tmp_path / "work")
    base = ["crawl", "--work-dir", work, "--seeds", f"{web}/seeds.parquet",
            "--docs", f"{web}/docs.parquet", "--robots", f"{web}/robots.parquet",
            "--seen-partitions", "4", "--snapshot-every", "1", "--quiet"]
    assert cli_main(base + ["--rounds", "3"]) == 0
    first = {r["url_norm"] for r in spark.read.parquet(f"{work}/fetched").collect()}
    assert first
    assert cli_main(base + ["--rounds", "2", "--resume"]) == 0
    second = {r["url_norm"] for r in spark.read.parquet(f"{work}/fetched").collect()}
    # resumed rounds fetch only URLs the first run never saw
    assert not (first & second)
    rounds = [m["round"] for m in json.load(open(f"{work}/metrics.json"))]
    assert rounds and rounds[0] >= 3  # counter carried across the resume

    # status (the texcomm console counterpart): reads the same work dir,
    # no Spark session, prints rounds + latest snapshot lineage
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli_main(["status", "--work-dir", work]) == 0
    out = buf.getvalue()
    assert "rounds completed : 2" in out  # resumed run rewrote metrics.json
    assert "snapshot " in out and "frontier:" in out and "bucket bitmaps" in out


def test_cli_crawl_cuckoo_seen_filter(spark, tmp_path):
    """--seen-filter cuckoo runs the scheduler on cuckoo buckets; the
    fetched set still dedups exactly (and the buckets support retract)."""
    web = str(tmp_path / "web")
    assert cli_main(["synth", "--output", web, "--hosts", "6",
                     "--docs", "120", "--seeds", "10"]) == 0
    work = str(tmp_path / "work")
    assert cli_main(["crawl", "--work-dir", work,
                     "--seeds", f"{web}/seeds.parquet",
                     "--docs", f"{web}/docs.parquet",
                     "--robots", f"{web}/robots.parquet",
                     "--rounds", "3", "--seen-partitions", "4",
                     "--seen-filter", "cuckoo", "--quiet"]) == 0
    fetched = spark.read.parquet(f"{work}/fetched")
    urls = [r.url_norm for r in fetched.collect()]
    assert urls and len(urls) == len(set(urls))
    import glob
    import pickle

    bucket = sorted(glob.glob(f"{work}/seen/bucket-*.pkl"))[0]
    with open(bucket, "rb") as f:
        assert pickle.load(f)["kind"] == "cuckoo"


def test_cli_hydra_rofl_arcxi(spark, tmp_path):
    """The remaining reference binaries as subcommands: hydra (unigram
    de-hyphenation), rofl (run-on resplit with the reference's shipped
    word lists), arcxi (TARC random-access extraction as filter+select)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "txt")
    spark.createDataFrame(
        [(1, "zei- tung lesen"), (2, "the end.This continues here"), (3, "plain line")],
        "doc_id bigint, text string",
    ).write.parquet(src)

    uni = str(tmp_path / "uni.txt")
    with open(uni, "w") as f:
        f.write("zeitung\t50\nzei\t1\ntung\t1\nlesen\t10\n")
    hydra_out = str(tmp_path / "hydra_out")
    assert cli_main(["hydra", "--input", src, "--output", hydra_out,
                     "--unigrams", uni]) == 0
    texts = {r.doc_id: r.text for r in spark.read.parquet(hydra_out).collect()}
    assert texts[1] == "zeitung lesen"

    if os.path.exists("/root/reference/data/en.words"):
        rofl_out = str(tmp_path / "rofl_out")
        assert cli_main(["rofl", "--input", src, "--output", rofl_out]) == 0
        texts = {r.doc_id: r.text for r in spark.read.parquet(rofl_out).collect()}
        assert "end. This" in texts[2]

    tarc = str(tmp_path / "tarc")
    spark.createDataFrame(
        [(1, "http://a.example/x", bytearray(b"<html>a</html>"), 14),
         (2, "http://b.example/y", bytearray(b"<html>b</html>"), 14)],
        "doc_id bigint, url string, raw binary, raw_length int",
    ).write.parquet(tarc)
    ax_out = str(tmp_path / "ax_out")
    assert cli_main(["arcxi", "--input", tarc, "--output", ax_out,
                     "--ids", "2"]) == 0
    rows = spark.read.parquet(ax_out).collect()
    assert len(rows) == 1 and rows[0].html == "<html>b</html>"
