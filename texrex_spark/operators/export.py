"""Output sinks: the reference's writers re-expressed as DataFrame ops
(/root/reference/src/units/trwritetools.pas, trcowinterleaveapplication.pas,
trcowsplitapplication.pas; SURVEY.md §2.1, §2.6).

Everything here is pure Catalyst — XML assembly is ``concat``/``aggregate``
over the spans array, so corpus export stays JVM-side end to end.

- ``xml_corpus``: <doc ...><meta .../><div idx bpc>text</div>... per row
  (TrWriteXmlDoc, trwritetools.pas:81-271); badness grade chars per
  TrBadnessToBdc/TrBoilerToBpc (trutilities.pas:965-976); XML entity
  encoding per TrXmlEncode (:910-921)
- ``links_sink``: (src_url, link, relation) rows (TrWriteLinks :373-416)
- ``shingles_sink``: explode(fingerprint) -> (minhash, doc_id, doc_size)
  (TrWriteShingles :419-441, fixed-width semantics now just columns)
- ``tokens_sink``: per-doc top-k types (TrWriteTokens :274-310)
- ``cowinterleave``: spans -> one line per span with <ci_l/>/<ci_t/>
  placeholders (trcowinterleaveapplication.pas:171-173, 258-322)
- ``cowsplit``: doc-boundary-respecting output splitting == Spark's
  maxRecordsPerFile (trcowsplitapplication.pas:237-261)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def xml_encode(col: Column) -> Column:
    """TrXmlEncode (trutilities.pas:910-921), same replacement order."""
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, '"', "&quot;")
    out = F.regexp_replace(out, "'", "&apos;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def badness_grade(badness: Column) -> Column:
    """TrBadnessToBdc: chr(round(b/2) + 97) (trutilities.pas:965-968)."""
    return F.char(F.round(badness / 2).cast("int") + 97)


def boiler_grade(score: Column) -> Column:
    """TrBoilerToBpc (trutilities.pas:971-976)."""
    return F.when(score <= 0, F.lit("a")).otherwise(
        F.char(F.round(score * 10).cast("int") + 97)
    )


def xml_corpus(
    cleaned: DataFrame,
    doc_attrs: list[str] = ("host", "tld"),
    doc_metas: list[str] = ("title",),
) -> DataFrame:
    """cleaned docs (chain.CLEAN_SCHEMA) -> (doc_id, xml string).

    Text spans become <div idx bpc>; media spans become <media idx
    src=.../> (our interleaved-payload extension)."""
    attr_cols = [
        F.concat(
            F.lit(f' {a}="'),
            F.coalesce(
                F.nullif(xml_encode(F.col("meta").getItem(a)), F.lit("")),
                F.lit("unknown"),
            ),
            F.lit('"'),
        )
        for a in doc_attrs
    ]
    meta_tags = [
        F.when(
            F.col("meta").getItem(m).isNotNull() & (F.col("meta").getItem(m) != ""),
            F.concat(
                F.lit(f'<meta name="{m}" content="'),
                xml_encode(F.col("meta").getItem(m)),
                F.lit('" />'),
            ),
        ).otherwise(F.lit(""))
        for m in doc_metas
    ]
    div_xml = F.aggregate(
        F.col("spans"),
        F.lit(""),
        lambda acc, s: F.concat(
            acc,
            F.when(
                s["kind"] == "text",
                F.concat(
                    F.lit('<div idx="'),
                    s["offset"].cast("string"),
                    F.lit('">'),
                    xml_encode(s["text"]),
                    F.lit("</div>\n"),
                ),
            ).otherwise(
                F.concat(
                    F.lit('<media idx="'),
                    s["offset"].cast("string"),
                    F.lit('" src="'),
                    xml_encode(s["media_ref"]),
                    F.lit('" />\n'),
                )
            ),
        ),
    )
    xml = F.concat(
        F.lit('<doc url="'),
        xml_encode(F.col("url")),
        F.lit('" id="'),
        xml_encode(F.col("doc_id")),
        F.lit('" bdc="'),
        badness_grade(F.col("badness")),
        F.lit('" bdv="'),
        F.round(F.col("badness"), 4).cast("string"),
        F.lit('"'),
        *attr_cols,
        F.lit(">\n"),
        *meta_tags,
        div_xml,
        F.lit("</doc>"),
    )
    return cleaned.where(F.col("valid")).select("doc_id", xml.alias("xml"))


def links_sink(cleaned: DataFrame) -> DataFrame:
    """(src_url, link, relation[, badness]) rows (TrWriteLinks)."""
    return cleaned.where(F.col("valid")).select(
        F.col("url").alias("src_url"),
        F.col("badness"),
        F.explode("links").alias("l"),
    ).select("src_url", F.col("l.url").alias("link"), F.col("l.relation"), "badness")


def shingles_sink(cleaned: DataFrame) -> DataFrame:
    """(minhash, doc_id, doc_size) rows — the tender exchange table."""
    doc_size = F.aggregate(
        F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
        F.lit(0),
        lambda acc, s: acc + F.length(s["text"]),
    )
    return (
        cleaned.where(F.col("valid") & F.col("fingerprint").isNotNull())
        .select("doc_id", doc_size.alias("doc_size"), F.explode("fingerprint").alias("minhash"))
        .select("minhash", "doc_id", "doc_size")
    )


def tokens_sink(cleaned: DataFrame, top_k: int = 10) -> DataFrame:
    """Per-doc top-k token types with counts (TrWriteTokens)."""
    toks = (
        cleaned.where(F.col("valid"))
        .select("doc_id", F.explode(F.filter(F.col("spans"), lambda s: s["kind"] == "text")).alias("s"))
        .select("doc_id", F.explode(F.split(F.upper(F.col("s.text")), r"[^\p{L}]+")).alias("tok"))
        .where(F.col("tok") != "")
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), "tok")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_k)
        .select("doc_id", "tok", "n", "rnk")
    )


def cowinterleave(cleaned: DataFrame) -> DataFrame:
    """One output row per span, self-contained, newlines/tabs escaped to
    <ci_l/>/<ci_t/> (trcowinterleaveapplication.pas:171-173).  Our spans
    array is already the shuffle-safe interleaved record; this export
    flattens it for line-oriented consumers."""
    line = F.when(
        F.col("s.kind") == "text",
        F.regexp_replace(
            F.regexp_replace(F.col("s.text"), "\n", "<ci_l/>"), "\t", "<ci_t/>"
        ),
    ).otherwise(F.concat(F.lit("<media "), F.col("s.media_ref"), F.lit("/>")))
    return (
        cleaned.where(F.col("valid"))
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            line.alias("line"),
        )
    )


def cowsplit_write(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    parallelism: int = 8,
) -> None:
    """Size-capped output splitting that NEVER splits a document.

    Reference semantics (trcowsplitapplication.pas:250-256): roll to the
    next output file only when the record count has reached the cap AND
    the next record starts a new document — so a file may exceed the cap
    by the tail of the document it finishes, but a document never
    straddles two files.  (Spark's ``maxRecordsPerFile`` alone cannot
    express this: it cuts blindly at record boundaries.)

    Distributed shape: per-doc record counts -> hash-salt docs into
    ``parallelism`` independent packers -> per-packer running sum packs
    WHOLE docs into file buckets of ~max_records (a doc whose running
    start falls inside bucket b lands entirely in b) -> one parquet file
    per bucket via ``partitionBy("_part")``.  The window sort is per salt
    group (~n_docs/parallelism rows), never global.

    Parity note: the reference's sequential writer resets its line
    counter on every roll (trcowsplitapplication.pas:227,251-253), so
    after an overflow its next file starts counting from 0, while
    offset-bucketing charges the overflow against the next bucket's
    budget.  Both satisfy the same contract — no document straddles
    files, and a file exceeds the cap only by the tail of the document
    that finishes it (asserted in tests/test_config_cli.py and the
    q_cowinterleave driver row) — but exact file boundaries can differ
    after an oversized document; counter-reset packing is inherently
    sequential and would serialize the sink."""
    counts = df.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    counts = counts.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(parallelism)),
    )
    w = Window.partitionBy("_salt").orderBy("doc_id")
    buckets = counts.withColumn(
        "_start", F.sum("_n").over(w) - F.col("_n")
    ).select(
        "doc_id",
        F.concat_ws(
            "-",
            F.col("_salt"),
            F.floor(F.col("_start") / F.lit(max_records_per_file)).cast("long"),
        ).alias("_part"),
    )
    (
        df.join(buckets, "doc_id")
        .repartition("_part")
        .sortWithinPartitions("_part", "doc_id")
        .write.partitionBy("_part")
        .mode("overwrite")
        .parquet(path)
    )


def tarc_sink(docs: DataFrame) -> DataFrame:
    """TARC-style raw dump (TrWriteTarc, trwritetools.pas:313-369): the
    raw payload with offset/length bookkeeping for random access.  On
    columnar storage the 'offset' is per-file and assigned at write time;
    here we emit (doc_id, url, raw bytes, raw_length) — the extractor
    (arcxi, src/programs/arcxi.pas) becomes a plain filter + select."""
    return docs.select(
        "doc_id",
        "url",
        F.encode(F.col("raw_html"), "UTF-8").alias("raw"),
        F.octet_length(F.col("raw_html")).alias("raw_length"),
    )
