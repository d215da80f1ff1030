"""tender + tecl: the batch near-duplicate pipeline as four DataFrame ops
(/root/reference/src/units/trtenderapplication.pas, trteclapplication.pas;
SURVEY.md §2.5, §3.3).

The reference's external sort + k-way merge + RLE counting machinery
disappears into Spark's shuffle.  Semantics kept:

- pair generation: docs sharing a minhash value, smaller id first; buckets
  of 1 skipped, buckets over ``max_redundancy`` (200) skipped — the
  explicit hot-key guard (trshinglehelpers.pas:430-455, :436-438)
- blacklist: pairs sharing >= ``min_shared`` (5 of 100) minhashes; the
  *smaller* document (by size, trtenderapplication.pas:549-632) loses
- tecl: blacklist anti-join (or semi-join for --white), --uniqids =
  dropDuplicates (trteclapplication.pas:255-369)
- pre-filter: previously blacklisted ids excluded before grouping
  (trtenderapplication.pas:383-387)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MIN_SHARED = 5  # tender -l default (trtenderapplication.pas:146)
MAX_REDUNDANCY = 200  # tender -m default (:147)


def explode_shingles(docs: DataFrame) -> DataFrame:
    """docs(doc_id, fingerprint array<long>, doc_size) -> shingle rows
    (the reference's 68-byte shingle lines, trshinglehelpers.pas:52-61)."""
    return docs.select(
        "doc_id",
        F.col("doc_size"),
        F.explode("fingerprint").alias("minhash"),
    )


def doc_doc_pairs(
    shingles: DataFrame, max_redundancy: int = MAX_REDUNDANCY
) -> DataFrame:
    """Group by minhash -> per-bucket doc pairs (smaller doc-id first)."""
    buckets = (
        shingles.groupBy("minhash")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "doc_size"))).alias("docs"))
        .where(F.size("docs").between(2, max_redundancy))
    )
    return (
        buckets.select(F.explode("docs").alias("a"), "docs")
        .select("a", F.explode("docs").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.doc_size").alias("size_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.doc_size").alias("size_b"),
        )
    )


def blacklist(pairs: DataFrame, min_shared: int = MIN_SHARED) -> DataFrame:
    """Count shared minhashes per pair; blacklist the smaller doc."""
    counted = (
        pairs.groupBy("doc_a", "size_a", "doc_b", "size_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    loser = F.when(F.col("size_a") < F.col("size_b"), F.col("doc_a")).otherwise(
        F.when(F.col("size_b") < F.col("size_a"), F.col("doc_b")).otherwise(
            F.least("doc_a", "doc_b")
        )
    )
    return counted.select(loser.alias("doc_id")).distinct()


def tender(
    docs: DataFrame,
    min_shared: int = MIN_SHARED,
    max_redundancy: int = MAX_REDUNDANCY,
    prior_blacklist: DataFrame | None = None,
) -> DataFrame:
    """Full tender run: docs(doc_id, fingerprint, doc_size) -> blacklist."""
    if prior_blacklist is not None:
        docs = docs.join(prior_blacklist, "doc_id", "left_anti")
    return blacklist(
        doc_doc_pairs(explode_shingles(docs), max_redundancy), min_shared
    )


def tecl(
    corpus: DataFrame,
    bl: DataFrame,
    white: bool = False,
    uniq_ids: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """Blacklist (anti) or whitelist (semi) filter + optional id dedup."""
    how = "left_semi" if white else "left_anti"
    # No broadcast hint: at 100 TB a near-dup blacklist is 1e8-1e9 ids
    # (crawls lose 30-50% to near-dup), far past broadcast limits.  AQE
    # picks broadcast at small scale and shuffle hash/SMJ at large scale.
    out = corpus.join(bl, corpus[id_col] == bl["doc_id"], how)
    if uniq_ids:
        out = out.dropDuplicates([id_col])
    return out
