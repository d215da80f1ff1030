"""The texrex cleaning chain, end to end, plus its Spark operator.

Stage order = the reference worker chain (trworker.pas:417-649; the
crawler uses the same minus batch-dedup, trwalkers.pas:700-771):

  Stripper -> Charset -> MetaExtractor -> SecondPass -> Utf8Validator ->
  [Deboilerplater] -> Tokenizer -> TextAssessment(Multi) -> Shingler ->
  Normalizer -> NfcNormalizer -> DivDeduplicator -> host/tld meta

``clean_document`` is the single-document kernel (pure Python; also the
oracle).  ``clean_docs`` wraps it in ``mapInPandas`` — one Arrow batch in,
one out, with the per-row loop confined to the already-vectorized numpy
kernels inside (Rabin MinHash) and the char-level stripper state machine
(inherently sequential per document, SURVEY.md §7.4 "stripper fidelity").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

from ..functions import urlnorm
from . import assess as assess_mod
from . import divdedup, normalize, secondpass, shingle, tokenize
from .boilerplate import BoilerplateConfig, FannNet, deboilerplate
from .metaextract import extract_meta
from .simplefilter import doc_valid as simple_doc_valid
from .stripper import StripperConfig, result_spans, strip_document


@dataclass
class ChainConfig:
    stripper: StripperConfig = field(default_factory=StripperConfig)
    secondpass: secondpass.SecondPassConfig = field(
        default_factory=secondpass.SecondPassConfig
    )
    tokenizer: tokenize.TokenizerConfig = field(
        default_factory=tokenize.TokenizerConfig
    )
    profiles: list[assess_mod.Profile] = field(default_factory=list)
    assessment_threshold: float = 35.0
    good_enough: float = 15.0
    use_assessment: bool = True
    use_shingler: bool = True
    shingle_hashes: int = shingle.HASHES_NUMBER
    use_div_dedup: bool = True
    use_simple_filter: bool = False  # texrex batch mode only (trworker.pas)
    simple_size_threshold: int = 100
    simple_div_threshold: int = 2
    blank_duplicate_divs: bool = False  # tecl-style dup blanking in spans
    use_deboilerplater: bool = False
    boilerplate_net: FannNet | None = None
    boilerplate: BoilerplateConfig = field(default_factory=BoilerplateConfig)
    drop_boilerplate_spans: bool = False  # exclude score>threshold divs from spans
    # utf8.norm-style replacement pairs (trnormalizer.pas:186-226); load the
    # reference's shipped table with refdata.load_norm_table()
    norm_replacements: list[tuple[str, str]] | None = None


@dataclass
class CleanResult:
    doc_id: str
    url: str
    valid: bool
    spans: list[dict]
    links: list[tuple[str, str]]
    meta: dict[str, str]
    language: str = ""
    badness: float = 0.0
    killed_by: str = ""
    fingerprint: list[int] | None = None
    token_count: int = 0
    div_stats: list[dict] = field(default_factory=list)
    tokens: list[str] | None = None  # only populated under defer_shingle


def clean_document(
    doc_id: str, url: str, raw_html: str, config: ChainConfig | None = None,
    defer_shingle: bool = False, want_div_stats: bool = True,
) -> CleanResult:
    """defer_shingle=True skips the MinHash stage and returns the token
    stream instead, so the Spark operator can shingle-hash a whole Arrow
    batch at once (shingle.fingerprint_batch_signed, bit-identical).
    want_div_stats=False skips building the per-div stats dicts — the
    default clean_docs operator drops them (CLEAN_SCHEMA has no div_stats
    column), so the hot path shouldn't pay for their construction."""
    cfg = config or ChainConfig()

    # 1. strip (char state machine; also harvests links + header meta)
    res = strip_document(raw_html, url, cfg.stripper)
    meta = extract_meta(res.raw_header)
    if res.source_charset:
        meta["charset"] = res.source_charset
    if res.doctype:
        meta["doctype"] = res.doctype

    # 2-3. charset is a no-op for str input (parquet strings are UTF-8);
    # byte inputs go through clean.charset.to_utf8 before this kernel.

    # 4. second pass: entities (double wash) + cleansing counters
    secondpass.second_pass(res.divs, cfg.secondpass)

    # 5. strict UTF-8 validation
    normalize.validate_divs(res.divs)

    # 6. deboilerplater: 37 features + MLP score per div + doc thresholds
    valid = True
    killed_by = ""
    if cfg.use_deboilerplater and cfg.boilerplate_net is not None:
        bres = deboilerplate(
            res.divs,
            res.doctype,
            len(raw_html),
            cfg.boilerplate_net,
            cfg.boilerplate,
        )
        if not bres.doc_valid:
            valid = False
            killed_by = killed_by or "deboilerplater"
        if cfg.drop_boilerplate_spans:
            for d in res.divs:
                if d.boilerplate_score > cfg.boilerplate.threshold:
                    d.valid = False

    # 7. tokenizer over qualifying divs
    ttd = tokenize.tokenize_divs(res.divs, cfg.tokenizer)

    # 8. multi-language assessment
    language, badness = "", 0.0
    if cfg.use_assessment and cfg.profiles:
        language, badness = assess_mod.assess_multi(
            ttd, cfg.profiles, cfg.good_enough
        )
        if badness > cfg.assessment_threshold:
            valid = False
            killed_by = killed_by or "assessment"

    # 9. shingler (MinHash fingerprint)
    fp = None
    deferred_tokens = None
    if cfg.use_shingler:
        if defer_shingle:
            deferred_tokens = ttd.tokens
        else:
            fp = shingle.fingerprint_signed(ttd.tokens, hashes=cfg.shingle_hashes)

    # 10-11. normalizer + NFC
    normalize.normalize_divs(res.divs, cfg.norm_replacements)
    normalize.nfc_divs(res.divs)

    # 12. in-document div dedup
    if cfg.use_div_dedup:
        divdedup.dedupe_divs(res.divs)
        if cfg.blank_duplicate_divs:
            for d in res.divs:
                if d.dup_of >= 0:
                    d.valid = False

    # 13. host/tld meta (trwalkers.pas:765-770)
    host = urlnorm.extract_host(url)
    meta["host"] = host
    meta["tld"] = urlnorm.extract_tld(host)

    spans = result_spans(res)

    if cfg.use_simple_filter:
        span_tuples = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        if not simple_doc_valid(
            span_tuples, cfg.simple_size_threshold, cfg.simple_div_threshold
        ):
            valid = False
            killed_by = killed_by or "simple_filter"

    div_stats = [] if not want_div_stats else [
        {
            "container": d.container,
            "closing_start": d.closing_start,
            "open_tags": d.open_tags,
            "close_tags": d.close_tags,
            "anchors": d.anchors,
            "skipped_divs": d.skipped_divs,
            "cleansed_tags": d.cleansed_tags,
            "cleansed_emails": d.cleansed_emails,
            "cleansed_uris": d.cleansed_uris,
            "cleansed_hashtags": d.cleansed_hashtags,
            "dup_of": d.dup_of,
            "valid": d.valid,
            "boilerplate_score": d.boilerplate_score,
        }
        for d in res.divs
    ]

    if not spans and valid:
        valid = False
        killed_by = "stripper"

    return CleanResult(
        doc_id=doc_id,
        url=url,
        valid=valid,
        spans=spans,
        links=res.links,
        meta=meta,
        language=language,
        badness=badness,
        killed_by=killed_by,
        fingerprint=fp,
        token_count=ttd.token_count,
        div_stats=div_stats,
        tokens=deferred_tokens,
    )


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

CLEAN_SCHEMA = (
    "doc_id string, url string, valid boolean, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "links array<struct<url:string,relation:string>>, "
    "meta map<string,string>, language string, badness double, "
    "killed_by string, fingerprint array<bigint>, token_count int"
)


def clean_docs(docs_df, config: ChainConfig | None = None):
    """DataFrame in: (doc_id, url, raw_html [, ...]); out: CLEAN_SCHEMA.

    mapInPandas keeps Arrow batching; the chain kernel runs per document
    inside the batch.  The config is closed over and shipped once per task.
    """
    import pandas as pd

    cfg = config or ChainConfig()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            token_streams: list[list[str]] = []
            for doc_id, url, raw in zip(pdf["doc_id"], pdf["url"], pdf["raw_html"]):
                r = clean_document(
                    str(doc_id), url, raw, cfg,
                    defer_shingle=True, want_div_stats=False,
                )
                token_streams.append(r.tokens or [])
                rows.append(
                    {
                        "doc_id": r.doc_id,
                        "url": r.url,
                        "valid": r.valid,
                        "spans": [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in r.spans
                        ],
                        "links": list(r.links),
                        "meta": r.meta,
                        "language": r.language,
                        "badness": float(r.badness),
                        "killed_by": r.killed_by,
                        "fingerprint": None,
                        "token_count": r.token_count,
                    }
                )
            if cfg.use_shingler and rows:
                # one length-grouped Rabin pass over the WHOLE batch's
                # shingles (bit-identical to per-doc; ~10x fewer numpy calls)
                fps = shingle.fingerprint_batch_signed(
                    token_streams, hashes=cfg.shingle_hashes
                )
                for row, fp in zip(rows, fps):
                    row["fingerprint"] = fp
            yield pd.DataFrame(rows)

    return docs_df.mapInPandas(work, CLEAN_SCHEMA)


DIVSTATS_SCHEMA = (
    CLEAN_SCHEMA
    + ", div_stats array<struct<container:string,valid:boolean,dup_of:int,"
    "boilerplate_score:double,open_tags:int,close_tags:int,anchors:int>>"
)


def clean_docs_full(docs_df, config: ChainConfig | None = None):
    """clean_docs + per-div diagnostics (container, validity, dup back-ref,
    boilerplate score, tag/anchor counters) — the columns the
    deboilerplater/div-dedup oracle queries check."""
    import pandas as pd

    cfg = config or ChainConfig()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            token_streams: list[list[str]] = []
            for doc_id, url, raw in zip(pdf["doc_id"], pdf["url"], pdf["raw_html"]):
                r = clean_document(str(doc_id), url, raw, cfg, defer_shingle=True)
                token_streams.append(r.tokens or [])
                rows.append(
                    {
                        "doc_id": r.doc_id,
                        "url": r.url,
                        "valid": r.valid,
                        "spans": [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in r.spans
                        ],
                        "links": list(r.links),
                        "meta": r.meta,
                        "language": r.language,
                        "badness": float(r.badness),
                        "killed_by": r.killed_by,
                        "fingerprint": None,
                        "token_count": r.token_count,
                        "div_stats": [
                            (
                                d["container"],
                                d["valid"],
                                d["dup_of"],
                                float(d["boilerplate_score"]),
                                d["open_tags"],
                                d["close_tags"],
                                d["anchors"],
                            )
                            for d in r.div_stats
                        ],
                    }
                )
            if cfg.use_shingler and rows:
                fps = shingle.fingerprint_batch_signed(
                    token_streams, hashes=cfg.shingle_hashes
                )
                for row, fp in zip(rows, fps):
                    row["fingerprint"] = fp
            yield pd.DataFrame(rows)

    return docs_df.mapInPandas(work, DIVSTATS_SCHEMA)


def stage_stats(cleaned_df):
    """Per-stage invalid-document counters (the trworker.pas:160-174
    dashboard re-expressed): groupBy the first killing stage."""
    from pyspark.sql import functions as F

    return (
        cleaned_df.groupBy(
            F.when(F.col("valid"), F.lit("valid")).otherwise(
                F.coalesce(F.nullif(F.col("killed_by"), F.lit("")), F.lit("other"))
            ).alias("stage")
        )
        .agg(F.count("*").alias("docs"))
    )
