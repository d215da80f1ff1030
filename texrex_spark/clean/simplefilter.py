"""Simple document filter (TTrSimpleDocumentFilter).

Reference semantics (/root/reference/src/units/trsimpledocumentfilter.pas:
81-89, defaults :69-72): a document is killed when its valid UTF-8 text
mass is below ``size_threshold`` bytes or it has fewer than
``div_threshold`` valid divs.  Here a "valid div" is a non-empty text span.

Dual implementation: ``doc_valid`` (plain Python, oracle + UDF side) and
``valid_col`` (Catalyst ``aggregate``/``filter`` over the spans array,
JVM-side) — tests assert agreement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SIZE_THRESHOLD = 100  # reference default 2000 (texrex.ini:106-108);
DEFAULT_DIV_THRESHOLD = 2     # scaled down for the synthetic corpus


def doc_valid(
    spans: list[tuple[str, str, str | None, int]],
    size_threshold: int = DEFAULT_SIZE_THRESHOLD,
    div_threshold: int = DEFAULT_DIV_THRESHOLD,
) -> bool:
    text_spans = [s for s in spans if s[0] == "text" and s[1]]
    size = sum(len(s[1].encode("utf-8")) for s in text_spans)
    return size >= size_threshold and len(text_spans) >= div_threshold


def valid_col(
    spans: Column,
    size_threshold: int = DEFAULT_SIZE_THRESHOLD,
    div_threshold: int = DEFAULT_DIV_THRESHOLD,
) -> Column:
    text_spans = F.filter(spans, lambda s: (s["kind"] == "text") & (s["text"] != ""))
    size = F.aggregate(
        text_spans, F.lit(0), lambda acc, s: acc + F.octet_length(s["text"])
    )
    return (size >= size_threshold) & (F.size(text_spans) >= div_threshold)
