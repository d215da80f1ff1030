"""Streaming exact deduplication for continuous corpus ingestion.

The batch perfect-duplicate detector (operators/textops.dedup_exact,
trduplicatedetector.pas semantics) keys on the Rabin-64 fingerprint of
whitespace-normalized text and keeps the first occurrence.  A training-data
ingestion pipeline sees documents as an unbounded stream, so the streaming
twin keeps the same key but bounds its state with a watermark:
``dropDuplicatesWithinWatermark`` holds each fingerprint only until the
event-time watermark passes it, giving exact dedup within the horizon and
bounded state forever — the standard trade for unbounded streams (a
duplicate arriving later than the horizon re-enters; route survivors
through the batch near-dup pass for the long tail).

State sizing at scale: fingerprints are 8 bytes + row overhead; a
10-minute horizon at 100k docs/s holds ~60M keys ≈ a few GB across the
cluster, partitioned by the shuffle on the dedup key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    event_time: str = "ingested_at",
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Streaming docs (… text, ingested_at timestamp) -> first occurrence
    per content fingerprint within the watermark horizon.  The fingerprint
    is the batch dedup key (textops.doc_fingerprint_udf), so batch and
    stream agree on what counts as a perfect duplicate."""
    from ..operators.textops import doc_fingerprint_udf

    with_fp = docs.withColumn("fp", doc_fingerprint_udf()(F.col(text_col)))
    return with_fp.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )
