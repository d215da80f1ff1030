"""ARC/WARC readers (/root/reference/src/units/trreader.pas).

Reference semantics:

- WARC: document start = literal ``WARC/1.0`` line (trreader.pas:236-305);
  headers read until the blank line; ``WARC-Target-URI``,
  ``WARC-IP-Address`` and the ``Content-Type`` charset are extracted; the
  body runs to the next record start.
- ARC: document start = the one-line header
  ``<url> <ip> <date> <mime> <size>`` matched by the begin regex
  (trreader.pas:314-391, regex :316).
- both enforce the doc-size window (2 KB..256 KB default,
  trreader.pas:208-214, texrex.ini:23-24).

Spark shape: ``spark.read.format("binaryFile")`` gives (path, content)
rows — one task per file, segmentation in ``mapInPandas`` (WARC members
are not line-splittable once gzip-concatenated; per-file tasks are the
standard layout, with oversized archives pre-split by offset index).
Gzip payloads are sniffed by magic bytes and decompressed transparently
(trfilein.pas:275-295).
"""

from __future__ import annotations

import gzip
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

ARC_BEGIN = re.compile(
    r"^(https?://\S+) (\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}) (\d+) (\S+) (\d+)$"
)
_CHARSET = re.compile(r"charset=([-0-9A-Za-z]+)", re.IGNORECASE)

MIN_DOC_SIZE = 2 * 1024  # trreader.pas:208-214 defaults
MAX_DOC_SIZE = 256 * 1024

DOC_SCHEMA = (
    "url string, ip string, charset string, date string, raw_html string, "
    "source_file string, record_offset long"
)


def _maybe_gunzip(content: bytes) -> bytes:
    if content[:2] == b"\x1f\x8b":
        return gzip.decompress(content)
    return content


def parse_warc(
    content: bytes, min_size: int = MIN_DOC_SIZE, max_size: int = MAX_DOC_SIZE
) -> list[dict]:
    """Split one WARC file into document dicts (header meta + raw body)."""
    text = _maybe_gunzip(content).decode("utf-8", errors="replace")
    lines = text.split("\n")
    docs: list[dict] = []
    i = 0
    n = len(lines)
    offset = 0
    while i < n:
        if not lines[i].startswith("WARC/1.0"):
            i += 1
            continue
        rec_offset = offset
        headers: dict[str, str] = {}
        i += 1
        while i < n and lines[i].strip():
            if ":" in lines[i]:
                k, v = lines[i].split(":", 1)
                headers[k.strip().lower()] = v.strip()
            i += 1
        i += 1  # blank line
        body_start = i
        while i < n and not lines[i].startswith("WARC/1.0"):
            i += 1
        body = "\n".join(lines[body_start:i])
        offset = rec_offset + 1
        charset = ""
        m = _CHARSET.search(headers.get("content-type", ""))
        if m:
            charset = m.group(1)
        size = len(body.encode("utf-8"))
        if not (min_size <= size <= max_size):
            continue
        if headers.get("warc-type", "response").lower() not in ("response", ""):
            continue
        docs.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "ip": headers.get("warc-ip-address", ""),
                "charset": charset,
                "date": headers.get("warc-date", ""),
                "raw_html": body,
                "record_offset": rec_offset,
            }
        )
    return docs


def parse_arc(
    content: bytes, min_size: int = MIN_DOC_SIZE, max_size: int = MAX_DOC_SIZE
) -> list[dict]:
    """Split one ARC file on the one-line doc headers (trreader.pas:314-391)."""
    text = _maybe_gunzip(content).decode("utf-8", errors="replace")
    lines = text.split("\n")
    docs: list[dict] = []
    current: dict | None = None
    body: list[str] = []
    rec = 0

    def flush():
        nonlocal current, body
        if current is not None:
            raw = "\n".join(body)
            size = len(raw.encode("utf-8"))
            if min_size <= size <= max_size:
                current["raw_html"] = raw
                docs.append(current)
        current, body = None, []

    for idx, line in enumerate(lines):
        m = ARC_BEGIN.match(line)
        if m:
            flush()
            current = {
                "url": m.group(1),
                "ip": m.group(2),
                "date": m.group(3),
                "charset": "",
                "record_offset": rec,
            }
            rec += 1
        elif current is not None:
            body.append(line)
    flush()
    return docs


def _reader(parse_fn, min_size: int, max_size: int):
    import pandas as pd

    def work(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for d in parse_fn(bytes(content), min_size, max_size):
                    d["source_file"] = path
                    rows.append(d)
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "ip", "charset", "date", "raw_html",
                    "source_file", "record_offset",
                ],
            )

    return work


def read_warc(
    spark: SparkSession, path: str,
    min_size: int = MIN_DOC_SIZE, max_size: int = MAX_DOC_SIZE,
) -> DataFrame:
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_reader(parse_warc, min_size, max_size), DOC_SCHEMA)


def read_arc(
    spark: SparkSession, path: str,
    min_size: int = MIN_DOC_SIZE, max_size: int = MAX_DOC_SIZE,
) -> DataFrame:
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_reader(parse_arc, min_size, max_size), DOC_SCHEMA)


def corpus_to_warc(corpus, gzip_out: bool = False) -> bytes:
    """Serialize a synthetic corpus as one WARC file (test fixture)."""
    parts: list[str] = []
    for d in corpus.docs:
        body = d.raw_html
        parts.append(
            "WARC/1.0\n"
            "WARC-Type: response\n"
            f"WARC-Target-URI: {d.url}\n"
            f"WARC-IP-Address: {d.ip}\n"
            "WARC-Date: 2024-01-01T00:00:00Z\n"
            f"Content-Type: text/html; charset={d.charset}\n"
            f"Content-Length: {len(body.encode('utf-8'))}\n"
            "\n"
            f"{body}\n"
        )
    out = "".join(parts).encode("utf-8")
    return gzip.compress(out) if gzip_out else out
