"""URL canonicalization, host/TLD extraction, link-relation classification.

Reference behaviors mirrored:

- host extraction via URI parse (trutilities.pas:393-399)
- TLD = substring after the last '.' of the host (trutilities.pas:402-405)
- link relation classification: same-full-host (case-folded host equality),
  same-non-virtual-host (last two host segments equal), different-hosts,
  malformed; relative URLs resolved against the source first
  (trutilities.pas:420-471)
- doc id = md5 of the URL (trdata.pas:1285-1293; the reference appends 4
  random hex chars — we use a deterministic variant so ids are reproducible)

Canonical form (the crawl protocol's single normalization, applied before
every seen-set probe and fetch join): lowercase scheme and host, drop the
fragment, drop a default port (:80 http / :443 https), empty path -> "/".

The same normalization exists twice on purpose: ``canonicalize`` (plain
Python, used by the oracle and inside pandas UDFs) and ``canonicalize_col``
(pure Catalyst expressions, used by the frontier scheduler so normalization
of 10^10 URLs never leaves the JVM).  test_urlnorm.py asserts they agree.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from urllib.parse import urljoin, urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

SAME_FULL_HOST = "trlSameFullHost"
SAME_NON_VIRTUAL_HOST = "trlSameNonVirtualHost"
DIFFERENT_HOSTS = "trlDifferentHosts"
MALFORMED = "trlMalformedUri"


def canonicalize(url: str) -> str:
    """Canonical URL form; returns '' for unusable URLs."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return ""
    host = (parts.hostname or "").lower()
    if not host:
        return ""
    port = None
    try:
        port = parts.port
    except ValueError:
        return ""
    netloc = host
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    out = f"{scheme}://{netloc}{path}"
    if parts.query:
        out += f"?{parts.query}"
    return out


def canonicalize_col(url: Column) -> Column:
    """Catalyst-only equivalent of ``canonicalize``.

    Built on ``try_parse_url`` (single JVM java.net.URI parse per part)
    instead of a regex tower — measured ~3x cheaper on the frontier
    canonicalize stage, which is the hottest expression in the scheduler.

    Do NOT rewrite this as substring/instr string ops to save parses: a
    round-3 attempt measured 2x SLOWER (1.6 s -> 2.8-3.7 s per 2M URLs
    at local[32]) because Catalyst does not eliminate the duplicated
    subexpression chains through the CASE branches, so the string tower
    re-evaluates ~5x per row while five URI parses cost ~160 ns each.
    """
    trimmed = F.trim(url)
    scheme = F.lower(F.try_parse_url(trimmed, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(trimmed, F.lit("HOST")))
    auth = F.try_parse_url(trimmed, F.lit("AUTHORITY"))
    path = F.try_parse_url(trimmed, F.lit("PATH"))
    query = F.try_parse_url(trimmed, F.lit("QUERY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1).try_cast("int")
    default_port = F.when(scheme == "http", F.lit(80)).otherwise(F.lit(443))
    netloc = F.when(
        port.isNull() | (port == default_port), host
    ).otherwise(F.concat(host, F.lit(":"), port.cast("string")))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    q = F.when(
        query.isNotNull() & (query != ""), F.concat(F.lit("?"), query)
    ).otherwise(F.lit(""))
    ok = scheme.isin("http", "https") & host.isNotNull() & (host != "")
    return F.when(ok, F.concat(scheme, F.lit("://"), netloc, path, q)).otherwise(
        F.lit("")
    )


def extract_host(url: str) -> str:
    """trutilities.pas:393-399 (host of the parsed URI, lowercased)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def extract_host_col(url: Column) -> Column:
    return F.coalesce(F.lower(F.try_parse_url(url, F.lit("HOST"))), F.lit(""))


def extract_path(url: str) -> str:
    """Path component for robots prefix matching; '' -> '/' (trpoliteness.pas:335-337)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return "/"
    return parts.path or "/"


def extract_path_col(url: Column) -> Column:
    path = F.try_parse_url(url, F.lit("PATH"))
    return F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)


def extract_tld(host: str) -> str:
    """trutilities.pas:402-405 (text after the last dot; whole host if no dot)."""
    pos = host.rfind(".")
    return host[pos + 1 :]


def extract_tld_col(host: Column) -> Column:
    return F.element_at(F.split(host, r"\."), -1)


def doc_id(url: str) -> str:
    """Deterministic doc id: md5 of the canonical URL (cf. trdata.pas:1285-1293)."""
    return hashlib.md5(canonicalize(url).encode("utf-8")).hexdigest()


def doc_id_col(url_canon: Column) -> Column:
    return F.md5(url_canon)


@lru_cache(maxsize=8192)
def resolve_link(base_url: str, link: str) -> str:
    """Relative-URL resolution (trutilities.pas:430-438).  Memoized like
    _split_host below: nav/footer links repeat on every page of a host, so
    the stripper's link extraction re-resolves the same (base, link) pairs
    constantly (urljoin re-parses both sides each call)."""
    try:
        return urljoin(base_url, link)
    except ValueError:
        return ""


@lru_cache(maxsize=4096)
def _split_host(url: str) -> str:
    """Memoized lowercased hostname ('' = none or malformed — both map to
    MALFORMED in link_relation).  The memo matters in the stripper's hot
    path: every link of a page re-parses the same src_url, and nav links
    repeat across every page of a host (urllib's own _parse_cache holds
    only 20 entries)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


@lru_cache(maxsize=4096)
def _has_scheme(link: str) -> bool | None:
    """True/False, or None for a ValueError (malformed)."""
    try:
        return bool(urlsplit(link).scheme)
    except ValueError:
        return None


def link_relation(src_url: str, link: str) -> tuple[str, str]:
    """Classify a link vs its source page (trutilities.pas:420-471).

    Returns (resolved_absolute_link, relation) where relation is one of the
    trl* constants.  The host comparison is case-folded for the full-host
    case; the non-virtual-host case compares the last two dot-segments.
    """
    link_has_scheme = _has_scheme(link)
    if link_has_scheme is None:
        return link, MALFORMED
    if link_has_scheme:
        # Absolute per the reference's IsAbsoluteUri check — never resolved
        # against the base (urljoin would wrongly inherit base parts for
        # degenerate inputs like "http://").
        resolved = link
    else:
        resolved = resolve_link(src_url, link)
    if not resolved:
        return link, MALFORMED
    h1 = _split_host(src_url)
    h2 = _split_host(resolved)
    if not h1 or not h2:
        return resolved, MALFORMED
    if h1 == h2:
        return resolved, SAME_FULL_HOST
    seg1, seg2 = h1.split("."), h2.split(".")
    if len(seg1) >= 2 and len(seg2) >= 2 and seg1[-2:] == seg2[-2:]:
        return resolved, SAME_NON_VIRTUAL_HOST
    return resolved, DIFFERENT_HOSTS


def link_relation_col(src_host: Column, dst_host: Column) -> Column:
    """Catalyst variant for already-absolute URLs (hosts pre-extracted)."""
    s1 = F.split(src_host, r"\.")
    s2 = F.split(dst_host, r"\.")
    same_nonvirtual = (
        (F.size(s1) >= 2)
        & (F.size(s2) >= 2)
        & (F.element_at(s1, -1) == F.element_at(s2, -1))
        & (F.element_at(s1, -2) == F.element_at(s2, -2))
    )
    return (
        F.when((src_host == "") | (dst_host == ""), F.lit(MALFORMED))
        .when(src_host == dst_host, F.lit(SAME_FULL_HOST))
        .when(same_nonvirtual, F.lit(SAME_NON_VIRTUAL_HOST))
        .otherwise(F.lit(DIFFERENT_HOSTS))
    )
