"""Deterministic fixture templates shared by engine queries and their
DuckDB oracles.

The pattern (used for every operator whose kernel is not SQL-expressible —
deboilerplater MLP, multi-language assessment, HyDRA, rofl, charset):

1. A small fixed set of templates, keyed by ``doc_id % K`` — so the
   template choice is expressible in BOTH engines.
2. The Spark side synthesizes the input from the template and runs the
   REAL distributed operator (mapInPandas / pandas UDF / Catalyst).
3. The oracle side is ``documents JOIN (VALUES ...) ON doc_id % K``,
   where the VALUES literal is computed by the pure-Python kernel at
   registration time.  The kernels are the unit-tested reference-semantics
   ports, so the driver check certifies the *distributed execution* —
   schema, Arrow transport, partitioning, UDF plumbing — reproduces the
   kernel bit-for-bit at scale.

Reference-trained artifacts (FANN net, .prof profiles, utf8.norm) load via
texrex_spark.refdata; queries that need them register only when the data
dir is present.
"""

from __future__ import annotations

from functools import lru_cache

from .. import refdata
from ..clean.assess import Profile
from ..clean.boilerplate import BoilerplateConfig
from ..clean.chain import ChainConfig, clean_document

# ---------------------------------------------------------------------------
# HTML chain templates (doc_id % 6)
# ---------------------------------------------------------------------------

_NAV = (
    '<div class="nav"><a href="/home">Home</a> <a href="/about">Über uns</a> '
    '<a href="/contact">Kontakt</a> <a href="/impressum">Impressum</a></div>'
)
_FOOTER = (
    "<div class=\"footer\">© 2014 Example GmbH — Alle Rechte vorbehalten. "
    '<a href="/agb">AGB</a> <a href="/datenschutz">Datenschutz</a></div>'
)

_DE_P1 = (
    "Die Forscher haben in der Studie gezeigt, dass die Ergebnisse von der "
    "Methode abhängen und die Daten in den meisten Fällen zu der gleichen "
    "Schlussfolgerung führen. Das ist der Grund, warum die Arbeit von den "
    "Kollegen in der Fachwelt so breit diskutiert wird und die Debatte zu "
    "einer neuen Runde von Experimenten geführt hat."
)
_DE_P2 = (
    "Ich denke, dass die Bedeutung der Befunde in der Praxis noch zu wenig "
    "beachtet wird. Der Ansatz ist von der Theorie gut gestützt, und die "
    "Umsetzung in den Laboren ist das eigentliche Problem, das von den "
    "Teams in den nächsten Jahren zu lösen ist. Die Frage ist und bleibt, "
    "ob das Verfahren in der Breite tragfähig ist."
)
_EN_P1 = (
    "The committee said that the results of the review were consistent "
    "with the expectations of the board, and that a decision on the new "
    "policy is expected in the coming weeks. The report is based on a "
    "survey of more than a thousand households and is likely to shape the "
    "debate for years to come."
)
_EN_P2 = (
    "For the researchers, the most striking finding is that the effect "
    "holds across regions and that it is robust to a wide range of "
    "controls. The team argued that the pattern in the data points to a "
    "structural cause, and that policy on this question should be revised "
    "in light of the evidence."
)
_FR_P = (
    "Les chercheurs de la commission ont montré que les résultats de "
    "l'étude sont cohérents avec les attentes et que la décision sur le "
    "nouveau programme sera prise dans les semaines à venir. Le rapport "
    "est fondé sur une enquête menée auprès de la population et les "
    "conclusions en seront débattues à la rentrée par les responsables de "
    "la politique de la recherche en France et des pays de la région."
)

TEMPLATES: list[str] = [
    # 0: German content page; entities + NBSP + en-dash (norm table)
    (
        "<html><head><title>Studie &amp; Debatte</title></head><body>"
        + _NAV
        + f"<p>{_DE_P1}</p>"
        + f"<p>Die Männer – und auch die Frauen – sagten, dass die &quot;Ergebnisse&quot; zählen. {_DE_P2}</p>"
        + _FOOTER
        + "</body></html>"
    ),
    # 1: English page; double-washed entity + rogue Win-1252 numeric entity
    # (&#150; = $96 -> EN DASH) + mojibake "Ã¤" fixed by utf8.norm
    (
        "<html><head><title>Review report</title></head><body>"
        + _NAV
        + f"<p>{_EN_P1}</p>"
        + f"<p>Fish &amp;amp; chips &#150; the board&#146;s view on GrÃ¤fe. {_EN_P2}</p>"
        + _FOOTER
        + "</body></html>"
    ),
    # 2: French page with an exact duplicate paragraph (in-doc div dedup)
    (
        "<html><head><title>Rapport</title></head><body>"
        + _NAV
        + f"<p>{_FR_P}</p>"
        + f"<p>{_FR_P}</p>"
        + _FOOTER
        + "</body></html>"
    ),
    # 3: boilerplate-only page -> deboilerplater doc thresholds kill it
    (
        "<html><head><title>Links</title></head><body>"
        + _NAV
        + '<div><a href="/a">mehr</a></div>'
        + '<div><a href="/b">weiter lesen</a></div>'
        + _FOOTER
        + "</body></html>"
    ),
    # 4: German again, longer (valid, de)
    (
        "<html><head><title>Bericht</title></head><body>"
        + _NAV
        + f"<p>{_DE_P1}</p><p>{_DE_P2}</p><p>{_DE_P1}x</p>"
        + _FOOTER
        + "</body></html>"
    ),
    # 5: gibberish -> every profile word missing -> max badness, killed
    (
        "<html><head><title>zzz</title></head><body>"
        + _NAV
        + "<p>"
        + ("zzz qqq xxp vvk wwj " * 40)
        + "</p>"
        + _FOOTER
        + "</body></html>"
    ),
]

N_TEMPLATES = len(TEMPLATES)


def ref_chain_config() -> ChainConfig:
    """The reference's default job config (data/texrex.ini): iso net,
    threshold 0.55 + doc thresholds 1/0.1/500/0.25, de|en|es|fr profile
    scheme with MetaThreshold 35 / BreakThreshold 15, utf8.norm table."""
    profiles = [
        p
        for lang in ("de", "en", "es", "fr")
        if (p := refdata.load_profile(lang)) is not None
    ]
    return ChainConfig(
        use_deboilerplater=True,
        boilerplate_net=refdata.load_boilerplate_net("iso"),
        boilerplate=BoilerplateConfig(),
        profiles=profiles,
        use_assessment=True,
        assessment_threshold=35.0,
        good_enough=15.0,
        use_shingler=False,
        norm_replacements=refdata.load_norm_table(),
    )


@lru_cache(maxsize=1)
def chain_expected() -> list[dict]:
    """Run the pure-Python chain kernel once per template with the
    reference artifacts; the driver oracle embeds these as VALUES."""
    cfg = ref_chain_config()
    out = []
    for k, html in enumerate(TEMPLATES):
        r = clean_document(str(k), f"http://tpl{k}.example.com/x", html, cfg)
        out.append(
            {
                "tpl": k,
                "valid": r.valid,
                "language": r.language,
                "badness": r.badness,
                "killed_by": r.killed_by,
                "spans": [(s["text"], s["offset"]) for s in r.spans],
                "div_stats": r.div_stats,
            }
        )
    return out


# ---------------------------------------------------------------------------
# HyDRA / rofl line templates (doc_id % 5)
# ---------------------------------------------------------------------------

HYDRA_UNIGRAMS: dict[str, int] = {
    # picked so each decision branch fires (trhydraapplication.pas:450-481)
    "unter-": 5, "werfen": 40, "unterwerfen": 120, "unter-werfen": 2,
    "voll-": 8, "treffer": 30, "Volltreffer": 0, "volltreffer": 90,
    "e-mail": 200, "e-": 10, "mail": 50, "email": 20,
    "Donau": 25, "Dampfer": 25,
}

HYDRA_LINES: list[str] = [
    "sie wollten sich nicht unter- werfen heute",       # merger wins? concat vs merger by table
    "das war ein voll- treffer im spiel",               # merger (volltreffer) wins
    "schreib mir eine e- mail bitte",                   # concat (e-mail) wins
    "die Donau- Dampfer fahrt beginnt",                 # german NN fallback
    "kein kandidat hier einfach text",                  # untouched
]

ROFL_WORDS = frozenset(
    {"this", "is", "a", "sentence", "another", "here", "ende", "anfang",
     "text", "wort"}
)
ROFL_PREFIX_IGNORE = frozenset({"www"})
ROFL_SUFFIX_IGNORE = frozenset({"com"})

ROFL_LINES: list[str] = [
    "this is a sentence.Another one here",   # split: sentence. Another
    "see www.com for details",               # ignore lists block the split
    "ende!Anfang des texts",                 # split on !
    "kein match hier",                       # untouched
    "text:wort mitten drin",                 # split on :
]


@lru_cache(maxsize=1)
def hydra_expected() -> list[tuple[int, str]]:
    from ..clean.hydra import Unigrams, dehyphenate

    uni = Unigrams(dict(HYDRA_UNIGRAMS))
    return [(k, dehyphenate(ln, uni, german=True)) for k, ln in enumerate(HYDRA_LINES)]


@lru_cache(maxsize=1)
def rofl_expected() -> list[tuple[int, str]]:
    from ..clean.rofl import fix_runons

    return [
        (k, fix_runons(ln, set(ROFL_WORDS), set(ROFL_PREFIX_IGNORE), set(ROFL_SUFFIX_IGNORE)))
        for k, ln in enumerate(ROFL_LINES)
    ]


# ---------------------------------------------------------------------------
# Charset byte templates (doc_id % 4)
# ---------------------------------------------------------------------------

# (declared_charset_or_None, raw_bytes): exercises declared-wins,
# ISO->Win1252 override, unknown-declared fallback to detection, no header
CHARSET_CASES: list[tuple[str | None, bytes]] = [
    ("utf-8", "Grüße — däta".encode("utf-8")),
    ("iso-8859-1", b"caf\xe9 \x96 dash"),  # 0x96 = en dash in cp1252 only
    ("x-bogus-charset", b"plain ascii text here"),
    (None, b"Stra\xdfe und M\xe4dchen"),  # cp1252 bytes, no declaration
]


@lru_cache(maxsize=1)
def charset_expected() -> list[tuple[int, str, str]]:
    from ..clean.charset import to_utf8

    out = []
    for k, (declared, raw) in enumerate(CHARSET_CASES):
        text, cs = to_utf8(raw, declared)
        out.append((k, text, cs))
    return out


# ---------------------------------------------------------------------------
# WARC fixture file
# ---------------------------------------------------------------------------

WARC_N_RECORDS = 400
WARC_MIN, WARC_MAX = 2048, 4800


def warc_body_size(i: int) -> int:
    return 1000 + (i * 137) % 4000


def build_warc_fixture(path: str) -> str:
    """Deterministic WARC file: record i has a single-line body of
    ``warc_body_size(i)`` 'x' bytes; a sub-minimum terminator record keeps
    the final real record's size exact (parse keeps trailing newlines of
    the last record)."""
    import os

    parts = []
    for i in range(WARC_N_RECORDS):
        body = "x" * warc_body_size(i)
        parts.append(
            "WARC/1.0\n"
            "WARC-Type: response\n"
            f"WARC-Target-URI: http://w{i % 37}.example.com/p/{i}\n"
            f"WARC-IP-Address: 10.0.{i % 256}.1\n"
            "WARC-Date: 2024-01-01T00:00:00Z\n"
            "Content-Type: text/html; charset=utf-8\n"
            f"Content-Length: {len(body)}\n"
            "\n"
            f"{body}\n"
        )
    parts.append(
        "WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://end.example/\n"
        "Content-Type: text/html; charset=utf-8\nContent-Length: 1\n\nx\n"
    )
    data = "".join(parts).encode("utf-8")
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def build_arc_fixture(path: str) -> str:
    """Deterministic gzipped ARC twin of the WARC fixture: record i has the
    one-line ``<url> <ip> <date> <mime> <size>`` header the begin regex
    matches (trreader.pas:314-391, regex :316) and the same
    ``warc_body_size(i)`` body; hosts use the 'a' prefix so WARC and ARC
    rows stay distinguishable in a union.  Gzipped on disk so the driver
    row also exercises the transparent gunzip path (trfilein.pas:275-295).
    A sub-minimum terminator record keeps the last real record's size
    exact, as in build_warc_fixture."""
    import gzip
    import os

    parts = []
    for i in range(WARC_N_RECORDS):
        size = warc_body_size(i)
        parts.append(
            f"http://a{i % 37}.example.com/p/{i} 10.0.{i % 256}.1 "
            f"20240101000000 text/html {size}\n"
            + "x" * size + "\n"
        )
    parts.append("http://end.example/ 10.0.0.1 20240101000000 text/html 1\nx\n")
    data = gzip.compress("".join(parts).encode("utf-8"), compresslevel=1)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# SQL literal helpers
# ---------------------------------------------------------------------------


def sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_values(rows: list[tuple], names: list[str], alias: str = "e") -> str:
    """(VALUES (...), (...)) AS alias(names...) with str/bool/int/float cells."""

    def cell(v) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return sql_str(v)
        if v is None:
            return "NULL"
        if isinstance(v, float):
            # bare decimal literals parse as DECIMAL in DuckDB, not DOUBLE
            return f"CAST({v!r} AS DOUBLE)"
        return repr(v)

    body = ", ".join("(" + ", ".join(cell(c) for c in row) + ")" for row in rows)
    return f"(VALUES {body}) AS {alias}({', '.join(names)})"
