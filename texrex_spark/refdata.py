"""Loaders for the reference's shipped trained/data artifacts.

texrex ships its trained models and tables as data files next to the
binaries (reference repo ``data/``): FANN boilerplate nets
(``boilerplate.*.net``, loader semantics trdeboilerplater.pas:240-287),
language profiles (``*.prof``, format trtextassessment.pas:268-321),
the normalizer replacement table (``utf8.norm``, loader
trnormalizer.pas:186-226), and word lists for rofl
(``*.words`` / ``prefixes.ignore`` / ``suffixes.ignore``,
trroflapplication.pas).  These are *data*, not code — we read them
verbatim at runtime from ``TEXREX_DATA_DIR`` (default: the reference
checkout's data dir) rather than re-shipping them, exactly as a texrex
user would point the INI at them (data/texrex.ini:122-130, 147-151, 185).

Everything degrades gracefully when the directory is absent: callers get
``None`` / empty collections and fall back to the deterministic synthetic
stand-ins used in tests.
"""

from __future__ import annotations

import os
from functools import lru_cache

from .clean.assess import Profile
from .clean.boilerplate import FannNet

DATA_DIR = os.environ.get("TEXREX_DATA_DIR", "/root/reference/data")

BOILERPLATE_LANGS = ("de", "en", "fr", "germanic", "iso", "sv")
PROFILE_LANGS = ("da", "de", "en", "es", "fr", "id", "nl", "sv")


def available(data_dir: str | None = None) -> bool:
    return os.path.isdir(data_dir or DATA_DIR)


def _read(name: str, data_dir: str | None = None) -> str | None:
    path = os.path.join(data_dir or DATA_DIR, name)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8", errors="replace") as f:
        return f.read()


@lru_cache(maxsize=None)
def load_boilerplate_net(lang: str = "de", data_dir: str | None = None) -> FannNet | None:
    """Reference-trained FANN net (FANN_FLO_2.1 text format).  The shipped
    nets are 38-19-2 (37 inputs + bias), hidden FANN_SIGMOID_SYMMETRIC,
    output FANN_LINEAR_PIECE_SYMMETRIC -> scores in [-1, 1], decision
    ``score > 0.55`` (texrex.ini:126)."""
    text = _read(f"boilerplate.{lang}.net", data_dir)
    return FannNet.parse(text) if text else None


@lru_cache(maxsize=None)
def load_profile(lang: str, threshold: float = 35.0, data_dir: str | None = None) -> Profile | None:
    text = _read(f"{lang}.prof", data_dir)
    return Profile.parse(lang, text, threshold) if text else None


def load_profiles(
    langs: tuple[str, ...] = PROFILE_LANGS, threshold: float = 35.0,
    data_dir: str | None = None,
) -> list[Profile]:
    """All reference language profiles present on disk, in the given order
    (order matters: assess_multi early-breaks at good_enough)."""
    out = []
    for lang in langs:
        p = load_profile(lang, threshold, data_dir)
        if p is not None:
            out.append(p)
    return out


@lru_cache(maxsize=None)
def _load_norm_table_cached(data_dir: str | None) -> tuple[tuple[str, str], ...]:
    text = _read("utf8.norm", data_dir)
    if not text:
        return ()
    rules: list[tuple[str, str]] = []
    seen: set[str] = set()
    for line in text.split("\n"):
        # trnormalizer.pas:191-218: skip empty/'#' lines, tab-split,
        # exactly 2 fields, first LHS wins
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        lhs, rhs = parts
        if lhs in seen:
            continue
        seen.add(lhs)
        rules.append((lhs, rhs))
    return tuple(rules)


def load_norm_table(data_dir: str | None = None) -> list[tuple[str, str]]:
    """utf8.norm replacement pairs (mojibake fixes, dash/quote unification).
    NBSP/ZWSP deletion is NOT part of the table — normalize_text always
    applies it first, like trnormalizer.pas:165-177."""
    return list(_load_norm_table_cached(data_dir))


@lru_cache(maxsize=None)
def load_words(name: str, data_dir: str | None = None) -> frozenset[str]:
    """Word / ignore lists for rofl (``en.words``, ``prefixes.ignore``, ...)."""
    text = _read(name, data_dir)
    if not text:
        return frozenset()
    return frozenset(w for w in (ln.strip() for ln in text.split("\n")) if w and not w.startswith("#"))
