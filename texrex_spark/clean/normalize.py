"""UTF-8 validation, normalization, and NFC
(/root/reference/src/units/trutf8validator.pas, trnormalizer.pas,
trnfcnormalizer.pas).

- validator: strict UTF-8 (surrogates and > U+10FFFF rejected); invalid
  div -> invalid (trutf8validator.pas:78-92)
- normalizer: NBSP (U+00A0) and zero-width space (U+200B) deleted
  (trnormalizer.pas:167-178), optional replacement pairs, illegal-
  codepoint sweep -> ' ' (control chars, surrogates, private use,
  noncharacters; regex trnormalizer.pas:95-96), whitespace-only div ->
  invalid
- NFC via unicodedata (ICU NFC equivalent, trnfcnormalizer.pas:93-105)
"""

from __future__ import annotations

import re
import unicodedata

from .stripper import Div

_ILLEGAL = re.compile(
    "[\u0000-\u001f\u007f-\u009f\ud800-\udfff\ue000-\uf8ff"
    "\ufdd0-\ufdef\ufffd-\uffff\ufeff]"
)  # trnormalizer.pas:95-96 ranges, verbatim
_NIL = re.compile(r"^ *$")


def utf8_valid(text: str) -> bool:
    try:
        text.encode("utf-8", errors="strict")
        return True
    except UnicodeEncodeError:
        return False


def validate_divs(divs: list[Div]) -> None:
    for d in divs:
        if d.valid and not utf8_valid(d.text):
            d.valid = False


def normalize_text(text: str, replacements: list[tuple[str, str]] | None = None) -> str:
    text = text.replace(" ", "").replace("​", "")
    for lhs, rhs in replacements or []:
        text = text.replace(lhs, rhs)
    return _ILLEGAL.sub(" ", text)


def normalize_divs(divs: list[Div], replacements=None) -> None:
    for d in divs:
        if not d.valid:
            continue
        d.text = normalize_text(d.text, replacements)
        if _NIL.match(d.text):
            d.valid = False


def nfc_divs(divs: list[Div]) -> None:
    for d in divs:
        if d.valid:
            d.text = unicodedata.normalize("NFC", d.text)
