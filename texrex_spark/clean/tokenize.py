"""Unicode-letter-range tokenizer + type/token data
(/root/reference/src/units/trunicodeletterrangetokenizer.pas, trdata.pas:69-121).

Tokens are maximal runs of codepoints inside the configured Latin ranges
(:155-211), taken only from qualifying divs (valid, boilerplate score <=
max, size >= min; :227-230), and upper-cased (trdata.pas:743 uses ICU
upper; Python str.upper is equivalent for the Latin ranges involved).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from .stripper import Div

# the reference's range set (base + supplement + extended A-D +
# additional + ligatures + fullwidth), trunicodeletterrangetokenizer.pas:155-211
LETTER_RANGES = [
    (0x0041, 0x005A), (0x0061, 0x007A),       # latin base
    (0x00C0, 0x00FF),                          # supplement
    (0x0100, 0x017F), (0x0180, 0x024F),        # extended A, B
    (0x2C60, 0x2C7F),                          # extended C
    (0xA720, 0xA78E), (0xA790, 0xA793), (0xA7A0, 0xA7AA), (0xA7F8, 0xA7FF),
    (0x1E00, 0x1EFF),                          # additional
    (0xFB00, 0xFB06),                          # ligatures
    (0xFF21, 0xFF3A), (0xFF41, 0xFF5A),        # fullwidth
]

_LETTER_SET: set[int] = set()
for lo, hi in LETTER_RANGES:
    _LETTER_SET.update(range(lo, hi + 1))

# regex fast path: one character class == the range set; maximal runs of
# class members are exactly the per-char walker's tokens
import re  # noqa: E402

_TOKEN_RE = re.compile(
    "[" + "".join(f"{re.escape(chr(lo))}-{re.escape(chr(hi))}" for lo, hi in LETTER_RANGES) + "]+"
)


@dataclass
class TypeTokenData:
    tokens: list[str] = field(default_factory=list)
    types: Counter = field(default_factory=Counter)

    @property
    def token_count(self) -> int:
        return len(self.tokens)

    def rel_freq(self, token: str) -> float:
        """Relative frequency of a type (trdata.pas UpdateTypes)."""
        if not self.tokens:
            return 0.0
        return self.types[token] / len(self.tokens)


class TokenizerConfig:
    max_boilerplate = 0.55
    min_length = 0  # div size threshold


def tokenize_text(text: str) -> list[str]:
    # NOTE: upper() must stay per-token — uppercasing the whole text first
    # would move codepoints across the range set's boundaries (e.g. U+0250
    # 'ɐ' is outside every range but uppercases to U+2C6F 'Ɐ' inside
    # extended C), changing token boundaries vs the reference scanner.
    return list(map(str.upper, _TOKEN_RE.findall(text)))


def tokenize_divs(divs: list[Div], cfg: TokenizerConfig | None = None) -> TypeTokenData:
    cfg = cfg or TokenizerConfig()
    ttd = TypeTokenData()
    for d in divs:
        if (
            not d.valid
            or d.boilerplate_score > cfg.max_boilerplate
            or len(d.text) < cfg.min_length
        ):
            continue
        toks = tokenize_text(d.text)
        ttd.tokens.extend(toks)
        ttd.types.update(toks)
    return ttd
