"""Text-quality assessment (TTrTextAssessment / Multi,
/root/reference/src/units/trtextassessment.pas:209-260, 127-165).

Badness = sum over profile words of the clamped standardized negative
deviation of log10(relative frequency) from the profile mean; a missing
profile word contributes its full limit.  Document killed at badness >
threshold.  The multi-language variant scores every profile, keeps the
argmin, and early-breaks at <= good_enough, recording the language.

Profile file format = the reference's .prof (data/de.prof):
``WORD|mean_log10_relfreq|stdev|limit`` with a ``#n=...`` comment line.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .tokenize import TypeTokenData


@dataclass
class Profile:
    language: str
    words: list[tuple[str, float, float, float]] = field(default_factory=list)
    threshold: float = 35.0

    @classmethod
    def parse(cls, language: str, text: str, threshold: float = 35.0) -> "Profile":
        words = []
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("|")
            if len(parts) != 4:
                continue
            words.append(
                (parts[0], float(parts[1]), float(parts[2]), float(parts[3]))
            )
        return cls(language=language, words=words, threshold=threshold)

    @classmethod
    def build(
        cls, language: str, token_freqs: dict[str, float],
        stdev: float = 0.25, limit: float = 5.0, threshold: float = 35.0,
        top_n: int = 10,
    ) -> "Profile":
        """Build a profile from measured relative frequencies (our
        deterministic stand-in for the reference's trained .prof files)."""
        top = sorted(token_freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
        return cls(
            language=language,
            words=[(w.upper(), math.log10(f), stdev, limit) for w, f in top if f > 0],
            threshold=threshold,
        )


def assess(ttd: TypeTokenData, profile: Profile) -> float:
    """Badness of one document under one profile (trtextassessment.pas:210-260)."""
    badness = 0.0
    for word, mean, stdev, limit in profile.words:
        freq = ttd.rel_freq(word)
        if freq > 0:
            diff = math.log10(freq) - mean
            if diff < 0:
                dev = abs(diff / stdev) if stdev else limit
                badness += min(dev, limit)
        else:
            badness += limit
    return badness


def assess_multi(
    ttd: TypeTokenData, profiles: list[Profile], good_enough: float = 15.0
) -> tuple[str, float]:
    """Argmin badness over language profiles with early break
    (trtextassessment.pas:127-165).  Returns (language, badness)."""
    best_lang, best = "", math.inf
    for p in profiles:
        b = assess(ttd, p)
        if b < best:
            best_lang, best = p.language, b
        if best <= good_enough:
            break
    return best_lang, best
