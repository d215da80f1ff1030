"""HyDRA de-hyphenation (/root/reference/src/units/trhydraapplication.pas).

For adjacent tokens ``xxx- yyy``: compare unigram probabilities of the
concatenation with hyphen (``xxx-yyy``... actually prefix+suffix keeps the
'-': LConcat = 'unter-' + 'werfen' = 'unter-werfen'), the merger without it
(``unterwerfen``), and the parts; pick the strict argmax
(trhydraapplication.pas:450-481); German NN-compound fallback concatenates
capitalized-capitalized pairs (:471-477).  Candidate patterns :133-136.

Spark usage: ``hydra_udf`` over span text with the unigram table broadcast
(data format: ``token<TAB>count`` lines, like the reference's
*.unigrams.gz).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
import regex

CANDIDATE_LEFT = regex.compile(r"^[-\p{L}]{2,}-$")
CANDIDATE_RIGHT = regex.compile(r"^([-\p{L}]{2,})(\P{L}|)$")
GERMAN_LEFT = regex.compile(r"^[[:upper:]][[:lower:]]+-$")
GERMAN_RIGHT = regex.compile(r"^[[:upper:]][[:lower:]]+$")


class Unigrams:
    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        self.total = max(sum(counts.values()), 1)

    @classmethod
    def parse(cls, text: str) -> "Unigrams":
        counts: dict[str, int] = {}
        for line in text.splitlines():
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 2:
                try:
                    counts[parts[0]] = int(parts[1])
                except ValueError:
                    pass
        return cls(counts)

    def p(self, token: str) -> float:
        return self.counts.get(token, 0) / self.total


def dehyphenate(line: str, unigrams: Unigrams, german: bool = False) -> str:
    toks = line.split(" ")
    out: list[str] = []
    i = 0
    while i < len(toks):
        if i == len(toks) - 1:
            out.append(toks[i])
            break
        left, right = toks[i], toks[i + 1]
        m = CANDIDATE_RIGHT.match(right)
        if CANDIDATE_LEFT.match(left) and m:
            prefix = left
            suffix, after = m.group(1), m.group(2)
            concat = prefix + suffix
            merger = prefix[:-1] + suffix
            pp, ps = unigrams.p(prefix), unigrams.p(suffix)
            pc, pm = unigrams.p(concat), unigrams.p(merger)
            if pc > pp and pc > ps and pc > pm:
                out.append(concat + after)
                i += 2
            elif pm > pp and pm > ps and pm > pc:
                out.append(merger + after)
                i += 2
            elif german and GERMAN_LEFT.match(prefix) and GERMAN_RIGHT.match(suffix):
                out.append(concat + after)
                i += 2
            else:
                out.append(left)
                i += 1
        else:
            out.append(left)
            i += 1
    return " ".join(out)


def hydra_udf(unigrams_bc, german: bool = False):
    """pandas-UDF factory: Series[str] -> Series[str] with the broadcast
    unigram table (SURVEY.md §2.6)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _hydra(texts: pd.Series) -> pd.Series:
        uni = unigrams_bc.value
        return texts.map(lambda t: dehyphenate(t, uni, german) if t else t)

    return _hydra
