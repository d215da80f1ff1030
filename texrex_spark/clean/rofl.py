"""rofl: run-together sentence fix
(/root/reference/src/units/trroflapplication.pas).

Tokens matching ``(^|.*\\P{L})(\\p{L}{2,})([!?:.]+)(\\p{L}{2,})(\\P{L}.*|$)``
(:117) are split after the punctuation when both halves (lowercased) are
known words and neither is in the prefix/suffix ignore lists (:384-426).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
import regex

CANDIDATE = regex.compile(r"(^|.*\P{L})(\p{L}{2,})([!?:.]+)(\p{L}{2,})(\P{L}.*|$)")


def fix_runons(
    line: str,
    words: set[str],
    prefix_ignore: set[str] | None = None,
    suffix_ignore: set[str] | None = None,
) -> str:
    prefix_ignore = prefix_ignore or set()
    suffix_ignore = suffix_ignore or set()
    out: list[str] = []
    for tok in line.split(" "):
        m = CANDIDATE.match(tok)
        if m:
            before, prefix, sep, suffix, after = m.groups()
            plow, slow = prefix.lower(), suffix.lower()
            if (
                plow not in prefix_ignore
                and slow not in suffix_ignore
                and plow in words
                and slow in words
            ):
                out.append(f"{before}{prefix}{sep} {suffix}{after}")
                continue
        out.append(tok)
    return " ".join(out)


def rofl_udf(words_bc, prefix_bc=None, suffix_bc=None):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _rofl(texts: pd.Series) -> pd.Series:
        words = words_bc.value
        pre = prefix_bc.value if prefix_bc is not None else set()
        suf = suffix_bc.value if suffix_bc is not None else set()
        return texts.map(lambda t: fix_runons(t, words, pre, suf) if t else t)

    return _rofl
