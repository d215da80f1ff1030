#!/usr/bin/env python3
"""Single-process cProfile of clean_document over the bench corpus.

The distributed chain (clean/chain.clean_docs) is mapInPandas over
clean_document; profiling the kernel in-process is representative because
the operator is map-only — there is no shuffle to hide (SCALE.md clean
chain row).  Output: cumulative-time top functions per chain stage, so
each round's optimization target (VERDICT r04 #8) is measured, not
guessed.

Usage: python3 bench/profile_chain.py [n_docs]   # default 2000
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from texrex_spark.clean.chain import ChainConfig, clean_document
    from texrex_spark.sources import synth

    corpus = synth.generate(n_hosts=max(n_docs // 50, 4), n_docs=n_docs, seed=1234)
    docs = [(d.doc_id, d.url, d.raw_html) for d in corpus.docs]
    cfg = ChainConfig(use_assessment=False, shingle_hashes=100)

    # warm-up (Rabin tables, regex compiles, first-touch pages)
    for doc_id, url, raw in docs[:50]:
        clean_document(str(doc_id), url, raw, cfg, defer_shingle=True,
                       want_div_stats=False)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    for doc_id, url, raw in docs:
        clean_document(str(doc_id), url, raw, cfg, defer_shingle=True,
                       want_div_stats=False)
    prof.disable()
    wall = time.time() - t0
    print(f"# {n_docs} docs in {wall:.2f}s = {n_docs / wall:,.0f} docs/s "
          "(single process, shingle deferred)")

    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(35)
    print(s.getvalue())

    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("tottime")
    ps.print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
