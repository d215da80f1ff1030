"""Reference-trained artifacts: FANN nets, .prof profiles, utf8.norm.

These tests certify the loaders against the reference's own shipped data
(reference data/ dir, read-only): the FANN evaluator must reproduce the
trained nets' decisions on their own training sets, the profiles must
drive multi-language assessment, and the normalizer must apply the
utf8.norm replacement list with trnormalizer.pas:126-178 semantics.
"""

import os

import numpy as np
import pytest

from texrex_spark import refdata

pytestmark = pytest.mark.skipif(
    not refdata.available(), reason="reference data dir not present"
)


def _training_data(lang):
    path = os.path.join(refdata.DATA_DIR, f"boilerplate.{lang}.dat")
    if not os.path.exists(path):
        pytest.skip(f"no training data for {lang}")
    lines = open(path).read().split("\n")
    n, ni, no = map(int, lines[0].split())
    X = np.array([[float(x) for x in lines[1 + 2 * i].split()] for i in range(n)])
    y = np.array([float(lines[2 + 2 * i]) for i in range(n)])
    return X, y


@pytest.mark.parametrize("lang", ["de", "en", "fr", "sv"])
def test_fann_net_reproduces_training_decisions(lang):
    """The parsed net at the reference's 0.55 threshold (texrex.ini:126)
    must classify its own training set far above base rate — evidence the
    FANN_FLO_2.1 parse (weights, bias layout, SIGMOID_SYMMETRIC hidden +
    LINEAR_PIECE_SYMMETRIC output) is faithful."""
    net = refdata.load_boilerplate_net(lang)
    assert net is not None and net.layer_sizes == [38, 19, 2]
    X, y = _training_data(lang)
    scores = net.run(X)
    assert -1.0 <= scores.min() and scores.max() <= 1.0  # clipped output
    acc = ((scores > 0.55).astype(float) == y).mean()
    base = max(y.mean(), 1 - y.mean())
    assert acc > 0.97, f"{lang}: acc {acc:.3f}"
    assert acc > base + 0.05


def test_profiles_drive_language_id():
    from collections import Counter

    from texrex_spark.clean.assess import assess_multi
    from texrex_spark.clean.tokenize import TypeTokenData, tokenize_text

    profiles = refdata.load_profiles(("de", "en", "es", "fr"))
    assert len(profiles) == 4
    de = (
        "die der und in das den zu ist von ich die der und in das den zu "
        "ist von ich die der und sagte dass es in der tat so ist"
    )
    en = (
        "the of and to in a is for that on the of and to in a is for that "
        "on said that it is in fact the case for a review of the report"
    )
    for text, want in [(de, "de"), (en, "en")]:
        toks = tokenize_text(text)
        ttd = TypeTokenData(tokens=toks, types=Counter(toks))
        lang, badness = assess_multi(ttd, profiles, good_enough=15.0)
        assert lang == want, (text[:30], lang, badness)
        assert badness < 35.0


def test_gibberish_fails_assessment():
    from collections import Counter

    from texrex_spark.clean.assess import assess_multi
    from texrex_spark.clean.tokenize import TypeTokenData, tokenize_text

    profiles = refdata.load_profiles(("de", "en", "es", "fr"))
    toks = tokenize_text("zzz qqq xxp vvk " * 30)
    ttd = TypeTokenData(tokens=toks, types=Counter(toks))
    lang, badness = assess_multi(ttd, profiles)
    assert badness > 35.0  # every profile word missing -> limit each


def test_norm_table_loads_and_applies():
    from texrex_spark.clean.normalize import normalize_text

    table = refdata.load_norm_table()
    assert len(table) > 100  # 139 rules in the shipped utf8.norm
    # mojibake repair rules from the file's broken-UTF8 section
    assert ("Ã¤", "ä") in table
    # dash/hyphen unification section: en dash, em dash, minus -> '-'
    for dash in ["–", "—", "−"]:
        assert normalize_text(f"a {dash} b", table) == "a - b"
    # NBSP/ZWSP always deleted first (trnormalizer.pas:165-177), no table
    assert normalize_text("a b​c", table) == "abc"
    # first-LHS-wins dedup: no duplicate LHS survives the loader
    lhs = [l for l, _ in table]
    assert len(lhs) == len(set(lhs))


def test_deboilerplater_doc_thresholds_with_real_net():
    """Document-level kill semantics (trdeboilerplater.pas:290-335,619-699):
    defaults 1 div / 0.1 / 500 chars / 0.25 below threshold.  A page whose
    only real mass is nav/footer boilerplate dies; a content-rich page
    survives — with the reference-trained iso net doing the scoring."""
    from texrex_spark.plans import fixtures

    exp = {e["tpl"]: e for e in fixtures.chain_expected()}
    assert exp[0]["valid"] and exp[0]["language"] == "de"
    assert exp[1]["valid"] and exp[1]["language"] == "en"
    assert exp[2]["valid"] and exp[2]["language"] == "fr"
    assert not exp[3]["valid"] and exp[3]["killed_by"] == "deboilerplater"
    assert not exp[5]["valid"] and exp[5]["killed_by"] == "assessment"
    # the trained net separates nav/footer from content on template 0
    divs = exp[0]["div_stats"]
    assert divs[0]["boilerplate_score"] > 0.55  # nav
    assert divs[1]["boilerplate_score"] < 0.55  # content paragraph
    assert divs[3]["boilerplate_score"] > 0.55  # footer
    # in-doc div dedup back-reference on the duplicated French paragraph
    assert exp[2]["div_stats"][2]["dup_of"] == 1


def test_entity_and_mojibake_pipeline():
    """Template 1 exercises double-wash (&amp;amp; -> &), rogue Win-1252
    numeric entity (&#150; = $96 -> EN DASH, then utf8.norm -> '-'), and
    mojibake repair (GrÃ¤fe -> Gräfe)."""
    from texrex_spark.plans import fixtures

    e = [x for x in fixtures.chain_expected() if x["tpl"] == 1][0]
    texts = " ".join(t for t, _ in e["spans"])
    assert "Fish & chips" in texts
    assert "Gräfe" in texts
    assert "Ã¤" not in texts
    assert "–" not in texts  # en dash unified to '-'
