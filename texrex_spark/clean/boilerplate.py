"""Deboilerplater: 37 features per div + MLP score + document thresholds
(/root/reference/src/units/trdeboilerplater.pas).

Feature indices [0..36] match the reference exactly (:338-616):

  0  clamped text length (codepoints / TextClamp=1000)
  1  share of document text mass
  2  distance from middle by text mass        3  ... by div index
  4  whole-document text/raw ratio (FCurrentDocumentMarkupRatio, :260-262)
  5  markup proportion (raw-text)/raw         6  punctuation / length
  7  letters / true length                    8  digits / true length
  9-12  cleansed tag/email/uri/hashtag counts / true length
  13 year matches / true length               14 anchors / true length
  15 upper/(upper+lower)                      16 bogus-sentence flag
  17 clamped avg sentence length (integer div, SentenceLengthClamp=100)
  18 clamped sentence count (SentenceClamp=10)
  19 contains (c)                             20 ends in punctuation
  21-23 doctype one-hot (xhtml, html4, html5)
  24-31 container one-hot (article section div p h block td li)
  32 closing-start flag                       33 open/(open+close) tags
  34 clamped skipped divs (SkippedClamp=20)
  35 +-1-div markup smoothing                 36 +-2-div smoothing (:540-616)

The MLP is a FANN net (37->18->1 in the shipped models); evaluation is two
numpy matmuls.  ``FannNet.parse`` reads the public FANN_FLO_2.1 text format
so reference-trained nets load as-is; ``FannNet.deterministic`` builds a
seeded random net of the same shape for tests (the reference's trained
weights are its data, not re-shipped here).

Decision semantics (:619-699, 290-335): score > Threshold (0.55,
texrex.ini:126) marks the div boilerplate; the document dies when
non-boilerplate divs/chars or their proportions fall below the four
thresholds (defaults 1 div / 0.1 / 500 chars / 0.25).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np
import regex

from .stripper import Div

_PUNCT = regex.compile(r"\p{P}")
_NUMBER = regex.compile(r"\p{N}")
_UPPER = regex.compile(r"\p{Lu}")
_LOWER = regex.compile(r"\p{Ll}")
_SENTENCE = regex.compile(r"[.?!](?:\s|$)")
_ENDS_PUNCT = regex.compile(r".*[.?!] *$")
_YEAR = regex.compile(r"[^0-9](20[01][0-9])([^0-9]|$)")
_WS = re.compile(r"\s")
_COPYRIGHT = "©"

DOCTYPES = ["xhtml", "html4", "html5"]
CONTAINERS = ["article", "section", "div", "p", "h", "block", "td", "li"]

N_FEATURES = 37


@dataclass
class BoilerplateConfig:
    threshold: float = 0.55
    min_divs_below: int = 1
    min_div_proportion_below: float = 0.1
    min_chars_below: int = 500
    min_char_proportion_below: float = 0.25
    text_clamp: int = 1000
    sentence_clamp: int = 10
    sentence_length_clamp: int = 100
    skipped_clamp: int = 20
    custom_regex: str = ""  # e.g. the "read more" pattern, texrex.ini:125


def div_features(
    divs: list[Div], doctype: str, raw_size: int, cfg: BoilerplateConfig | None = None
) -> np.ndarray:
    """(n_divs, 37) feature matrix; invalid divs get zero rows (and rows
    for divs invalidated here — empty true text — stay zero)."""
    cfg = cfg or BoilerplateConfig()
    n = len(divs)
    feats = np.zeros((n, N_FEATURES), dtype=np.float64)
    doc_len = sum(len(d.text) for d in divs if d.valid)
    if raw_size > 1 and doc_len > 1:
        doc_markup_ratio = doc_len / raw_size
    else:
        return feats  # document invalid (:258-266); caller checks

    text_mass = 0
    for i, d in enumerate(divs):
        if not d.valid:
            continue
        length_raw = max(d.last_raw - d.first_raw, 1)
        length_text = max(len(d.text), 1)

        feats[i, 0] = min(length_text / cfg.text_clamp, 1.0)
        true_len = length_text - len(_WS.findall(d.text))
        if true_len < 1:
            d.valid = False
            continue
        feats[i, 1] = length_text / doc_len if doc_len > 0 else 0.0
        if doc_len > 0:
            pct = (text_mass + length_text / 2) / doc_len
            pct = (pct - 0.5) * 2 if pct > 0.5 else (0.5 - pct) * 2
        else:
            pct = 1.0
        feats[i, 2] = pct
        text_mass += length_text
        dpct = i / n if n > 0 else 1.0
        dpct = (dpct - 0.5) * 2 if dpct > 0.5 else (0.5 - dpct) * 2
        feats[i, 3] = dpct
        feats[i, 4] = doc_markup_ratio

        sent = len(_SENTENCE.findall(d.text))
        upper = len(_UPPER.findall(d.text))
        lower = len(_LOWER.findall(d.text))
        letters = upper + lower
        number = len(_NUMBER.findall(d.text))
        punct = len(_PUNCT.findall(d.text))
        year = len(_YEAR.findall(d.text))

        feats[i, 5] = (length_raw - length_text) / length_raw
        feats[i, 6] = punct / length_text
        feats[i, 7] = letters / true_len
        feats[i, 8] = number / true_len
        feats[i, 9] = d.cleansed_tags / true_len
        feats[i, 10] = d.cleansed_emails / true_len
        feats[i, 11] = d.cleansed_uris / true_len
        feats[i, 12] = d.cleansed_hashtags / true_len
        feats[i, 13] = year / true_len
        feats[i, 14] = d.anchors / true_len
        feats[i, 15] = upper / letters if letters > 0 else 0.0
        if sent > 0:
            feats[i, 16] = 0.0
        else:
            sent = 1
            feats[i, 16] = 1.0
        feats[i, 17] = min((length_text // sent) / cfg.sentence_length_clamp, 1.0)
        feats[i, 18] = min(sent / cfg.sentence_clamp, 1.0)
        feats[i, 19] = 1.0 if _COPYRIGHT in d.text else 0.0
        feats[i, 20] = 1.0 if _ENDS_PUNCT.match(d.text) else 0.0
        for k, dt in enumerate(DOCTYPES):
            feats[i, 21 + k] = 1.0 if doctype == dt else 0.0
        for k, ct in enumerate(CONTAINERS):
            feats[i, 24 + k] = 1.0 if d.container == ct else 0.0
        feats[i, 32] = 1.0 if d.closing_start else 0.0
        total_tags = d.open_tags + d.close_tags
        feats[i, 33] = d.open_tags / total_tags if total_tags > 0 else 0.0
        feats[i, 34] = min(d.skipped_divs / cfg.skipped_clamp, 1.0)

    # second pass: +-1 / +-2 markup smoothing over feature [5] (:540-616)
    mark = 5
    for i, d in enumerate(divs):
        if not d.valid:
            continue
        ratio = feats[i, mark]
        left = i - 1 if i > 0 else 0
        ratio += feats[left, mark] if divs[left].valid else ratio
        right = i + 1 if i < n - 1 else n - 1
        ratio += feats[right, mark] if divs[right].valid else ratio
        feats[i, 35] = ratio / 3
        w2 = 0.0
        if i > 1:
            w2 += feats[i - 2, mark] if divs[i - 2].valid else ratio / 2
        else:
            w2 = feats[0, mark] if divs[0].valid else w2 + ratio / 2
        if i < n - 2:
            w2 += feats[i + 2, mark] if divs[i + 2].valid else ratio / 2
        else:
            w2 = feats[n - 1, mark] if divs[n - 1].valid else w2 + ratio / 2
        feats[i, 36] = (ratio + w2) / 5
    return feats


# ---------------------------------------------------------------------------
# FANN net
# ---------------------------------------------------------------------------

_SIGMOID = {3, 4}  # FANN_SIGMOID, FANN_SIGMOID_STEPWISE
_SYMMETRIC = {5, 6}  # FANN_SIGMOID_SYMMETRIC(+STEPWISE)
_LINEAR_PIECE = 12  # clip(x*s, 0, 1)
_LINEAR_PIECE_SYMMETRIC = 13  # clip(x*s, -1, 1) — the shipped nets' output


class FannNet:
    """Minimal FANN_FLO_2.1 fully-connected evaluator (two matmuls for the
    shipped 38-19-2 shape).  Public format: http://leenissen.dk/fann/."""

    def __init__(self, layer_sizes, weights, activations, steepness):
        self.layer_sizes = layer_sizes  # incl. bias neurons, like the file
        self.weights = weights  # list of (prev_size, next_real) matrices
        self.activations = activations  # per layer (code)
        self.steepness = steepness

    @classmethod
    def parse(cls, text: str) -> "FannNet":
        sizes = []
        neurons: list[tuple[int, int, float]] = []
        conns: list[tuple[int, float]] = []
        for line in text.splitlines():
            if line.startswith("layer_sizes="):
                sizes = [int(x) for x in line.split("=", 1)[1].split()]
            elif line.startswith("neurons "):
                body = line.split("=", 1)[1]
                neurons = [
                    (int(a), int(b), float(c))
                    for a, b, c in re.findall(
                        r"\(([-\d]+), ([-\d]+), ([-\deE.+]+)\)", body
                    )
                ]
            elif line.startswith("connections "):
                body = line.split("=", 1)[1]
                conns = [
                    (int(a), float(b))
                    for a, b in re.findall(r"\(([-\d]+), ([-\deE.+]+)\)", body)
                ]
        if not sizes or not neurons:
            raise ValueError("not a FANN_FLO_2.1 net")
        weights, acts, steeps = [], [], []
        ci = 0
        neuron_offset = sizes[0]
        prev_size = sizes[0]
        for li in range(1, len(sizes)):
            real = sizes[li] - 1 if li < len(sizes) - 1 else sizes[li] - 1
            # FANN counts a bias neuron in every layer incl. output; the
            # output layer's bias has no outgoing connections.
            w = np.zeros((prev_size, real))
            layer_neurons = neurons[neuron_offset : neuron_offset + sizes[li]]
            a_codes, s_vals = [], []
            for jn, (num_in, act, steep) in enumerate(layer_neurons[:real]):
                for k in range(num_in):
                    w[k, jn] = conns[ci][1]
                    ci += 1
                a_codes.append(act)
                s_vals.append(steep)
            weights.append(w)
            acts.append(a_codes[0] if a_codes else 0)
            steeps.append(s_vals[0] if s_vals else 0.5)
            neuron_offset += sizes[li]
            prev_size = sizes[li]
        return cls(sizes, weights, acts, steeps)

    @classmethod
    def deterministic(cls, n_in: int = 37, n_hidden: int = 18, seed: int = 7) -> "FannNet":
        rng = np.random.default_rng(seed)
        w1 = rng.normal(0, 1.0, (n_in + 1, n_hidden))
        w2 = rng.normal(0, 1.0, (n_hidden + 1, 1))
        return cls([n_in + 1, n_hidden + 1, 2], [w1, w2], [3, 3], [0.5, 0.5])

    @staticmethod
    def _activate(x: np.ndarray, code: int, steep: float) -> np.ndarray:
        if code in _SIGMOID:
            return 1.0 / (1.0 + np.exp(-2.0 * steep * x))
        if code in _SYMMETRIC:
            return np.tanh(steep * x)
        if code == _LINEAR_PIECE:
            return np.clip(x * steep, 0.0, 1.0)
        if code == _LINEAR_PIECE_SYMMETRIC:
            return np.clip(x * steep, -1.0, 1.0)
        return x * steep  # linear

    def run(self, features: np.ndarray) -> np.ndarray:
        """(n, 37) features -> (n,) scores."""
        x = features
        for li, w in enumerate(self.weights):
            x = np.hstack([x, np.ones((x.shape[0], 1))])  # bias input = 1
            x = self._activate(x @ w, self.activations[li], self.steepness[li])
        return x[:, 0]


# ---------------------------------------------------------------------------
# stage driver
# ---------------------------------------------------------------------------


@dataclass
class BoilerplateResult:
    doc_valid: bool
    boilerplate_divs: int
    non_boilerplate_divs: int
    boilerplate_chars: int
    non_boilerplate_chars: int
    avg_score_div: float
    avg_score_char: float


def deboilerplate(
    divs: list[Div],
    doctype: str,
    raw_size: int,
    net: FannNet,
    cfg: BoilerplateConfig | None = None,
) -> BoilerplateResult:
    cfg = cfg or BoilerplateConfig()
    custom = regex.compile(cfg.custom_regex) if cfg.custom_regex else None
    doc_len = sum(len(d.text) for d in divs if d.valid)
    if raw_size <= 1 or doc_len <= 1:
        return BoilerplateResult(False, 0, 0, 0, 0, -1.0, -1.0)
    feats = div_features(divs, doctype, raw_size, cfg)
    valid_idx = [i for i, d in enumerate(divs) if d.valid]
    if not valid_idx:
        return BoilerplateResult(False, 0, 0, 0, 0, -1.0, -1.0)
    scores = net.run(feats[valid_idx])
    bp_divs = nbp_divs = bp_chars = nbp_chars = 0
    sum_div = sum_char = 0.0
    for j, i in enumerate(valid_idx):
        d = divs[i]
        d.boilerplate_score = float(scores[j])
        if custom is not None and custom.match(d.text):
            d.boilerplate_score = max(d.boilerplate_score, 1.0)
        if d.boilerplate_score > cfg.threshold:
            bp_divs += 1
            bp_chars += len(d.text)
        else:
            nbp_divs += 1
            nbp_chars += len(d.text)
        sum_div += d.boilerplate_score
        sum_char += d.boilerplate_score * len(d.text)
    valid_chars = sum(len(divs[i].text) for i in valid_idx)
    avg_div = sum_div / len(valid_idx)
    avg_char = sum_char / valid_chars if valid_chars else -1.0

    doc_valid = True
    if nbp_divs < cfg.min_divs_below:
        doc_valid = False
    if nbp_chars < cfg.min_chars_below:
        doc_valid = False
    tot_chars = bp_chars + nbp_chars
    if tot_chars > 0:
        if nbp_chars / tot_chars < cfg.min_char_proportion_below:
            doc_valid = False
    else:
        doc_valid = False
    tot_divs = bp_divs + nbp_divs
    if tot_divs > 0:
        if nbp_divs / tot_divs < cfg.min_div_proportion_below:
            doc_valid = False
    else:
        doc_valid = False
    return BoilerplateResult(
        doc_valid, bp_divs, nbp_divs, bp_chars, nbp_chars, avg_div, avg_char
    )
