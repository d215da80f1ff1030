"""Differential pin: the vectorized LZW kernel (operators/lzw.py) equals
the original scalar decoders byte-for-byte on valid streams and matches
their error behaviour on corrupted ones (r06 optimization)."""

import numpy as np
import pytest

from texrex_spark.operators import gif as gifmod
from texrex_spark.operators import tiff as tiffmod


def _outcome(fn, *args):
    try:
        return ("ok", fn(*args))
    except (tiffmod.TiffError, gifmod.GifError) as e:
        return ("err", type(e).__name__, str(e))


def _tiff_payloads():
    rng = np.random.default_rng(0xC0FFEE)
    outs = []
    # compressible, gradient-ish, and long enough to force clears (>4093
    # codes) plus every width bump
    for n, mode in [(300, "runs"), (5000, "noise"), (60000, "mixed"), (9, "tiny")]:
        if mode == "runs":
            data = np.repeat(rng.integers(0, 6, n // 10 + 1), 10)[:n]
        elif mode == "noise":
            data = rng.integers(0, 256, n)
        elif mode == "tiny":
            data = np.arange(n)
        else:
            a = np.repeat(rng.integers(0, 9, n // 8 + 1), 8)[:n]
            b = rng.integers(0, 256, n)
            data = np.where(rng.random(n) < 0.7, a, b)
        outs.append(bytes(data.astype(np.uint8)))
    return outs


@pytest.mark.parametrize("idx", range(4))
def test_tiff_roundtrip_matches_scalar(idx):
    raw = _tiff_payloads()[idx]
    enc = tiffmod.lzw_encode(raw)
    got_vec = tiffmod.lzw_decode(enc, len(raw))
    got_ref = tiffmod.lzw_decode_scalar(enc, len(raw))
    assert got_vec == got_ref == raw


@pytest.mark.parametrize("idx", range(4))
def test_gif_roundtrip_matches_scalar(idx):
    raw = _tiff_payloads()[idx]
    for mcs in (2, 4, 8):
        idxs = np.frombuffer(raw, np.uint8) % (1 << mcs)
        enc = gifmod._lzw_encode(idxs.astype(np.uint8), mcs)
        v = _outcome(gifmod._lzw_decode, enc, mcs, len(idxs))
        s = _outcome(gifmod._lzw_decode_scalar, enc, mcs, len(idxs))
        assert v[0] == s[0] == "ok"
        assert np.array_equal(v[1], s[1]) and np.array_equal(v[1], idxs)


def test_tiff_corruption_differential():
    raw = _tiff_payloads()[2]
    enc = bytearray(tiffmod.lzw_encode(raw))
    rng = np.random.default_rng(7)
    agree = 0
    for _ in range(300):
        mut = bytearray(enc)
        kind = rng.integers(0, 3)
        if kind == 0:  # flip bytes
            for p in rng.integers(0, len(mut), rng.integers(1, 6)):
                mut[int(p)] = int(rng.integers(0, 256))
        elif kind == 1:  # truncate
            mut = mut[: int(rng.integers(0, len(mut)))]
        else:  # expected-length lie
            pass
        exp = len(raw) if kind != 2 else int(rng.integers(0, 2 * len(raw)))
        v = _outcome(tiffmod.lzw_decode, bytes(mut), exp)
        s = _outcome(tiffmod.lzw_decode_scalar, bytes(mut), exp)
        assert v == s, (kind, exp, v[:2], s[:2])
        agree += 1
    assert agree == 300


def test_gif_corruption_differential():
    raw = np.frombuffer(_tiff_payloads()[2], np.uint8) % 16
    enc = bytearray(gifmod._lzw_encode(raw.astype(np.uint8), 4))
    rng = np.random.default_rng(11)
    for _ in range(300):
        mut = bytearray(enc)
        kind = rng.integers(0, 3)
        if kind == 0:
            for p in rng.integers(0, len(mut), rng.integers(1, 6)):
                mut[int(p)] = int(rng.integers(0, 256))
        elif kind == 1:
            mut = mut[: int(rng.integers(0, len(mut)))]
        exp = len(raw) if kind != 2 else int(rng.integers(0, 2 * len(raw)))
        v = _outcome(gifmod._lzw_decode, bytes(mut), 4, exp)
        s = _outcome(gifmod._lzw_decode_scalar, bytes(mut), 4, exp)
        if v[0] == s[0] == "ok":
            assert np.array_equal(v[1], s[1])
        else:
            assert v == s, (kind, exp, v[:2], s[:2])


def test_lzw_edges():
    # zero expected bytes: both decoders return empty without touching data
    assert tiffmod.lzw_decode(b"", 0) == tiffmod.lzw_decode_scalar(b"", 0) == b""
    # empty stream with expected > 0: same exhaustion error
    v = _outcome(tiffmod.lzw_decode, b"", 5)
    s = _outcome(tiffmod.lzw_decode_scalar, b"", 5)
    assert v == s and v[0] == "err"


def test_sessionize_kernel_fused_matches_per_user():
    """r06: the fused cross-user sessionize kernel equals the per-user
    kernel on a randomized multi-user event set (incl. gap ties and
    single-event users)."""
    import pandas as pd

    from texrex_spark.operators.sessionize import _sessionize_many, sessionize_pdf

    rng = np.random.default_rng(3)
    rows = []
    for uid in range(40):
        n = int(rng.integers(1, 60))
        ts = np.cumsum(rng.integers(0, 2500, n)) + int(rng.integers(0, 1000))
        rows.extend((uid, int(t)) for t in ts)
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_s"]).sort_values(
        ["user_id", "ts_s"], kind="stable", ignore_index=True
    )
    fused = _sessionize_many(pdf, 1800)
    per_user = pd.concat(
        [sessionize_pdf(g, 1800) for _, g in pdf.groupby("user_id")],
        ignore_index=True,
    )
    a = fused.sort_values(["user_id", "session_id"], ignore_index=True)
    b = per_user.sort_values(["user_id", "session_id"], ignore_index=True)
    assert a.astype("int64").equals(b.astype("int64"))
