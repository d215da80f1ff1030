"""MJPEG-in-MP4 container: writer/parser round-trip, sample tables,
frame-sampling, hardening against malformed boxes, and the distributed
sample_frames path over an MP4 payload (operators/mp4.py)."""

import numpy as np
import pytest

from texrex_spark.operators import multimodal as mm
from texrex_spark.operators.jpeg import decode_jpeg, encode_jpeg
from texrex_spark.operators.mp4 import (
    Mp4Error,
    decode_mjpeg_frames,
    encode_mjpeg_mp4,
    parse_mp4,
    video_track,
)


def _frames(n=6, h=32, w=48):
    yy = np.linspace(0, 4 * np.pi, h)[:, None]
    xx = np.linspace(0, 4 * np.pi, w)[None, :]
    out = []
    for i in range(n):
        base = 128 + 90 * np.sin(yy + 0.5 * i) * np.cos(xx)
        out.append(
            np.clip(
                np.stack([base, np.roll(base, 3, 0), np.roll(base, 3, 1)], -1),
                0, 255,
            ).astype(np.uint8)
        )
    return out


def test_roundtrip_metadata():
    payload = encode_mjpeg_mp4(_frames(6), fps=10)
    info = parse_mp4(payload)
    assert info["timescale"] == 1000 and info["duration_ms"] == 600
    t = video_track(payload)
    assert t["kind"] == "video" and t["codec"] == "jpeg"
    assert (t["width"], t["height"]) == (48, 32)
    assert t["n_samples"] == 6 and t["duration_ms"] == 600
    # constant 100ms frame cadence from stts
    assert [s[2] for s in t["samples"]] == [0, 100, 200, 300, 400, 500]


def test_frames_decode_identical_to_direct_jpeg():
    frames = _frames(4)
    payload = encode_mjpeg_mp4(frames, fps=25, quality=90)
    decoded = decode_mjpeg_frames(payload)
    assert [i for i, _, _ in decoded] == [0, 1, 2, 3]
    for (_, _, got), f in zip(decoded, frames):
        direct = decode_jpeg(encode_jpeg(f, quality=90, subsampling="444"))
        assert np.array_equal(got, direct)


def test_every_k_sampling():
    payload = encode_mjpeg_mp4(_frames(7), fps=5)
    got = decode_mjpeg_frames(payload, every_k=3)
    assert [i for i, _, _ in got] == [0, 3, 6]
    assert [ms for _, ms, _ in got] == [0, 600, 1200]


def test_non_mjpeg_codec_is_not_implemented():
    payload = bytearray(encode_mjpeg_mp4(_frames(2)))
    idx = payload.find(b"jpeg", payload.find(b"stsd"))
    payload[idx : idx + 4] = b"avc1"
    with pytest.raises(NotImplementedError):
        decode_mjpeg_frames(bytes(payload))


@pytest.mark.parametrize(
    "mangle",
    [
        lambda p: p[:40],                       # truncated mid-mdat
        lambda p: p[: len(p) // 2],             # moov cut off
        lambda p: b"\x00" * 16,                 # no boxes at all
        lambda p: p[:-10],                      # stco clipped inside moov
    ],
)
def test_malformed_payloads_raise_value_error(mangle):
    payload = encode_mjpeg_mp4(_frames(3))
    bad = mangle(payload)
    with pytest.raises(ValueError):
        parse_mp4(bad)


def test_hostile_sample_count_bounded():
    """An stsz claiming 2^31 samples must raise, not allocate."""
    import struct

    payload = bytearray(encode_mjpeg_mp4(_frames(2)))
    idx = payload.find(b"stsz")
    # fullbox(4) + fixed-size field(4), then the count word
    struct.pack_into(">I", payload, idx + 4 + 4 + 4, 2**31 - 1)
    with pytest.raises(Mp4Error):
        parse_mp4(bytes(payload))


def test_video_feature_row_matches_sample_tables():
    frames = _frames(5, h=24, w=40)
    payload = encode_mjpeg_mp4(frames, fps=10, quality=90)
    v = mm.video_feature_row("v/0", payload)
    assert v["codec"] == "jpeg" and v["n_frames"] == 5
    assert (v["width"], v["height"]) == (40, 24)
    assert v["duration_ms"] == 500
    # mean over every-2nd-frame lumas, computed independently
    lumas = [
        mm._luma(decode_jpeg(encode_jpeg(f, quality=90, subsampling="444")))
        for f in frames[::2]
    ]
    assert v["mean_intensity"] == pytest.approx(
        float(np.mean([f.mean() for f in lumas]))
    )


def test_sample_frames_distributed_mp4(spark):
    frames = _frames(6, h=20, w=28)
    payload = encode_mjpeg_mp4(frames, fps=25)
    media = spark.createDataFrame(
        [("v/clip", "video", payload,
          {"width": 28, "height": 20, "duration_ms": 240, "mime": "video/mp4"})],
        "media_ref string, kind string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int,mime:string>",
    )
    out = {r["media_ref"]: r for r in mm.sample_frames(media, every_k=2).collect()}
    assert set(out) == {"v/clip#0", "v/clip#2", "v/clip#4"}
    for r in out.values():
        assert r["meta"]["mime"] == "image/x-portable-pixmap"
        assert (r["meta"]["width"], r["meta"]["height"]) == (28, 20)
    # emitted PPM frame is byte-decodable and equals the direct decode
    got = mm.decode_ppm(bytes(out["v/clip#2"]["payload"]))
    direct = decode_jpeg(encode_jpeg(frames[2], quality=90, subsampling="444"))
    assert np.array_equal(got, direct)
