"""Real-codec tier of the multimodal pipeline: pure numpy/stdlib PGM, PPM,
BMP, and PCM-WAV encode/decode round-trips, the mime dispatcher, and the
distributed decode -> feature / resize paths over real-format payloads."""

import numpy as np
import pytest

from texrex_spark.operators import multimodal as mm


def _rng():
    return np.random.default_rng(7)


# ---------------- kernel round-trips (no Spark) ----------------


def test_pgm_roundtrip():
    img = _rng().integers(0, 256, (17, 23), dtype=np.uint8)
    assert np.array_equal(mm.decode_pgm(mm.encode_pgm(img)), img)


def test_ppm_roundtrip():
    img = _rng().integers(0, 256, (9, 31, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)


def test_pnm_header_comments_and_whitespace():
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    payload = b"P5\n# a comment\n 3  2 \t255\n" + img.tobytes()
    assert np.array_equal(mm.decode_pgm(payload), img)


def test_bmp_roundtrip_unaligned_width():
    # width 3 -> 9-byte rows padded to 12: exercises the 4-byte stride
    img = _rng().integers(0, 256, (5, 3, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)


def test_bmp_roundtrip_aligned():
    img = _rng().integers(0, 256, (8, 16, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)


def test_wav_roundtrip_mono_and_stereo():
    mono = _rng().integers(-30000, 30000, 500, dtype=np.int16)
    s, rate = mm.decode_wav(mm.encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(s[:, 0], mono)
    stereo = _rng().integers(-30000, 30000, (300, 2), dtype=np.int16)
    s2, rate2 = mm.decode_wav(mm.encode_wav(stereo, 16000))
    assert rate2 == 16000 and np.array_equal(s2, stereo)


def test_dispatcher_luma_and_unsupported():
    rgb = _rng().integers(0, 256, (4, 4, 3), dtype=np.uint8)
    meta = {"width": 4, "height": 4, "duration_ms": 0, "mime": "image/x-portable-pixmap"}
    luma = mm.decode(mm.encode_ppm(rgb), meta)
    assert luma.shape == (4, 4) and luma.dtype == np.uint8
    with pytest.raises(NotImplementedError):
        mm.decode(b"\x00\x00\x00\x18ftypmp42", {**meta, "mime": "video/mp4"})
    # JPEG left the stub tier (operators/jpeg.py): corrupt bytes are a
    # ValueError from the codec, not a missing-codec NotImplementedError
    with pytest.raises(ValueError):
        mm.decode(b"\xff\xd8\xff", {**meta, "mime": "image/jpeg"})


def test_audio_feature_row_matches_numpy():
    samples = _rng().integers(-20000, 20000, 1000, dtype=np.int16)
    payload = mm.encode_wav(samples, 8000)
    f = mm.audio_feature_row("a/1.wav", payload)
    assert f["n_samples"] == 1000 and f["sample_rate"] == 8000
    assert f["duration_ms"] == 125
    assert f["rms"] == pytest.approx(float(np.sqrt(np.mean(samples.astype(float) ** 2))))


def test_synth_real_media_row_covers_all_formats():
    kinds = {}
    for k in range(48):
        row = mm.synth_real_media_row(f"m/{k}")
        kinds.setdefault(row["meta"]["mime"], 0)
        kinds[row["meta"]["mime"]] += 1
        # every payload must decode through the public tier
        if row["kind"] == "audio":
            s, rate = mm.decode_audio(bytes(row["payload"]))
            # meta duration must be consistent with the decoded samples
            assert row["meta"]["duration_ms"] == int(s.shape[0] * 1000 / rate)
        elif row["kind"] == "video":
            from texrex_spark.operators.mp4 import video_track

            t = video_track(bytes(row["payload"]))
            assert t["codec"] == "jpeg"
            assert (t["width"], t["height"]) == (
                row["meta"]["width"], row["meta"]["height"],
            )
            assert t["duration_ms"] == row["meta"]["duration_ms"]
        else:
            img = mm.decode(bytes(row["payload"]), row["meta"])
            assert img.shape == (row["meta"]["height"], row["meta"]["width"])
    assert set(kinds) == {
        "image/x-portable-graymap",
        "image/x-portable-pixmap",
        "image/bmp",
        "image/png",
        "image/jpeg",
        "image/gif",
        "image/webp",
        "image/tiff",
        "image/x-icon",
        "audio/wav",
        "audio/flac",
        "video/mp4",
    }


# ---------------- distributed paths ----------------


@pytest.fixture(scope="module")
def real_media(spark):
    from texrex_spark.clean.chain import ChainConfig, clean_docs
    from texrex_spark.sources import synth

    corpus = synth.generate(n_hosts=4, n_docs=24, seed=31)
    df = synth.docs_df(spark, corpus).select("doc_id", "url", "raw_html")
    cleaned = clean_docs(df, ChainConfig(use_assessment=False, shingle_hashes=4))
    return mm.synth_real_media_df(spark, cleaned).cache()


def test_real_media_features_match_local_kernel(spark, real_media):
    rows = real_media.collect()
    images = [r for r in rows if r["kind"] == "image"]
    assert images
    got = {
        f["media_ref"]: f
        for f in mm.extract_features(
            real_media.where("kind = 'image'")
        ).collect()
    }
    for r in images:
        exp = mm.feature_row(r["media_ref"], bytes(r["payload"]), r["meta"].asDict())
        assert got[r["media_ref"]]["phash"] == exp["phash"]
        assert got[r["media_ref"]]["mean_intensity"] == pytest.approx(exp["mean_intensity"])


def test_real_audio_features_distributed(spark, real_media):
    n_audio = real_media.where("kind = 'audio'").count()
    feats = mm.extract_audio_features(real_media).collect()
    assert len(feats) == n_audio and n_audio > 0
    for f in feats:
        assert f["sample_rate"] in (8000, 16000)
        assert f["duration_ms"] == int(f["n_samples"] * 1000 / f["sample_rate"])


def test_resize_images_preserves_format(spark, real_media):
    out = mm.resize_images(real_media, 8, 6).collect()
    n_images = real_media.where("kind = 'image'").count()
    assert len(out) == n_images
    for r in out:
        img = mm.decode(bytes(r["payload"]), r["meta"].asDict())
        assert img.shape == (6, 8)


# ---------------- video frame sampling (PNM stream) ----------------


def test_pnm_stream_roundtrip():
    rng = _rng()
    frames = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8) for _ in range(7)]
    out = mm.decode_pnm_stream(mm.encode_pnm_stream(frames))
    assert len(out) == 7
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_sample_frames_distributed(spark):
    rng = _rng()
    vids = []
    for v in range(3):
        frames = [rng.integers(0, 256, (4, 4, 3), dtype=np.uint8) for _ in range(10)]
        vids.append(
            {
                "media_ref": f"vid/{v}", "kind": "video",
                "payload": mm.encode_pnm_stream(frames),
                "meta": {"width": 4, "height": 4, "duration_ms": 400,
                         "mime": "video/x-pnm-stream"},
            }
        )
    media = spark.createDataFrame(vids, mm.MEDIA_SCHEMA)
    sampled = mm.sample_frames(media, every_k=3).collect()
    # 10 frames, every 3rd -> indices 0,3,6,9 = 4 per video
    assert len(sampled) == 12
    refs = {r["media_ref"] for r in sampled}
    assert "vid/0#0" in refs and "vid/2#9" in refs
    # sampled frames feed the image pipeline unchanged
    feats = mm.extract_features(spark.createDataFrame(sampled, mm.MEDIA_SCHEMA)).collect()
    assert len(feats) == 12


def test_png_roundtrip_gray_and_rgb():
    """encode_png -> decode_png is the identity for 8-bit gray and RGB
    (pure-stdlib zlib codec; filter-0 scanlines on the encode side)."""
    import numpy as np

    from texrex_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in [(17, 23), (9, 31, 3), (1, 1), (2, 3, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_alpha_channel_counts():
    """encode_png maps channel count -> color type (gray+A=4, RGBA=6);
    a hardcoded RGB color type corrupted re-encoded RGBA payloads
    (ADVICE r03: IHDR said RGB, scanlines carried 4 bytes/pixel)."""
    import numpy as np

    from texrex_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(13)
    for shape in [(7, 11, 4), (5, 9, 2), (3, 4, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        want = img.reshape(img.shape[:2]) if shape[2] == 1 else img
        assert np.array_equal(out, want), shape


def test_png_decode_all_spec_filters():
    """decode_png must unfilter every scanline filter type the spec
    defines (None/Sub/Up/Average/Paeth) — checked against a forward
    filterer written straight from the RFC 2083 equations."""
    import struct
    import zlib

    import numpy as np

    from texrex_spark.operators.multimodal import decode_png

    def forward_filter(img, ftype):
        h, w = img.shape[:2]
        ch = 1 if img.ndim == 2 else img.shape[2]
        raw = img.reshape(h, w * ch).astype(np.int32)
        out = b""
        for y in range(h):
            prior = raw[y - 1] if y else np.zeros(w * ch, np.int32)
            line = raw[y]
            f = np.empty(w * ch, np.int32)
            for x in range(w * ch):
                a = line[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if (x >= ch and y) else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f[x] = (line[x] - pred) & 255
            out += bytes([ftype]) + f.astype(np.uint8).tobytes()
        return out

    def mk_png(img, ftype):
        h, w = img.shape[:2]
        color = 0 if img.ndim == 2 else 2

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(forward_filter(img, ftype)))
            + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(13)
    for ftype in range(5):
        for shape in [(12, 7), (8, 5, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(decode_png(mk_png(img, ftype)), img), ftype


def test_png_rejects_corrupt_and_unsupported():
    import struct

    import numpy as np
    import pytest

    from texrex_spark.operators.multimodal import decode_png, encode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    good = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    good[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    # 16-bit depth is out of scope and must say so, not mis-decode
    bad_hdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    import zlib as _z

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", _z.crc32(t + d) & 0xFFFFFFFF)

    payload = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", bad_hdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(payload)


def test_png_flows_through_feature_and_resize(spark):
    """A PNG payload goes through the distributed decode -> feature and
    resize stages like any uncompressed format (it left the stub tier)."""
    import numpy as np

    from texrex_spark.operators.multimodal import (
        decode_png, encode_png, extract_features, resize_images,
    )

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [("m/png", "image", bytearray(encode_png(img)),
          {"width": 30, "height": 20, "duration_ms": 0, "mime": "image/png"})],
        "media_ref string, kind string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int,mime:string>",
    )
    feats = extract_features(media).collect()
    assert len(feats) == 1 and feats[0].width == 30 and feats[0].height == 20
    resized = resize_images(media, 8, 6).collect()
    assert len(resized) == 1
    out = decode_png(bytes(resized[0].payload))
    assert out.shape == (6, 8, 3)
    assert resized[0].meta.mime == "image/png"


def test_png_rgba_resize_roundtrip(spark):
    """RGBA PNG survives the distributed resize stage: decode (h,w,4) ->
    nearest-neighbor -> re-encode as color type 6 -> decodable, alpha
    intact (the ADVICE r03 silent-corruption scenario)."""
    import numpy as np

    from texrex_spark.operators.multimodal import (
        decode_png, encode_png, resize_images,
    )

    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (16, 24, 4), dtype=np.uint8)
    media = spark.createDataFrame(
        [("m/rgba", "image", bytearray(encode_png(img)),
          {"width": 24, "height": 16, "duration_ms": 0, "mime": "image/png"})],
        "media_ref string, kind string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int,mime:string>",
    )
    resized = resize_images(media, 8, 6).collect()
    assert len(resized) == 1
    out = decode_png(bytes(resized[0].payload))
    assert out.shape == (6, 8, 4)
    # nearest-neighbor: every output pixel is an input pixel, all 4 channels
    ys = np.linspace(0, 15, 6).astype(int)
    xs = np.linspace(0, 23, 8).astype(int)
    assert np.array_equal(out, img[np.ix_(ys, xs)])


# ---------------- baseline JPEG codec (operators/jpeg.py) ----------------


def _smooth_rgb(h, w, seed=7):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)[None, :]
    y = np.linspace(0, 255, h)[:, None]
    base = np.clip((x + y) / 2 + rng.normal(0, 2, (h, w)), 0, 255)
    # photo-like: one smooth luma field, slowly-varying chroma (fast
    # chroma is exactly what 4:2:0 subsampling is allowed to destroy)
    return np.clip(
        np.stack([base, 0.8 * base + 20, 0.6 * base + 50], axis=-1), 0, 255
    ).astype(np.uint8)


def test_jpeg_roundtrip_gray_and_rgb():
    from texrex_spark.operators.jpeg import decode_jpeg, encode_jpeg

    gray = _smooth_rgb(64, 64)[..., 0]
    dec = decode_jpeg(encode_jpeg(gray, quality=90))
    assert dec.shape == (64, 64) and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - gray.astype(int)).mean() < 4

    rgb = _smooth_rgb(48, 56)
    dec3 = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert dec3.shape == (48, 56, 3)
    assert np.abs(dec3.astype(int) - rgb.astype(int)).mean() < 6


def test_jpeg_420_subsampling_and_odd_sizes():
    from texrex_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rgb = _smooth_rgb(37, 45)  # non-multiples of the 16x16 MCU
    enc = encode_jpeg(rgb, quality=92, subsampling="420")
    dec = decode_jpeg(enc)
    assert dec.shape == (37, 45, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 8
    # 4:2:0 must be smaller than 4:4:4 at equal quality
    assert len(enc) < len(encode_jpeg(rgb, quality=92, subsampling="444"))


def test_jpeg_restart_markers():
    from texrex_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rgb = _smooth_rgb(40, 40)
    plain = decode_jpeg(encode_jpeg(rgb, quality=90))
    with_rst = decode_jpeg(encode_jpeg(rgb, quality=90, restart_interval=2))
    # restart segmentation is a bitstream framing detail — identical pixels
    assert np.array_equal(plain, with_rst)


def test_jpeg_rejects_corrupt_and_progressive():
    import struct

    from texrex_spark.operators.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    good = encode_jpeg(_smooth_rgb(24, 24), quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(good[:60])  # truncated before the scan
    # flip SOF0 -> SOF2: the baseline scan header (Ss=0, Se=63) is invalid
    # under a progressive frame — corrupt input, not a missing codec
    sof = good.find(b"\xff\xc0")
    prog = good[:sof] + b"\xff\xc2" + good[sof + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # lossless (SOF3) remains the honest NotImplementedError tier
    lossless = good[:sof] + b"\xff\xc3" + good[sof + 2 :]
    with pytest.raises(NotImplementedError):
        decode_jpeg(lossless)


def test_jpeg_flows_through_decode_and_resize(spark):
    from texrex_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from texrex_spark.operators.multimodal import resize_images

    rgb = _smooth_rgb(32, 32)
    media = spark.createDataFrame(
        [("m/j", "image", bytearray(encode_jpeg(rgb, quality=90)),
          {"width": 32, "height": 32, "duration_ms": 0, "mime": "image/jpeg"})],
        "media_ref string, kind string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int,mime:string>",
    )
    out = resize_images(media, 16, 16).collect()
    assert len(out) == 1 and out[0].meta["mime"] == "image/jpeg"
    dec = decode_jpeg(bytes(out[0].payload))
    assert dec.shape == (16, 16, 3)


def test_jpeg_mutation_fuzz_fails_cleanly():
    """Bit-flipped and truncated JPEG payloads must either decode to an
    array or raise ValueError/NotImplementedError — never IndexError /
    struct.error / infinite loop — since crawl payloads are untrusted."""
    from texrex_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(23)
    good = bytearray(encode_jpeg(_smooth_rgb(24, 24), quality=85,
                                 subsampling="420", restart_interval=2))
    for trial in range(300):
        bad = bytearray(good)
        mode = trial % 3
        if mode == 0:  # single byte flip
            bad[rng.integers(2, len(bad))] ^= 1 << rng.integers(0, 8)
        elif mode == 1:  # truncate
            bad = bad[: rng.integers(2, len(bad))]
        else:  # splice garbage
            at = rng.integers(2, len(bad))
            bad[at : at + 4] = bytes(rng.integers(0, 256, 4, dtype=np.uint8))
        try:
            out = decode_jpeg(bytes(bad))
            assert isinstance(out, np.ndarray)
        except (ValueError, NotImplementedError):
            pass


def test_gray_alpha_png_through_dispatcher():
    """PNG color type 4 (gray+alpha) must reach the feature kernels as
    the gray channel — the luma path used to index channel 2 of a
    2-channel array (round-4 review finding)."""
    ga = np.zeros((6, 9, 2), np.uint8)
    ga[..., 0] = np.arange(9, dtype=np.uint8) * 7
    ga[..., 1] = 200
    out = mm.decode(mm.encode_png(ga), {"mime": "image/png"})
    assert out.shape == (6, 9)
    assert np.array_equal(out, ga[..., 0])


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker;
    they must not derail the segment walk (before SOS) or the entropy
    splitter (at scan end)."""
    from texrex_spark.operators.jpeg import decode_jpeg, encode_jpeg

    good = encode_jpeg(_smooth_rgb(16, 16), quality=90)
    at_sos = good.find(b"\xff\xda")
    padded = good[:at_sos] + b"\xff\xff" + good[at_sos:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(good))


def test_jpeg_multiscan_baseline_is_explicit():
    """A baseline SOS covering fewer components than the frame declares
    is spec-legal non-interleaved multi-scan — unsupported, and it must
    say so rather than silently decode the first scan as the image."""
    from texrex_spark.operators.jpeg import decode_jpeg, encode_jpeg

    good = bytearray(encode_jpeg(_smooth_rgb(16, 16), quality=90))
    at_sos = good.find(b"\xff\xda")
    # rewrite the SOS header: Ns=3 -> Ns=1 (keep only the Y component);
    # new header is 2 (len) + 1 (ns) + 2 (comp spec) + 3 (ss/se/ah) = 8
    old_len = (good[at_sos + 2] << 8) | good[at_sos + 3]
    comp0 = bytes(good[at_sos + 5 : at_sos + 7])
    tail = bytes(good[at_sos + 2 + old_len - 3 : at_sos + 2 + old_len])
    new_seg = b"\x00\x08\x01" + comp0 + tail
    good[at_sos + 2 : at_sos + 2 + old_len] = new_seg
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(good))


def test_jpeg_encoder_accumulator_bounded():
    """The bit-writer must shed emitted bits: an unbounded accumulator
    turns encoding quadratic in image size (round-4 review finding)."""
    from texrex_spark.operators.jpeg import _BitWriter

    w = _BitWriter()
    for i in range(50_000):
        w.write(i & 0x3FF, 10)
    assert w.acc.bit_length() <= 8


def test_video_feature_row_rejects_empty_track():
    """A parseable moov with zero samples must raise, not emit a nan
    mean_intensity row."""
    from texrex_spark.operators.mp4 import encode_mjpeg_mp4

    frames = [np.full((8, 8, 3), 50, np.uint8)]
    payload = bytearray(encode_mjpeg_mp4(frames, fps=5))
    # zero out the stsz sample count (entry count field after the header)
    at = payload.find(b"stsz")
    assert at > 0
    payload[at + 12 : at + 16] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="no samples"):
        mm.video_feature_row("r", bytes(payload))
