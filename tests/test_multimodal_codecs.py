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
    for k in range(40):
        row = mm.synth_real_media_row(f"m/{k}")
        kinds.setdefault(row["meta"]["mime"], 0)
        kinds[row["meta"]["mime"]] += 1
        # every payload must decode through the public tier
        if row["kind"] == "audio":
            s, rate = mm.decode_wav(bytes(row["payload"]))
            # meta duration must be consistent with the decoded samples
            assert row["meta"]["duration_ms"] == int(s.shape[0] * 1000 / rate)
        else:
            img = mm.decode(bytes(row["payload"]), row["meta"])
            assert img.shape == (row["meta"]["height"], row["meta"]["width"])
    assert set(kinds) == {
        "image/x-portable-graymap",
        "image/x-portable-pixmap",
        "image/bmp",
        "audio/wav",
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
