"""Real pure-numpy media codec path (SURVEY §2f #41, r10): BMP/WAV
round-trips, exact feature values on constructed media, the resize
stage, real aHash collisions for visually-identical images, and the
honest NotImplementedError for containers that need PIL/ffmpeg."""

from __future__ import annotations

import math

import numpy as np
import pytest

from mvrs_dspa_spark.operators.media_codecs import (
    ahash64,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    real_features,
    resize_rgb,
)

SF = "/root/testdata/sf0.001"


def _checker(h, w):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[(np.add.outer(np.arange(h), np.arange(w)) % 2) == 1] = 255
    return px


def test_bmp_round_trip_including_padding():
    for h, w in ((2, 2), (3, 5), (7, 3)):  # odd widths exercise row pad
        px = _checker(h, w)
        px[0, 0] = (10, 200, 30)
        out = decode_bmp(encode_bmp(px))
        assert out.shape == (h, w, 3)
        assert (out == px).all(), (h, w)


def test_wav_round_trip():
    rate = 8000
    t = np.arange(rate) / rate
    s = (np.sin(2 * math.pi * 440 * t) * 20000).astype(np.int16)
    r2, s2 = decode_wav(encode_wav(s, rate))
    assert r2 == rate
    assert (s2 == s).all()


def test_image_features_exact_on_constant_color():
    px = np.full((4, 4, 3), 128, dtype=np.uint8)
    f = real_features(encode_bmp(px))
    assert len(f) == 16
    assert f[0] == 4.0 and f[1] == 4.0  # w, h
    for c in range(3):
        assert abs(f[2 + c] - 128 / 255) < 1e-6  # channel means
        assert f[5 + c] == 0.0  # constant -> zero std
    assert f[10] == 0.0  # zero edge energy


def test_audio_features_sine_rms_and_zcr():
    rate = 8000
    t = np.arange(rate) / rate
    s = (np.sin(2 * math.pi * 100 * t) * 16384).astype(np.int16)
    f = real_features(encode_wav(s, rate))
    assert abs(f[0] - 1.0) < 1e-6  # 1 second
    assert abs(f[2] - 0.5 / math.sqrt(2)) < 0.01  # rms of A=0.5 sine
    # 100 Hz sine crosses zero 200 times/sec
    assert abs(f[3] - 200 / rate) < 0.005
    # spectral mass concentrated in the lowest band
    assert f[5] > 0.5 and f[5] > max(f[6:13])


def test_real_features_honest_for_compressed_containers():
    with pytest.raises(NotImplementedError):
        real_features(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_resize_nearest_exact():
    px = _checker(4, 4)
    small = resize_rgb(px, 2, 2)
    # nearest-neighbor at 2x downscale picks rows/cols 0 and 2
    assert (small == px[::2, ::2]).all()


def test_ahash_identical_for_visually_identical_images():
    grad = np.repeat(
        np.repeat(np.linspace(0, 255, 16, dtype=np.uint8), 3).reshape(1, 16, 3),
        16,
        axis=0,
    )
    base = np.ascontiguousarray(grad)
    a = ahash64(encode_bmp(base))
    b = ahash64(encode_bmp(resize_rgb(base, 32, 32)))  # upscaled twin
    assert a == b  # aHash is resolution-invariant
    assert a != 0
    assert a != ahash64(encode_bmp(np.ascontiguousarray(base[:, ::-1])))


def _real_media(spark):
    import pandas as pd

    rows = []
    for i in range(4):
        px = _checker(8, 8)
        px[0, 0] = (i * 20, 0, 0)
        rows.append((i, "image", bytearray(encode_bmp(px))))
    rate = 4000
    t = np.arange(rate // 2) / rate
    for i in range(4, 6):
        s = (np.sin(2 * math.pi * (100 + 50 * i) * t) * 16000).astype(
            np.int16
        )
        rows.append((i, "audio", bytearray(encode_wav(s, rate))))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload"])
    return spark.createDataFrame(
        pdf, "media_id long, kind string, payload binary"
    )


def test_extract_features_real_path_end_to_end(spark):
    from mvrs_dspa_spark.operators.multimodal import extract_features

    out = {
        r.media_id: r
        for r in extract_features(_real_media(spark), decode="real").collect()
    }
    assert len(out) == 6
    assert out[0].feature[0] == 8.0  # decoded width
    assert abs(out[4].feature[0] - 0.5) < 1e-6  # 0.5 s of audio
    # deterministic: identical payloads -> identical features
    again = {
        r.media_id: r
        for r in extract_features(_real_media(spark), decode="real").collect()
    }
    assert all(
        list(out[k].feature) == list(again[k].feature) for k in out
    )


def test_resize_images_real_stage(spark):
    from mvrs_dspa_spark.operators.multimodal import resize_images

    out = resize_images(_real_media(spark), 4, 4, decode="real").collect()
    assert len(out) == 4  # images only
    for r in out:
        px = decode_bmp(bytes(r.payload))
        assert px.shape == (4, 4, 3)
        assert r.width == 4 and r.height == 4


def test_media_phash_real_path_collides_on_visual_twins(spark):
    import pandas as pd

    from mvrs_dspa_spark.operators.multimodal import media_phash

    # horizontal gradient vs its left-right mirror (checkerboards
    # alias to uniform under the 8x8 downsample — degenerate input)
    grad = np.repeat(
        np.repeat(np.linspace(0, 255, 16, dtype=np.uint8), 3).reshape(1, 16, 3),
        16,
        axis=0,
    )
    base = np.ascontiguousarray(grad)
    twin = resize_rgb(base, 32, 32)
    other = np.ascontiguousarray(base[:, ::-1])
    pdf = pd.DataFrame(
        [
            (0, "image", bytearray(encode_bmp(base))),
            (1, "image", bytearray(encode_bmp(twin))),
            (2, "image", bytearray(encode_bmp(other))),
        ],
        columns=["media_id", "kind", "payload"],
    )
    media = spark.createDataFrame(
        pdf, "media_id long, kind string, payload binary"
    )
    ph = {r.media_id: r.phash for r in media_phash(media, decode="real").collect()}
    assert ph[0] == ph[1]  # visually identical at 8x8 -> same hash
    assert ph[0] != ph[2]


def test_media_phash_real_path_skips_non_images(spark):
    """ADVICE r10 #2: the mixed image/audio media table must not die
    on a WAV payload — the real path restricts to kind == 'image'
    (resize_images semantics), and every emitted hash fits the
    PHASH_BITS band mask (ADVICE r10 #3: mask derived from the
    constant, not hardcoded)."""
    from mvrs_dspa_spark.operators.multimodal import PHASH_BITS, media_phash

    out = media_phash(_real_media(spark), decode="real").collect()
    assert {r.kind for r in out} == {"image"}
    assert len(out) == 4
    for r in out:
        assert 0 <= r.phash <= (1 << PHASH_BITS) - 1
