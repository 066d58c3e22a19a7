"""Pure-numpy media codecs for the multimodal stages (SURVEY §2f #41).

The container has no PIL/torchaudio/ffmpeg, but two standard media
containers need NOTHING beyond the stdlib and numpy: uncompressed
24-bit BMP (BITMAPINFOHEADER, bottom-up BGR rows, 4-byte row padding)
and PCM-16 mono WAV (RIFF/fmt/data). This module implements real
encode/decode/feature/resize for those, so `decode="real"` in
`operators/multimodal.py` is a genuine codec path for uncompressed
media; compressed formats (JPEG/PNG/MP3/MP4) remain honestly
env-gated behind NotImplementedError where PIL/ffmpeg would plug in.

Everything lives in a `_make_media_codecs()` factory so the function
qualnames contain ``<locals>`` and cloudpickle ships them BY VALUE
inside mapInPandas closures (the house `_make_td_helpers` discipline:
executors never need this package importable).

Feature vectors are FEATURE_DIM=16 floats:
- image: [w, h, meanR, meanG, meanB, stdR, stdG, stdB, meanLuma,
  stdLuma, edgeEnergy, quadLuma00, quadLuma01, quadLuma10,
  quadLuma11, 0] (channel stats in [0,1]; edge energy = mean abs
  horizontal luma diff; quadrant means of the luma plane)
- audio: [durationSec, rate/48000, rms, zcr, peak, band0..band7
  (normalized 8-band magnitude spectrum), 0, 0, 0] with rms/peak on
  [-1,1]-scaled samples and zcr = sign-change fraction
"""

from __future__ import annotations

FEATURE_DIM = 16


def _make_media_codecs():
    import struct

    import numpy as np

    def encode_bmp(pixels) -> bytes:
        """HxWx3 uint8 RGB -> uncompressed 24-bit BMP bytes."""
        px = np.asarray(pixels, dtype=np.uint8)
        h, w, c = px.shape
        assert c == 3, "RGB only"
        row_size = (w * 3 + 3) & ~3
        img_size = row_size * h
        off = 14 + 40
        header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
        )
        rows = []
        pad = b"\x00" * (row_size - w * 3)
        for y in range(h - 1, -1, -1):  # bottom-up
            rows.append(px[y, :, ::-1].tobytes() + pad)  # BGR
        return header + info + b"".join(rows)

    def decode_bmp(data: bytes):
        """Uncompressed 24-bit BMP bytes -> HxWx3 uint8 RGB."""
        if data[:2] != b"BM":
            raise ValueError("not a BMP payload")
        off = struct.unpack_from("<I", data, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
        planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                "only uncompressed 24-bit BMP is decodable without PIL"
            )
        flip = h > 0
        h = abs(h)
        row_size = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            data, dtype=np.uint8, count=row_size * h, offset=off
        ).reshape(h, row_size)
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return (px[::-1] if flip else px).copy()

    def encode_wav(samples, rate: int) -> bytes:
        """int16 mono samples -> PCM-16 WAV bytes."""
        s = np.asarray(samples, dtype="<i2")
        data = s.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        return (
            struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
            + struct.pack("<4sI", b"fmt ", len(fmt))
            + fmt
            + struct.pack("<4sI", b"data", len(data))
            + data
        )

    def decode_wav(data: bytes):
        """PCM-16 mono WAV bytes -> (rate, int16 array)."""
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("not a WAV payload")
        pos, rate, samples = 12, None, None
        while pos + 8 <= len(data):
            cid, size = struct.unpack_from("<4sI", data, pos)
            body = data[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
                bits = struct.unpack_from("<H", body, 14)[0]
                if audio_fmt != 1 or channels != 1 or bits != 16:
                    raise NotImplementedError(
                        "only PCM-16 mono WAV is decodable without ffmpeg"
                    )
            elif cid == b"data":
                samples = np.frombuffer(body, dtype="<i2")
            pos += 8 + size + (size & 1)
        if rate is None or samples is None:
            raise ValueError("WAV missing fmt/data chunk")
        return rate, samples

    def _luma(px):
        x = px.astype(np.float64) / 255.0
        return 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]

    def image_features(data: bytes):
        px = decode_bmp(data)
        h, w, _ = px.shape
        x = px.astype(np.float64) / 255.0
        lum = _luma(px)
        edge = (
            float(np.mean(np.abs(np.diff(lum, axis=1)))) if w > 1 else 0.0
        )
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        quads = [
            float(np.mean(lum[:h2, :w2])),
            float(np.mean(lum[:h2, w2:])) if w > 1 else 0.0,
            float(np.mean(lum[h2:, :w2])) if h > 1 else 0.0,
            float(np.mean(lum[h2:, w2:])) if h > 1 and w > 1 else 0.0,
        ]
        out = [
            float(w),
            float(h),
            *[float(np.mean(x[:, :, c])) for c in range(3)],
            *[float(np.std(x[:, :, c])) for c in range(3)],
            float(np.mean(lum)),
            float(np.std(lum)),
            edge,
            *quads,
            0.0,
        ]
        return np.asarray(out, dtype=np.float32)

    def audio_features(data: bytes):
        rate, s = decode_wav(data)
        x = s.astype(np.float64) / 32768.0
        n = len(x)
        rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
        zcr = (
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            if n > 1
            else 0.0
        )
        peak = float(np.max(np.abs(x))) if n else 0.0
        bands = [0.0] * 8
        if n > 1:
            mag = np.abs(np.fft.rfft(x))
            chunks = np.array_split(mag, 8)
            tot = float(sum(float(c.sum()) for c in chunks)) or 1.0
            bands = [float(c.sum()) / tot for c in chunks]
        out = [n / float(rate), rate / 48000.0, rms, zcr, peak, *bands, 0.0, 0.0, 0.0]
        return np.asarray(out, dtype=np.float32)

    def real_features(data: bytes):
        """Dispatch on the container magic; formats needing external
        codecs stay honestly NotImplemented."""
        data = bytes(data)
        if data[:2] == b"BM":
            return image_features(data)
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return audio_features(data)
        raise NotImplementedError(
            "real decode for this container needs PIL/ffmpeg "
            "(pure-numpy path covers uncompressed BMP and PCM-16 WAV)"
        )

    def resize_rgb(px, out_w: int, out_h: int):
        """Nearest-neighbor resize of an HxWx3 uint8 array."""
        px = np.asarray(px, dtype=np.uint8)
        h, w, _ = px.shape
        ys = (np.arange(out_h) * h) // out_h
        xs = (np.arange(out_w) * w) // out_w
        return px[ys][:, xs]

    def ahash64(data: bytes) -> int:
        """Classic 8x8 average hash of a decodable image payload."""
        lum = _luma(resize_rgb(decode_bmp(bytes(data)), 8, 8))
        bits = (lum > float(np.median(lum))).astype(np.uint64).ravel()
        return int((bits << np.arange(64, dtype=np.uint64)).sum())

    return (
        encode_bmp,
        decode_bmp,
        encode_wav,
        decode_wav,
        real_features,
        resize_rgb,
        ahash64,
    )


(
    encode_bmp,
    decode_bmp,
    encode_wav,
    decode_wav,
    real_features,
    resize_rgb,
    ahash64,
) = _make_media_codecs()
