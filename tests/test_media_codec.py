"""Tests for the pure-stdlib media codecs and the real multimodal
pixel operators they enable (decode / resize / frame-sample).

PNG decode is verified against an INDEPENDENTLY constructed stream
(filters applied by a separate hand-written filterer, not the encoder
under test), plus encode->decode round-trips and hostile-input fuzz."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from moloch_spark.operators import media_codec as MC
from moloch_spark.operators import multimodal as M


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def _hand_filtered_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG applying the given per-row filter types with an
    independent (loop-based) filterer."""
    h, w, ch = img.shape
    rows = img.reshape(h, w * ch).astype(np.int64)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        prev = rows[y - 1] if y else np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            cur = int(rows[y][x])
            left = int(rows[y][x - ch]) if x >= ch else 0
            up = int(prev[x])
            ul = int(prev[x - ch]) if x >= ch else 0
            v = {
                0: cur,
                1: cur - left,
                2: cur - up,
                3: cur - ((left + up) >> 1),
                4: cur - _paeth(left, up, ul),
            }[f]
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_all_filters_decode():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
    png = _hand_filtered_png(img, [0, 1, 2, 3, 4])
    assert (MC.png_decode(png) == img).all()


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_round_trip(channels):
    rng = np.random.default_rng(channels)
    arr = rng.integers(0, 256, size=(17, 11, channels), dtype=np.uint8)
    assert (MC.png_decode(MC.png_encode(arr)) == arr).all()


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        MC.png_decode(b"\x89PNG\r\n\x1a\not-a-real-chunk-stream")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
    )
    with pytest.raises(ValueError):
        MC.png_decode(bad)


def test_bmp_decode_bottom_up():
    rng = np.random.default_rng(3)
    w, h = 5, 4
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rb = (w * 3 + 3) & ~3
    px = bytearray()
    for y in range(h - 1, -1, -1):
        px += img[y][:, ::-1].tobytes() + b"\x00" * (rb - w * 3)
    data = (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0)
        + bytes(px)
    )
    assert (MC.bmp_decode(data) == img).all()


def test_resize_identity_and_solid():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
    assert (MC.resize_nearest(arr, 9, 9) == arr).all()
    solid = np.full((20, 30, 3), 123, np.uint8)
    for fn in (MC.resize_nearest, MC.resize_bilinear):
        out = fn(solid, 7, 13)
        assert out.shape == (13, 7, 3) and (out == 123).all()


def test_resize_bilinear_gradient_midpoint():
    # downsampling a 0..255 horizontal ramp by 2 averages adjacent pairs
    ramp = np.tile(np.arange(0, 256, 16, dtype=np.uint8), (4, 1))
    out = MC.resize_bilinear(ramp, 8, 4)
    expect = ((ramp[:, 0::2].astype(int) + ramp[:, 1::2]) / 2).round()
    assert (out == expect.astype(np.uint8)).all()


def test_y4m_round_trip_and_sampling():
    frames = [np.full((6, 8), i * 11, np.uint8) for i in range(9)]
    data = MC.y4m_encode(frames)
    got = list(MC.y4m_iter_frames(data))
    assert [i for i, _, _ in got] == list(range(9))
    for i, luma, _ in got:
        assert set(luma) == {i * 11}


def test_y4m_chroma_sizes():
    assert MC.y4m_frame_size(8, 6, "420") == 48 + 24
    assert MC.y4m_frame_size(8, 6, "422") == 48 + 48
    assert MC.y4m_frame_size(8, 6, "444") == 48 + 96
    assert MC.y4m_frame_size(8, 6, "mono") == 48


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_codec_fuzz_never_crashes_operators(data):
    """Operator-level guarantee: hostile bytes produce NULL rows / no
    frames, never exceptions (the codecs themselves may raise
    ValueError; the operators catch)."""
    assert M._decode_pixels(data) is None or M._decode_pixels(data)[1].ndim == 3


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_png_decode_fuzz_only_valueerror(data):
    try:
        MC.png_decode(b"\x89PNG\r\n\x1a\n" + data)
    except ValueError:
        pass
    except zlib.error:
        pass


# ---------------------------------------------------------------------------
# Spark-side operators
# ---------------------------------------------------------------------------


def test_resize_images_spark(spark):
    import pandas as pd

    rows = []
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(100, 200, 3), dtype=np.uint8)
    rows.append((1, "image", MC.png_encode(arr), None))
    rows.append((2, "image", b"not media", None))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "data", "meta"]),
        schema=M.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in M.resize_images(media, 64, 64).collect()}
    r1 = out[1]
    assert (r1.width, r1.height) == (200, 100)
    assert (r1.target_width, r1.target_height) == (64, 32)
    # output bytes are a decodable PNG at the target geometry
    dec = MC.png_decode(bytes(r1.data))
    assert dec.shape == (32, 64, 3)
    # independent check: nearest-neighbor result computed directly
    assert (dec == MC.resize_nearest(arr, 64, 32)).all()
    assert out[2].format is None and out[2].data is None


def test_frame_sample_spark(spark):
    import pandas as pd

    frames = [np.full((6, 8), i * 20, np.uint8) for i in range(7)]
    media = spark.createDataFrame(
        pd.DataFrame(
            [(9, "video", MC.y4m_encode(frames), None),
             (10, "video", b"junk", None)],
            columns=["media_id", "kind", "data", "meta"],
        ),
        schema=M.MEDIA_SCHEMA,
    )
    got = M.frame_sample(media, 3).orderBy("frame_index").collect()
    assert [(r.media_id, r.frame_index) for r in got] == [(9, 0), (9, 3), (9, 6)]
    assert [r.luma_mean for r in got] == [0.0, 60.0, 120.0]
    assert (MC.png_decode(bytes(got[1].frame_png)) == 60).all()


# ---------------------------------------------------------------------------
# WAV audio
# ---------------------------------------------------------------------------


def test_wav_round_trip_mono_and_stereo():
    rng = np.random.default_rng(21)
    for shape in [(200,), (150, 2)]:
        s = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
        rate, dec = MC.wav_decode(MC.wav_encode(s, 44100))
        assert rate == 44100
        want = s[:, None] if s.ndim == 1 else s
        assert (dec == want).all()


def test_wav_hand_built_header():
    # independently built RIFF stream (not via wav_encode)
    import struct as st
    pcm = st.pack("<4h", 100, -100, 200, -200)
    fmt = st.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + st.pack("<I", 16) + fmt + b"data" + st.pack("<I", len(pcm)) + pcm
    data = b"RIFF" + st.pack("<I", len(body)) + body
    rate, samples = MC.wav_decode(data)
    assert rate == 8000 and samples.shape == (2, 2)
    assert samples.tolist() == [[100, -100], [200, -200]]


def test_wav_rejects():
    with pytest.raises(ValueError):
        MC.wav_decode(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(ValueError):
        MC.wav_decode(b"nonsense")
    # non-PCM format code
    import struct as st
    fmt = st.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)  # IEEE float
    body = b"WAVE" + b"fmt " + st.pack("<I", 16) + fmt + b"data" + st.pack("<I", 0)
    with pytest.raises(ValueError):
        MC.wav_decode(b"RIFF" + st.pack("<I", len(body)) + body)


def test_audio_decimate():
    s = np.arange(10, dtype=np.int16)[:, None]
    assert MC.audio_decimate(s, 3)[:, 0].tolist() == [0, 3, 6, 9]


def test_audio_features_spark(spark):
    import pandas as pd

    clip = np.full(400, -250, dtype=np.int16)
    media = spark.createDataFrame(
        pd.DataFrame(
            [(1, "audio", MC.wav_encode(clip, 16000), None),
             (2, "audio", b"not a wav", None)],
            columns=["media_id", "kind", "data", "meta"],
        ),
        schema=M.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in M.extract_audio_features(media).collect()}
    r1 = out[1]
    assert (r1.sample_rate, r1.channels, r1.n_samples) == (16000, 1, 400)
    assert r1.rms == 250.0 and r1.peak == 250
    assert r1.duration_s == 400 / 16000
    assert out[2].sample_rate is None


class TestGif:
    def test_round_trip_plain_and_interlaced(self):
        import numpy as np
        from moloch_spark.operators.media_codec import gif_decode, gif_encode

        rng = np.random.default_rng(7)
        img = (rng.integers(0, 5, (23, 17, 1), dtype=np.uint8) * 50).repeat(
            3, axis=2
        )
        for interlace in (False, True):
            assert (gif_decode(gif_encode(img, interlace=interlace)) == img).all()

    def test_lzw_growth_and_reset(self):
        import numpy as np
        from moloch_spark.operators.media_codec import _lzw_decode, _lzw_encode

        rng = np.random.default_rng(3)
        for mcs in (2, 5, 8):
            data = rng.integers(0, 1 << mcs, 4096, dtype=np.uint8).tobytes()
            assert _lzw_decode(mcs, _lzw_encode(mcs, data)) == data

    def test_lzw_deferred_clear(self):
        """Encoders may fill the table to 4096 and keep emitting 12-bit
        codes WITHOUT a CLEAR (deferred-clear GIFs); the decoder must
        pin its table at 4096 in lockstep instead of desynchronizing."""
        import numpy as np
        from moloch_spark.operators.media_codec import _lzw_decode

        mcs = 8
        clear, end = 1 << mcs, (1 << mcs) + 1
        rng = np.random.default_rng(7)
        data = rng.integers(0, 1 << mcs, 30000, dtype=np.uint8).tobytes()
        # encode WITHOUT ever resetting: code growth stops at 4095
        table = {bytes([i]): i for i in range(clear)}
        next_code, code_size = end + 1, mcs + 1
        out_bits = [(clear, code_size)]
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            out_bits.append((table[w], code_size))
            if next_code < (1 << 12):  # deferred clear: stop growing
                table[wc] = next_code
                next_code += 1
                if next_code - 1 == (1 << code_size) and code_size < 12:
                    code_size += 1
            w = bytes([ch])
        if w:
            out_bits.append((table[w], code_size))
        out_bits.append((end, code_size))
        acc = nbits = 0
        buf = bytearray()
        for code, cs in out_bits:
            acc |= code << nbits
            nbits += cs
            while nbits >= 8:
                buf.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            buf.append(acc & 0xFF)
        assert _lzw_decode(mcs, bytes(buf)) == data

    def test_hostile_inputs_raise_valueerror(self):
        import numpy as np
        import pytest
        from moloch_spark.operators.media_codec import gif_decode, gif_encode

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        good = gif_encode(img)
        for bad in (b"", b"GIF89a", b"GIF89a" + b"\x00" * 20, good[:20],
                    good[:-3] + b"\xff\xff\xff"):
            with pytest.raises(ValueError):
                gif_decode(bad)

    def test_multimodal_seam_decodes_gif(self):
        import numpy as np
        from moloch_spark.operators.media_codec import gif_encode
        from moloch_spark.operators.multimodal import _decode_pixels

        img = np.full((6, 8, 3), 77, dtype=np.uint8)
        fmt, arr = _decode_pixels(gif_encode(img))
        assert fmt == "gif" and arr.shape == (6, 8, 3) and (arr == 77).all()


class TestJpeg:
    def test_flat_and_gradient_round_trip(self):
        import numpy as np
        from moloch_spark.operators.media_codec import jpeg_decode, jpeg_encode

        flat = np.full((24, 16, 3), [200, 60, 120], dtype=np.uint8)
        x = np.linspace(0, 255, 40)
        grad = np.repeat(x[None, :, None], 36, axis=0).repeat(3, axis=2).astype(
            np.uint8
        )
        for img, tol in ((flat, 1), (grad, 2)):
            for subsample in (False, True):
                dec = jpeg_decode(jpeg_encode(img, subsample=subsample))
                assert dec.shape == img.shape
                assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol

    def test_odd_dimensions(self):
        import numpy as np
        from moloch_spark.operators.media_codec import jpeg_decode, jpeg_encode

        odd = np.full((9, 13, 3), [10, 250, 40], dtype=np.uint8)
        for subsample in (False, True):
            dec = jpeg_decode(jpeg_encode(odd, subsample=subsample))
            assert dec.shape == odd.shape
            assert np.abs(dec.astype(int) - odd.astype(int)).max() <= 1

    def test_noise_bounded_loss(self):
        import numpy as np
        from moloch_spark.operators.media_codec import jpeg_decode, jpeg_encode

        rng = np.random.default_rng(1)
        noise = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(noise))
        assert np.abs(dec.astype(int) - noise.astype(int)).mean() < 40

    def test_hostile_inputs_raise(self):
        import numpy as np
        import pytest
        from moloch_spark.operators.media_codec import jpeg_decode, jpeg_encode

        good = jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8))
        for bad in (b"", b"\xff\xd8", b"\xff\xd8\xff\xc2\x00\x04\x00\x00",
                    good[:40]):
            with pytest.raises(ValueError):
                jpeg_decode(bad)

    def test_multimodal_seam_decodes_jpeg(self):
        import numpy as np
        from moloch_spark.operators.media_codec import jpeg_encode
        from moloch_spark.operators.multimodal import _decode_pixels

        img = np.full((6, 8, 3), 77, dtype=np.uint8)
        fmt, arr = _decode_pixels(jpeg_encode(img))
        assert fmt == "jpeg" and arr.shape == (6, 8, 3)
        assert np.abs(arr.astype(int) - 77).max() <= 1

    def test_restart_markers(self):
        import numpy as np
        from moloch_spark.operators.media_codec import jpeg_decode, jpeg_encode

        x = np.linspace(0, 255, 40)
        grad = np.repeat(x[None, :, None], 36, axis=0).repeat(3, axis=2).astype(
            np.uint8
        )
        for interval in (1, 2, 5):
            for subsample in (False, True):
                dec = jpeg_decode(
                    jpeg_encode(grad, subsample=subsample, restart_interval=interval)
                )
                assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 2
