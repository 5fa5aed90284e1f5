"""Round-8 codec seam: the decode path is real for image + audio.

Unit contract for the pure-numpy netpbm decoder and the stdlib WAV
decoder behind ``decode_payload`` — header grammar, both netpbm
variants, error paths, and the video closure. The Spark-side
encode -> bytes -> decode -> stats pipelines are certified separately
by the oracle gate (multimodal_image_decode_stats /
multimodal_audio_decode_stats recompute the stats relationally from
the pixel/sample generating formulas).
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from weather_stream_processor_spark.operators.multimodal import (
    _decode_netpbm,
    _decode_wav,
    decode_payload,
)


def _p5(w: int, h: int, raster: bytes, header: str | None = None) -> bytes:
    head = header if header is not None else f"P5\n{w} {h}\n255\n"
    return head.encode("ascii") + raster


def test_netpbm_p5_roundtrip():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    arr, maxval = _decode_netpbm(_p5(4, 3, px.tobytes()))
    assert arr.shape == (3, 4)
    assert maxval == 255
    assert (arr == px).all()


def test_netpbm_p6_roundtrip():
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    payload = b"P6\n4 2\n255\n" + px.tobytes()
    arr, maxval = _decode_netpbm(payload)
    assert arr.shape == (2, 4, 3)
    assert maxval == 255
    assert (arr == px).all()


def test_netpbm_header_comments_and_whitespace():
    # comments between any tokens; tokens split by arbitrary whitespace
    px = bytes(range(6))
    head = "P5 # magic comment\n# full line\n  3\t# width\n 2 # height\n255\n"
    arr, _ = _decode_netpbm(head.encode("ascii") + px)
    assert arr.shape == (2, 3)
    assert arr.tobytes() == px


def test_netpbm_reports_header_maxval_not_255():
    # the stats stage must report what the header SAYS (review finding:
    # a hardcoded 255 matched the oracle only because the synthetic
    # encoder always writes 255)
    px = bytes(range(6))
    arr, maxval = _decode_netpbm(b"P5\n3 2\n100\n" + px)
    assert maxval == 100
    assert arr.shape == (2, 3)


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"P4\n1 1\n255\n\x00", "magic"),
        (b"P5\n2 2\n65535\n" + b"\x00" * 8, "maxval"),
        (b"P5\n2 2\n255\n\x00", "raster"),
        (b"P5\n2", "truncated"),
        (b"P5\n0 2\n255\n", "dimensions"),
    ],
)
def test_netpbm_error_paths(payload, msg):
    with pytest.raises(ValueError, match=msg):
        _decode_netpbm(payload)


def _wav_bytes(samples: np.ndarray, rate: int = 16000, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_roundtrip_mono():
    samples = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    rate, out = _decode_wav(_wav_bytes(samples, rate=8000))
    assert rate == 8000
    assert out.shape == (5, 1)
    assert (out[:, 0] == samples).all()


def test_wav_roundtrip_stereo():
    samples = np.arange(8, dtype=np.int16)  # 4 frames x 2 channels
    rate, out = _decode_wav(_wav_bytes(samples, nch=2))
    assert out.shape == (4, 2)
    assert (out.ravel() == samples).all()


def test_wav_rejects_non_16bit():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)  # 8-bit
        wf.setframerate(16000)
        wf.writeframes(b"\x00\x01")
    with pytest.raises(ValueError, match="8-bit"):
        _decode_wav(buf.getvalue())


def test_decode_payload_dispatch_and_video_closure():
    px = bytes(4)
    arr, maxval = decode_payload(b"P5\n2 2\n255\n" + px, "image")
    assert arr.shape == (2, 2) and maxval == 255
    rate, _ = decode_payload(_wav_bytes(np.zeros(3, dtype=np.int16)), "audio")
    assert rate == 16000
    with pytest.raises(NotImplementedError, match="video"):
        decode_payload(b"\x00", "video")
