"""Golden tests: the NumPy oracle must reproduce the reference encoder
byte-for-byte on every committed fixture.

This works because the oracle replicates the reference's exact
arithmetic, including its float32 split-radix FFT, mixed-precision psy
buffers, stale-state quirks (subdivide addresses, per-type ratio
emission, numlines clobbering) and search-path-dependent rate loop.
"""
import os

import pytest

from mp3tpu.config import EncoderConfig
from mp3tpu.numpy_ref import encode_layer3
from mp3tpu.runtime.wav import read_wav
from mp3tpu.tables import mpeg

CASES = [
    ("sine_mono_64", mpeg.MODE_MONO, 64, 44100),
    ("noise_mono_64", mpeg.MODE_MONO, 64, 44100),
    ("sine_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("sweep_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("noise_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("trans_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("silence_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("sweep_st_320_48k", mpeg.MODE_STEREO, 320, 48000),
    ("sine_st_128_32k", mpeg.MODE_STEREO, 128, 32000),
    ("trans_st_256", mpeg.MODE_STEREO, 256, 44100),
]

FAST = {"sine_mono_64", "trans_st_128"}


@pytest.mark.parametrize("name,mode,kbps,rate", CASES,
                         ids=[c[0] for c in CASES])
def test_oracle_byte_exact(golden_dir, name, mode, kbps, rate, request):
    if name not in FAST:
        request.applymarker(pytest.mark.slow)
    pcm, r = read_wav(os.path.join(golden_dir, f"{name}.wav"))
    assert r == rate
    cfg = EncoderConfig(layer=3, mode=mode, bitrate_kbps=kbps,
                        sample_rate_hz=rate)
    data = pcm[:, 0] if mode == mpeg.MODE_MONO else pcm
    out = encode_layer3(data, cfg)
    with open(os.path.join(golden_dir, f"{name}.ref.mp3"), "rb") as f:
        ref = f.read()
    assert out == ref
