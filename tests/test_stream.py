"""Streaming encode: bit-identity with the one-shot path + bounded
memory.

The reservoir scan/guard and the assembler weave are causal, so
windowed processing with carried state reproduces the one-shot result
exactly when both use the same window decomposition (the one-shot
super-chunk plan IS the stream's window sequence).
"""
import resource

import numpy as np
import pytest

from mp3tpu.config import EncoderConfig
from mp3tpu.encoder import encode_layer3_fast, encode_layer3_stream
from mp3tpu.tables import mpeg


def _signal(seconds, rate=44100, stereo=False, seed=3):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * rate)) / rate
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.randn(len(t))
    pos = int(0.4 * len(t))
    x[pos:pos + 300] += 0.4 * np.hanning(300)[:len(x) - pos]
    pcm = np.stack([x, 0.8 * x]) if stereo else x[None, :]
    return np.clip(pcm * 22000, -32768, 32767).astype(np.int16)


def _stream_encode(pcm, cfg, window, piece=10_000):
    def it():
        for s in range(0, pcm.shape[1], piece):
            yield pcm[:, s:s + piece]
    return b"".join(encode_layer3_stream(it(), cfg, window=window))


@pytest.mark.parametrize("stereo", [False, True], ids=["mono", "stereo"])
def test_stream_matches_oneshot(stereo):
    # window == the one-shot super-chunk size -> identical device
    # programs, identical scans, identical bytes
    pcm = _signal(4.5, stereo=stereo)
    mode = mpeg.MODE_STEREO if stereo else mpeg.MODE_MONO
    cfg1 = EncoderConfig(layer=3, mode=mode, bitrate_kbps=96,
                         sample_rate_hz=44100)
    one = encode_layer3_fast(pcm, cfg1, chunk=128)
    cfg2 = EncoderConfig(layer=3, mode=mode, bitrate_kbps=96,
                         sample_rate_hz=44100)
    streamed = _stream_encode(pcm, cfg2, window=128)
    assert streamed == one


def test_stream_bounded_memory():
    """RSS stays flat across windows on a multi-window stream."""
    pcm = _signal(6.0)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=64,
                        sample_rate_hz=44100)

    def it():
        for s in range(0, pcm.shape[1], 20_000):
            yield pcm[:, s:s + 20_000]

    sizes = []
    rss = []
    for chunk in encode_layer3_stream(it(), cfg, window=64):
        sizes.append(len(chunk))
        rss.append(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)
    assert len(sizes) > 3          # multiple windows actually streamed
    # frames flow out incrementally, not all at the end
    assert sum(sizes[:-1]) > 0.5 * sum(sizes)
    # high-water RSS growth across windows stays small (compile/cache
    # noise aside, the carried state is O(window))
    assert rss[-1] - rss[len(rss) // 2] < 200_000, rss  # < ~200 MB in KB


def test_stream_lsf():
    """Streaming also covers the MPEG-2 LSF path (mode_gr=1)."""
    pcm = _signal(2.0, rate=22050)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=32,
                        sample_rate_hz=22050)
    cfg2 = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=32,
                         sample_rate_hz=22050)
    one = encode_layer3_fast(pcm, cfg2, chunk=64)
    streamed = _stream_encode(pcm, cfg, window=64)
    assert streamed == one


@pytest.mark.parametrize("layer,kbps", [(2, 192), (1, 384)])
def test_stream_layer12_matches_oneshot(layer, kbps):
    """Windowed Layer I/II streaming is byte-identical to the one-shot
    encode: frames are bitstream-independent and every cross-frame
    lookback (512-tap filterbank, psy window starts, two-window
    unpredictability history) fits the 4-frame halo."""
    from mp3tpu.encoder import encode_layer12_fast, encode_layer12_stream
    rng = np.random.RandomState(3)
    rate = 44100
    t = np.arange(int(2.2 * rate)) / rate
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.randn(len(t))
    pcm = np.clip(x * 20000, -32768, 32767).astype(np.int16)
    pcm = np.stack([pcm, (pcm * 0.6).astype(np.int16)], 1)
    cfg = EncoderConfig(layer=layer, mode=mpeg.MODE_STEREO,
                        bitrate_kbps=kbps, sample_rate_hz=rate)
    one = encode_layer12_fast(pcm, cfg)
    cfg2 = EncoderConfig(layer=layer, mode=mpeg.MODE_STEREO,
                         bitrate_kbps=kbps, sample_rate_hz=rate)

    def it():
        for s in range(0, len(pcm), 7001):
            yield pcm[s:s + 7001]

    streamed = b"".join(encode_layer12_stream(it(), cfg2,
                                              window_frames=16))
    assert streamed == one
