"""Psychoacoustic model 1 (tonal.c reimplementation).

The reference distribution cannot run model 1 at all (missing Annex D
table files -- SURVEY.md section 0), so there is no golden stream;
these tests check algorithmic sanity and end-to-end stream validity.
"""
import numpy as np
import pytest

from mp3tpu.config import EncoderConfig
from mp3tpu.decoder import layer12 as dec12
from mp3tpu.numpy_ref import layer12, tonal
from mp3tpu.tables import mpeg


def _sine(rate=44100, secs=0.6, f0=440.0):
    t = np.arange(int(secs * rate)) / rate
    x = 0.6 * np.sin(2 * np.pi * f0 * t)
    return np.clip(np.stack([x, 0.8 * x], 1) * 32767,
                   -32768, 32767).astype(np.int16)


def test_tables_shape():
    for layer in (1, 2):
        line, bark, hear, cbound = tonal.model1_tables(layer, 44100.0)
        assert line[0] == 0 and np.all(np.diff(line) > 0)
        assert np.all(np.diff(bark[1:]) > 0)
        assert np.all(np.diff(cbound) > 0)
        # thresholds in quiet rise steeply toward 20 kHz
        assert hear[-1] > hear[len(hear) // 2]


def test_tonal_component_detected():
    """A pure tone must yield a strongly positive SMR in its subband
    and low SMR far away."""
    rate = 44100
    pcm = _sine(rate)
    cfg = EncoderConfig(layer=2, mode=mpeg.MODE_STEREO, bitrate_kbps=192,
                        sample_rate_hz=rate, psy_model=1).finalize()
    F = pcm.shape[0] // 1152
    from mp3tpu.numpy_ref.dsp import subband_filter_stream
    sb = np.stack([subband_filter_stream(
        pcm[:F * 1152, ch] / 32768.0, F * 36).reshape(F, 3, 12, 32)
        for ch in range(2)])
    smr = tonal.psycho_one_frames(pcm.T.astype(np.float64), 2, cfg, sb)
    # 440 Hz lives in subband 0
    assert smr[0, 2:, 0].mean() > 10.0
    assert smr[0, 2:, 20].mean() < smr[0, 2:, 0].mean()


@pytest.mark.parametrize("layer,kbps", [(1, 384), (2, 192)])
def test_model1_stream_valid(layer, kbps):
    rate = 44100
    pcm = _sine(rate)
    cfg = EncoderConfig(layer=layer, mode=mpeg.MODE_STEREO,
                        bitrate_kbps=kbps, sample_rate_hz=rate, psy_model=1)
    out = layer12.encode(pcm, cfg)
    deco, drate = dec12.decode(out)
    assert drate == rate
    d = 481 if layer == 2 else 545
    n = min(len(pcm) - d, len(deco) - d)
    o = pcm[:n, 0].astype(np.float64)
    r = deco[d:d + n, 0] * 32768.0
    snr = 10 * np.log10((o ** 2).sum() / ((o - r) ** 2).sum())
    assert snr > 40.0, snr
