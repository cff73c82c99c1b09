"""MPEG-2 LSF (16/22.05/24 kHz) Layer III end-to-end.

The reference cannot encode LSF at all: its psy model exits on these
rates (l3psy.c:174) and psy model 1 is broken, so every LSF config
dies despite the dormant framing/rate-loop support (loop.c:871,
musicin.c:545).  These tests validate our complete LSF path -- derived
psy tables (tables/psy.py::_lsf_params), mode_gr=1 framing, 8-bit
back-pointer reservoir (2040-bit limit), LSF scalefac_compress
selection (ops/jaxloop.scale_bitcount_lsf), device scalefactor
emission (ops/jaxbits.scalefac_elements_lsf), native LSF side-info
layout, and the LSF decoder.
"""
import numpy as np
import pytest

from mp3tpu.config import EncoderConfig
from mp3tpu.decoder import decode_mp3
from mp3tpu.decoder.layer3 import snr_db
from mp3tpu.tables import mpeg

RATES = [(22050, 64), (24000, 64), (16000, 48)]


def _signal(rate, seconds=0.5, seed=5):
    t = np.arange(int(seconds * rate)) / rate
    rng = np.random.RandomState(seed)
    x = 0.25 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.randn(len(t))
    return np.clip(x * 20000, -32768, 32767).astype(np.int16)


def _check_cbr(out, rate, kbps):
    """Every interior frame sits on the CBR grid (the stream tail is
    truncated mid-frame at flush, faithfully to the reference's
    III_FlushBitstream, so only interior offsets are checked)."""
    fsize = 72000 * kbps // rate
    assert out[0] == 0xFF and (out[1] & 0xF0) == 0xF0
    assert ((out[1] >> 3) & 1) == 0, "version bit must be 0 (MPEG-2)"
    nfull = (len(out) - 1) // fsize
    assert nfull >= 5
    for k in range(nfull - 1):
        off = k * fsize
        assert out[off] == 0xFF and (out[off + 1] & 0xF0) == 0xF0, off


@pytest.mark.parametrize("rate,kbps", RATES)
def test_oracle_lsf_roundtrip(rate, kbps):
    from mp3tpu.numpy_ref.encoder import encode_layer3
    pcm = _signal(rate)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=kbps,
                        sample_rate_hz=rate)
    out = encode_layer3(pcm, cfg)
    _check_cbr(out, rate, kbps)
    dec, drate = decode_mp3(out)
    assert drate == rate
    snr = float(snr_db(pcm.astype(np.float64), dec[:, 0]))
    assert snr > 25.0, snr


@pytest.mark.parametrize("rate,kbps", RATES)
def test_fast_lsf_roundtrip(rate, kbps):
    from mp3tpu.encoder import encode_layer3_fast
    pcm = _signal(rate)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=kbps,
                        sample_rate_hz=rate)
    out = encode_layer3_fast(pcm, cfg)
    _check_cbr(out, rate, kbps)
    dec, drate = decode_mp3(out)
    assert drate == rate
    snr = float(snr_db(pcm.astype(np.float64), dec[:, 0]))
    assert snr > 25.0, snr


@pytest.mark.slow
def test_fast_lsf_stereo():
    from mp3tpu.encoder import encode_layer3_fast
    rate = 22050
    pcm = np.stack([_signal(rate), _signal(rate, seed=6)])
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_STEREO, bitrate_kbps=128,
                        sample_rate_hz=rate)
    out = encode_layer3_fast(pcm, cfg)
    _check_cbr(out, rate, 128)
    dec, drate = decode_mp3(out)
    for c in range(2):
        snr = float(snr_db(pcm[c].astype(np.float64), dec[:, c]))
        assert snr > 25.0, (c, snr)


# ---- MPEG-2 LSF Layers I/II (IS 13818-3): valid decodable streams at
# 16/22.05/24 kHz.  The reference's support is dormant-and-broken:
# common.c:255-265 unpacks alloc table 4 and pick_table selects it
# (common.c:307), but BOTH psy models die at LSF rates (psy.c:136
# rejects 16/22.05/24 kHz; model 1's table files are missing), so the
# reference binary cannot produce any LSF L1/L2 stream.  Our psy
# derives LSF absolute thresholds from the parent-rate tables
# (numpy_ref/psy12._init_params).

_DELAY12 = {1: 545, 2: 481}  # synthesis+analysis filterbank delay

L12_CASES = [
    (2, 22050, 64, mpeg.MODE_MONO),
    (2, 24000, 96, mpeg.MODE_STEREO),
    (2, 16000, 48, mpeg.MODE_MONO),
    (1, 22050, 96, mpeg.MODE_MONO),
    (1, 24000, 128, mpeg.MODE_STEREO),
]


@pytest.mark.parametrize("layer,rate,kbps,mode", L12_CASES)
def test_lsf_layer12_roundtrip(layer, rate, kbps, mode):
    from mp3tpu.decoder import layer12 as dec12
    from mp3tpu.encoder import encode_layer12_fast
    x = _signal(rate)
    pcm = (x if mode == mpeg.MODE_MONO
           else np.stack([x, (x * 0.5).astype(np.int16)], 1))
    cfg = EncoderConfig(layer=layer, mode=mode, bitrate_kbps=kbps,
                        sample_rate_hz=rate)
    out = encode_layer12_fast(pcm, cfg)
    # header: MPEG-2 version bit, right layer bits, CBR grid
    assert out[0] == 0xFF and (out[1] & 0xF0) == 0xF0
    assert ((out[1] >> 3) & 1) == 0, "version bit must be 0 (MPEG-2)"
    assert 4 - ((out[1] >> 1) & 3) == layer
    spf = 384 if layer == 1 else 1152
    bits_per_slot = 32 if layer == 1 else 8
    fsize = int((spf / (rate / 1000.0)) * (kbps / bits_per_slot)) \
        * (bits_per_slot // 8)
    assert out[fsize] == 0xFF and (out[fsize + 1] & 0xF0) == 0xF0
    dec, drate = dec12.decode(out)
    assert drate == rate
    ref2 = np.atleast_2d(pcm.T).T
    d = _DELAY12[layer]
    n = min(len(ref2) - d, len(dec) - d)
    o = ref2[:n, 0].astype(np.float64)
    err = o - dec[d:d + n, 0] * 32768.0
    snr = 10 * np.log10((o ** 2).sum() / max((err ** 2).sum(), 1e-30))
    assert snr > 20.0, snr
