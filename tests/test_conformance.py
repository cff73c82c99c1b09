"""Third-party decoder conformance: decode the encoder's output with
the system libmpg123 (industry standard, zero shared code with this
repo).  The in-repo decoder and encoder were written from the same
spec reading, so a shared misinterpretation would pass every SNR gate;
mpg123 closes that loop (the reference lineage's historical equivalent
was the ASCII-bitstream diff against ISO decoders, common.h:254)."""
import numpy as np
import pytest

from mp3tpu.config import EncoderConfig
from mp3tpu.runtime import mpg123
from mp3tpu.tables import mpeg

pytestmark = pytest.mark.skipif(not mpg123.available(),
                                reason="libmpg123 not present")


def _sig(rate, seconds=1.0, stereo=False):
    rng = np.random.RandomState(7)
    t = np.arange(int(seconds * rate)) / rate
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.randn(len(t))
    x = np.clip(x * 22000, -32768, 32767).astype(np.int16)
    return np.stack([x, (x * 0.6).astype(np.int16)]) if stereo else x


def _best_lag_snr(ref, dec, ch=0, max_lag=2000):
    """Decoder delay differs between implementations; report the best
    alignment's SNR."""
    best = -99.0
    for lag in range(max_lag):
        n = min(len(ref), len(dec) - lag)
        if n < 1000:
            break
        o = ref[:n].astype(np.float64)
        e = o - dec[lag:lag + n, ch]
        best = max(best, 10 * np.log10(
            (o ** 2).sum() / max((e ** 2).sum(), 1e-30)))
    return best


CASES = [
    ("l3_st_128", 3, mpeg.MODE_STEREO, 128, 44100, 12.0),
    ("l3_mono_64", 3, mpeg.MODE_MONO, 64, 44100, 12.0),
    ("l3_lsf_22k_48", 3, mpeg.MODE_MONO, 48, 22050, 12.0),
    ("l2_st_192", 2, mpeg.MODE_STEREO, 192, 44100, 15.0),
    ("l1_st_384", 1, mpeg.MODE_STEREO, 384, 44100, 15.0),
]


@pytest.mark.parametrize("name,layer,mode,kbps,rate,bar", CASES,
                         ids=[c[0] for c in CASES])
def test_mpg123_decodes_our_stream(name, layer, mode, kbps, rate, bar):
    stereo = mode == mpeg.MODE_STEREO
    pcm = _sig(rate, stereo=stereo)
    cfg = EncoderConfig(layer=layer, mode=mode, bitrate_kbps=kbps,
                        sample_rate_hz=rate)
    if layer == 3:
        from mp3tpu.encoder import encode_layer3_fast
        out = encode_layer3_fast(pcm, cfg)
    else:
        from mp3tpu.encoder import encode_layer12_fast
        out = encode_layer12_fast(pcm.T if stereo else pcm, cfg)
    dec, drate = mpg123.decode(out)
    assert drate == rate
    assert dec.shape[1] == (2 if stereo else 1)
    ref0 = pcm[0] if stereo else pcm
    n_expect = len(ref0)
    assert dec.shape[0] >= n_expect - 2 * 1152, (dec.shape, n_expect)
    snr = _best_lag_snr(ref0, dec)
    assert snr > bar, (name, snr)
    if stereo:
        snr1 = _best_lag_snr(pcm[1], dec, ch=1)
        assert snr1 > bar - 3.0, (name, snr1)


def test_mpg123_crc_stream():
    """Error-protected (CRC-16) Layer III stream passes mpg123's CRC
    handling."""
    rate = 44100
    pcm = _sig(rate)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=96,
                        sample_rate_hz=rate, error_protection=True)
    from mp3tpu.encoder import encode_layer3_fast
    out = encode_layer3_fast(pcm, cfg)
    dec, drate = mpg123.decode(out)
    assert drate == rate
    assert _best_lag_snr(pcm, dec) > 12.0


def test_mpg123_agrees_on_dense_count1_content():
    """REGRESSION (round-5 conformance find): dist10 indexes count1
    quads with the first sample at bit 0 (l3bitstream.c:740), so its
    quads decode SAMPLE-REVERSED in conforming decoders -- an
    inherited deviation that cost ~1.5-8 dB of true decoded quality on
    dense content and made our decoder disagree with mpg123 at ~5 dB.
    The production path now emits the conformant (v<<3)|(w<<2)|(x<<1)|y
    index; full-band noise (count1-heavy) must decode near-identically
    in our decoder and libmpg123."""
    from mp3tpu.decoder import decode_mp3
    from mp3tpu.encoder import encode_layer3_fast
    rng = np.random.RandomState(4)
    rate = 44100
    x = rng.randn(int(1.0 * rate))
    pcm = np.clip(x / np.abs(x).max() * 15000, -32768,
                  32767).astype(np.int16)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=64,
                        sample_rate_hz=rate)
    out = encode_layer3_fast(pcm, cfg)
    ours = decode_mp3(out)[0][:, 0] * 32768.0
    theirs, _ = mpg123.decode(out)
    theirs = theirs[:, 0].astype(np.float64)
    n = min(len(ours), len(theirs))
    e = ours[:n] - theirs[:n]
    agree = 10 * np.log10(max((ours[:n] ** 2).sum(), 1e-30)
                          / max((e ** 2).sum(), 1e-30))
    assert agree > 20.0, agree
