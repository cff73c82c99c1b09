"""Layer III error protection (-e): the 16-bit CRC word.

The reference accounts 16 CRC bits (musicin.c:723) but emits a
never-computed static 0 (l3bitstream.c:312), so its '-l 3 -e' frames
carry a bogus checksum.  Both our assemblers emit the real ISO
11172-3 CRC-16 (poly 0x8005, init 0xffff, over header bits 16..31 +
side info, per the Layer I/II routine common.c:1251-1324); these tests
recompute it from the raw frame bytes.
"""
import numpy as np
import pytest

from mp3tpu.config import EncoderConfig
from mp3tpu.decoder import decode_mp3
from mp3tpu.decoder.layer3 import snr_db
from mp3tpu.numpy_ref.bitstream import _update_crc16
from mp3tpu.tables import mpeg


def _signal(seconds, nch, rate=44100):
    rng = np.random.RandomState(3)
    t = np.arange(int(seconds * rate)) / rate
    x = 0.25 * np.sin(2 * np.pi * 440 * t) + 0.03 * rng.randn(len(t))
    pcm = np.stack([x] * nch)
    return np.clip(pcm * 20000, -32768, 32767).astype(np.int16)


def _check_frames(out, nch, kbps, rate):
    """Walk the CBR frame grid; verify each frame's CRC word."""
    fsize = (144000 * kbps) // rate
    si_bytes = (mpeg.sideinfo_bits(mpeg.MPEG1, nch, True) - 32 - 16) // 8
    nframes = 0
    for off in range(0, len(out) - fsize + 1, fsize):
        frame = out[off:off + fsize]
        assert frame[0] == 0xFF and (frame[1] & 0xF0) == 0xF0
        assert (frame[1] & 1) == 0, "protection bit must be 0 with -e"
        stored = (frame[4] << 8) | frame[5]
        crc = 0xFFFF
        for b in frame[2:4]:                      # header bits 16..31
            crc = _update_crc16(b, 8, crc)
        for b in frame[6:6 + si_bytes]:           # side info
            crc = _update_crc16(b, 8, crc)
        assert stored == crc, (off, hex(stored), hex(crc))
        nframes += 1
    assert nframes >= 5
    return nframes


@pytest.mark.parametrize("mode,nch", [(mpeg.MODE_MONO, 1),
                                      (mpeg.MODE_STEREO, 2)])
def test_fast_path_crc(mode, nch):
    from mp3tpu.encoder import encode_layer3_fast
    pcm = _signal(0.6, nch)
    cfg = EncoderConfig(layer=3, mode=mode, bitrate_kbps=128 if nch == 2
                        else 64, sample_rate_hz=44100,
                        error_protection=True)
    data = pcm[0] if nch == 1 else pcm
    out = encode_layer3_fast(data, cfg)
    _check_frames(out, nch, cfg.bitrate_kbps, 44100)
    dec, rate = decode_mp3(out)
    assert rate == 44100
    snr = float(snr_db(pcm[0].astype(np.float64), dec[:, 0]))
    assert snr > 5.0, snr


def test_oracle_crc():
    from mp3tpu.numpy_ref.encoder import encode_layer3
    pcm = _signal(0.2, 1)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=64,
                        sample_rate_hz=44100, error_protection=True)
    out = encode_layer3(pcm[0], cfg)
    _check_frames(out, 1, 64, 44100)
