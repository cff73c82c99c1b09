"""Multi-chip clip->bytes equivalence on the virtual 8-device CPU mesh.

The production sharded path (mp3tpu/parallel/clip.py) must produce a
valid, decodable stream whose quality equals the single-chip chunked
path on the same PCM -- the north-star requirement that scaling out
changes throughput, not output quality (BASELINE.md).
"""
import numpy as np
import pytest

import jax

from mp3tpu.config import EncoderConfig
from mp3tpu.decoder import decode_mp3
from mp3tpu.decoder.layer3 import snr_db
from mp3tpu.encoder import encode_layer3_fast
from mp3tpu.parallel import clip, sharding
from mp3tpu.tables import mpeg


def _signal(seconds=2.0, rate=44100):
    rng = np.random.RandomState(11)
    t = np.arange(int(seconds * rate)) / rate
    x = 0.25 * np.sin(2 * np.pi * 440 * t) + 0.03 * rng.randn(len(t))
    y = 0.2 * np.sin(2 * np.pi * 554 * t) + 0.03 * rng.randn(len(t))
    # a couple of transients so short blocks + the cross-chunk FSM
    # actually engage
    for frac in (0.3, 0.7):
        pos = int(frac * seconds * rate)
        x[pos:pos + 200] += 0.5 * np.hanning(200)[:len(x) - pos]
    return np.clip(np.stack([x, y]) * 24000, -32768, 32767).astype(np.int16)


@pytest.mark.slow
def test_sharded_clip_equals_single_chip():
    pcm = _signal()
    mesh = sharding.make_mesh(devices=jax.devices()[:8])

    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_STEREO, bitrate_kbps=128,
                        sample_rate_hz=44100)
    out_mesh = clip.encode_layer3_sharded(pcm, cfg, mesh=mesh, chunk=16)

    cfg1 = EncoderConfig(layer=3, mode=mpeg.MODE_STEREO, bitrate_kbps=128,
                        sample_rate_hz=44100)
    out_one = encode_layer3_fast(pcm, cfg1, chunk=16)

    # same CBR grid
    assert len(out_mesh) == len(out_one)
    assert out_mesh[0] == 0xFF and (out_mesh[1] & 0xF0) == 0xF0

    dec_m, rate_m = decode_mp3(out_mesh)
    dec_o, rate_o = decode_mp3(out_one)
    assert rate_m == rate_o == 44100
    for c in range(2):
        s_m = float(snr_db(pcm[c].astype(np.float64), dec_m[:, c]))
        s_o = float(snr_db(pcm[c].astype(np.float64), dec_o[:, c]))
        # identical psy/rate-loop policy; shard_map-vs-jit float32
        # fusion jitter may move individual coding decisions, but
        # decoded quality must be equal
        assert abs(s_m - s_o) < 0.5, (c, s_m, s_o)
        assert s_m > 10.0, (c, s_m)


@pytest.mark.slow
def test_sharded_clip_lsf_22050():
    """MPEG-2 LSF (22.05 kHz, mode_gr=1, no scfsi) on the mesh decodes
    at parity with the single-chip path (loop.c:871, musicin.c:545)."""
    pcm = _signal(seconds=1.5, rate=22050)
    mesh = sharding.make_mesh(devices=jax.devices()[:4])
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_STEREO, bitrate_kbps=64,
                        sample_rate_hz=22050)
    out_mesh = clip.encode_layer3_sharded(pcm, cfg, mesh=mesh, chunk=16)
    cfg1 = EncoderConfig(layer=3, mode=mpeg.MODE_STEREO, bitrate_kbps=64,
                         sample_rate_hz=22050)
    out_one = encode_layer3_fast(pcm, cfg1, chunk=16)
    assert len(out_mesh) == len(out_one)
    dec_m, rate_m = decode_mp3(out_mesh)
    dec_o, rate_o = decode_mp3(out_one)
    assert rate_m == rate_o == 22050
    for c in range(2):
        s_m = float(snr_db(pcm[c].astype(np.float64), dec_m[:, c]))
        s_o = float(snr_db(pcm[c].astype(np.float64), dec_o[:, c]))
        assert abs(s_m - s_o) < 0.5, (c, s_m, s_o)
        assert s_m > 10.0, (c, s_m)


@pytest.mark.slow
def test_sharded_clip_scales_device_count():
    """1-, 2- and 8-device meshes produce equal-quality streams."""
    pcm = _signal(seconds=1.0)
    snrs = []
    for n in (1, 2, 8):
        mesh = sharding.make_mesh(devices=jax.devices()[:n])
        cfg = EncoderConfig(layer=3, mode=mpeg.MODE_STEREO,
                            bitrate_kbps=128, sample_rate_hz=44100)
        out = clip.encode_layer3_sharded(pcm, cfg, mesh=mesh, chunk=8)
        dec, _ = decode_mp3(out)
        snrs.append(float(snr_db(pcm[0].astype(np.float64), dec[:, 0])))
    assert max(snrs) - min(snrs) < 0.5, snrs
