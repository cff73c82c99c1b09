"""Failure detection/recovery + checkpoint/resume (SURVEY.md sections
5.2-5.4; the reference's only behavior is printf+exit)."""
import numpy as np
import jax.numpy as jnp

from mp3tpu.config import EncoderConfig
from mp3tpu.decoder import decode_mp3
from mp3tpu.encoder import StreamEncoder, encode_layer3_fast
from mp3tpu.models import layer3
from mp3tpu.tables import mpeg


def _sig(seconds=1.0, rate=44100, seed=7):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * rate)) / rate
    x = 0.3 * np.sin(2 * np.pi * 500 * t) + 0.04 * rng.randn(len(t))
    return np.clip(x[None, :] * 22000, -32768, 32767).astype(np.int16)


def test_nan_pcm_still_encodes():
    """NaN/Inf float PCM is sanitized at the host boundary; the stream
    stays valid and decodable."""
    pcm = _sig(0.5).astype(np.float64)
    pcm[0, 1000:1200] = np.nan
    pcm[0, 3000:3050] = np.inf
    pcm[0, 5000:5050] = -np.inf
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=64,
                        sample_rate_hz=44100)
    out = encode_layer3_fast(pcm.T, cfg)
    assert out[0] == 0xFF
    dec, rate = decode_mp3(out)
    assert rate == 44100 and np.all(np.isfinite(dec))


def test_nonfinite_analysis_degrades_to_silence():
    """A granule whose device analysis goes non-finite is zeroed on
    device (valid stream) and counted in n_nonfinite."""
    blocks = np.zeros((1, 4 + 16, 576), np.float32)
    blocks[0, 4:] = 1000.0
    blocks[0, 10, :10] = np.nan          # poison one granule's input
    ana = layer3.analyze_demand_fused(
        jnp.asarray(blocks), jnp.zeros(1, jnp.int32), mpeg.MPEG1, 0,
        44100.0)
    assert int(ana["n_nonfinite"]) >= 1
    assert bool(np.all(np.isfinite(np.asarray(ana["xr"]))))
    assert bool(np.all(np.isfinite(np.asarray(ana["pe"]))))
    assert bool(np.all(np.asarray(ana["p23"]) >= 0))


def test_checkpoint_resume_identical_stream():
    """Stop after k windows, serialize the carry, resume in a FRESH
    encoder: the concatenated output is byte-identical to an
    uninterrupted run."""
    pcm = _sig(4.0)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=64,
                        sample_rate_hz=44100)

    enc = StreamEncoder(cfg, window=64)
    whole = enc.feed(pcm) + enc.finish()

    cfg2 = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=64,
                         sample_rate_hz=44100)
    enc1 = StreamEncoder(cfg2, window=64)
    cut = pcm.shape[1] // 2
    part1 = enc1.feed(pcm[:, :cut])
    ckpt = enc1.checkpoint()
    # serialize through plain bytes (what a job runner would persist)
    import pickle
    blob = pickle.dumps(ckpt)
    del enc1

    cfg3 = EncoderConfig(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=64,
                         sample_rate_hz=44100)
    enc2 = StreamEncoder.resume(cfg3, pickle.loads(blob), window=64)
    part2 = enc2.feed(pcm[:, cut:]) + enc2.finish()
    assert part1 + part2 == whole
