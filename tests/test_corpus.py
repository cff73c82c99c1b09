"""Corpus mode: clip partitioning + a 2-process jax.distributed smoke
test on CPU (SURVEY.md section 5.8; BASELINE.json 1,000-clip config)."""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from mp3tpu.parallel.corpus import encode_corpus, local_share


def test_local_share_partitions():
    for n, np_ in [(10, 2), (7, 3), (3, 8), (1000, 4)]:
        seen = []
        for pid in range(np_):
            s, e = local_share(n, process_id=pid, num_processes=np_)
            seen.extend(range(s, e))
        assert seen == list(range(n)), (n, np_)


def test_encode_corpus_layer12():
    """Corpus helper end-to-end on the (cheap) Layer II path."""
    from mp3tpu.encoder import encode_layer12_fast
    from mp3tpu.tables import mpeg
    rng = np.random.RandomState(0)
    clips = []
    for s in range(3):
        t = np.arange(int(0.3 * 44100)) / 44100.0
        x = np.clip((0.2 * np.sin(2 * np.pi * (300 + 100 * s) * t)
                     + 0.02 * rng.randn(len(t))) * 20000,
                    -32768, 32767).astype(np.int16)
        clips.append((np.stack([x, x]), 44100))
    outs, stats = encode_corpus(
        clips, dict(layer=2, mode=mpeg.MODE_STEREO, bitrate_kbps=192),
        encode=encode_layer12_fast)
    assert len(outs) == 3 and all(len(o) > 500 for o in outs)
    assert stats["clips"] == 3 and stats["audio_s"] > 0.8


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, os.getcwd())
    from mp3tpu.parallel.corpus import (encode_corpus, init_distributed,
                                        local_share)
    from mp3tpu.tables import mpeg
    pid = int(sys.argv[1]); port = sys.argv[2]
    p, n = init_distributed("localhost:" + port, 2, pid)
    assert n == 2 and p == pid, (p, n)
    # 4-clip corpus, each process ENCODES its disjoint share
    def clip(seed):
        rng = np.random.RandomState(seed)
        t = np.arange(int(0.5 * 44100)) / 44100.0
        x = (0.25 * np.sin(2 * np.pi * (300 + 50 * seed) * t)
             + 0.02 * rng.randn(len(t)))
        return (np.clip(x[None, :] * 20000, -32768, 32767)
                .astype(np.int16), 44100)
    s, e = local_share(4)
    outs, stats = encode_corpus(
        [clip(i) for i in range(s, e)],
        dict(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=64))
    ok = all(len(o) > 500 and o[0] == 0xFF for o in outs)
    print("SHARE", p, s, e, int(ok), round(stats["x_realtime"], 3),
          flush=True)
""")


@pytest.mark.slow
def test_two_process_distributed_encode(tmp_path):
    """jax.distributed across 2 CPU processes: each owns a disjoint
    corpus share, ENCODES it, and reports throughput -- the
    musicin.c:456 one-file-per-process model scaled out."""
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = str(sock.getsockname()[1])
    sock.close()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-800:]
        outs.append(out.decode())
    rows = sorted(o.split("SHARE")[1].split() for o in outs)
    assert [r[:3] for r in rows] == [["0", "0", "2"], ["1", "2", "4"]], rows
    assert all(r[3] == "1" for r in rows), rows   # valid streams
    agg = sum(float(r[4]) for r in rows)
    assert agg > 0.0, rows


def test_encode_corpus_batched_matches_single():
    """Batched lane-stacked corpus encode produces valid streams of
    the same CBR length and equal decoded quality as per-clip encodes
    (batch-shape float jitter may move individual bits)."""
    from mp3tpu.config import EncoderConfig
    from mp3tpu.decoder import decode_mp3
    from mp3tpu.decoder.layer3 import snr_db
    from mp3tpu.encoder import encode_layer3_fast
    from mp3tpu.parallel.corpus import encode_corpus_batched
    from mp3tpu.tables import mpeg

    rng = np.random.RandomState(5)
    clips = []
    for s in range(3):
        n = int((0.6 + 0.3 * s) * 44100)
        t = np.arange(n) / 44100.0
        x = (0.3 * np.sin(2 * np.pi * (350 + 60 * s) * t)
             + 0.03 * rng.randn(n))
        clips.append((np.clip(x[None, :] * 22000, -32768, 32767)
                      .astype(np.int16), 44100))

    kw = dict(layer=3, mode=mpeg.MODE_MONO, bitrate_kbps=64)
    outs, stats = encode_corpus_batched(clips, kw, batch=3)
    assert stats["clips"] == 3 and stats["x_realtime"] > 0
    for (pcm, rate), out in zip(clips, outs):
        cfg = EncoderConfig(sample_rate_hz=rate, **kw)
        single = encode_layer3_fast(pcm, cfg)
        assert len(out) == len(single)
        assert out[0] == 0xFF
        dec_b, _ = decode_mp3(out)
        dec_s, _ = decode_mp3(single)
        s_b = float(snr_db(pcm[0].astype(np.float64), dec_b[:, 0]))
        s_s = float(snr_db(pcm[0].astype(np.float64), dec_s[:, 0]))
        assert abs(s_b - s_s) < 0.5, (s_b, s_s)
        assert s_b > 10.0, s_b


def test_encode_corpus_batched_stereo_mixed_lengths():
    """REGRESSION (round-5 review): in a batched group, a clip shorter
    than the group max has tail granules past its real length whose
    p23 is NOT zero (the MDCT overlap of the last real granule rings
    into the first padded granule).  The payload stitcher must exclude
    those tail words from spans AND offsets together -- trimming only
    the offsets shifted every later CHANNEL's words, decoding the
    short clip's channel 1 to noise.  Mono clips never caught it."""
    from mp3tpu.config import EncoderConfig
    from mp3tpu.decoder import decode_mp3
    from mp3tpu.decoder.layer3 import snr_db
    from mp3tpu.encoder import encode_layer3_fast
    from mp3tpu.parallel.corpus import encode_corpus_batched
    from mp3tpu.tables import mpeg

    rng = np.random.RandomState(11)
    clips = []
    for s, secs in enumerate((0.6, 1.0)):
        n = int(secs * 44100)
        t = np.arange(n) / 44100.0
        left = 0.3 * np.sin(2 * np.pi * (350 + 60 * s) * t) \
            + 0.03 * rng.randn(n)
        right = 0.25 * np.sin(2 * np.pi * (500 + 80 * s) * t) \
            + 0.03 * rng.randn(n)
        pcm = np.clip(np.stack([left, right]) * 22000,
                      -32768, 32767).astype(np.int16)
        clips.append((pcm, 44100))

    kw = dict(layer=3, mode=mpeg.MODE_STEREO, bitrate_kbps=128)
    outs, _ = encode_corpus_batched(clips, kw, batch=2)
    for (pcm, rate), out in zip(clips, outs):
        cfg = EncoderConfig(sample_rate_hz=rate, **kw)
        single = encode_layer3_fast(pcm, cfg)
        assert len(out) == len(single)
        dec_b, _ = decode_mp3(out)
        dec_s, _ = decode_mp3(single)
        for ch in range(2):
            s_b = float(snr_db(pcm[ch].astype(np.float64), dec_b[:, ch]))
            s_s = float(snr_db(pcm[ch].astype(np.float64), dec_s[:, ch]))
            assert abs(s_b - s_s) < 0.5, (ch, s_b, s_s)
            assert s_b > 10.0, (ch, s_b)
