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
    from mp3tpu.parallel.corpus import init_distributed, local_share
    pid = int(sys.argv[1]); port = sys.argv[2]
    p, n = init_distributed("localhost:" + port, 2, pid)
    assert n == 2 and p == pid, (p, n)
    s, e = local_share(10)
    print("SHARE", p, s, e, flush=True)
""")


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    """jax.distributed initializes across 2 CPU processes and each
    owns a disjoint corpus share."""
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
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-800:]
        outs.append(out.decode())
    shares = sorted(o.split("SHARE")[1].split() for o in outs)
    assert shares == [["0", "0", "5"], ["1", "5", "10"]], shares
