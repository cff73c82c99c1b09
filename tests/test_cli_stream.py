"""CLI streaming stdin path (musicin.c:310-371 'inf' mode parity).

The reference reads stdin channel-interleaved at the configured mode,
default STEREO (encoder.h:64 DFLT_MOD 's'; interleaved read
encode.c:139-160) -- so `-m m` must be explicit for mono pipes.
"""
import io

import numpy as np

from mp3tpu import cli
from mp3tpu.decoder import decode_mp3


def _stdin(monkeypatch, payload):
    monkeypatch.setattr("sys.stdin",
                        type("S", (), {"buffer": io.BytesIO(payload)})())


def test_cli_streams_stdin(tmp_path, monkeypatch):
    rate = 44100
    t = np.arange(int(1.2 * rate)) / rate
    x = np.clip(0.3 * np.sin(2 * np.pi * 440 * t) * 22000,
                -32768, 32767).astype(">i2")        # raw big-endian mono
    _stdin(monkeypatch, x.tobytes())
    out = tmp_path / "out.mp3"
    rc = cli.main(["-m", "m", "-b", "64", "-s", "44.1", "-", str(out)])
    assert rc == 0
    data = out.read_bytes()
    assert data[0] == 0xFF
    dec, r = decode_mp3(data)
    assert r == rate and dec.shape[0] >= len(t) - 1152


def test_cli_streams_stdin_stereo(tmp_path, monkeypatch):
    """Stereo-interleaved pipe at the default mode: the two channels
    must stay separated (a mono-read of interleaved data would smear
    both tones into both channels)."""
    rate = 44100
    n = int(1.2 * rate)
    t = np.arange(n) / rate
    left = 0.4 * np.sin(2 * np.pi * 440 * t)
    right = 0.004 * np.sin(2 * np.pi * 3000 * t)    # near-silent
    inter = np.empty(2 * n)
    inter[0::2] = left
    inter[1::2] = right
    pcm = np.clip(inter * 32767, -32768, 32767).astype(">i2")
    _stdin(monkeypatch, pcm.tobytes())
    out = tmp_path / "out.mp3"
    rc = cli.main(["-b", "128", "-s", "44.1", "-", str(out)])
    assert rc == 0
    dec, r = decode_mp3(out.read_bytes())
    assert r == rate and dec.ndim == 2 and dec.shape[1] == 2
    e0 = float(np.mean(dec[:, 0].astype(np.float64) ** 2))
    e1 = float(np.mean(dec[:, 1].astype(np.float64) ** 2))
    # left carries ~40 dB more energy than right; any interleave mixup
    # would equalize them
    assert e0 > 1000.0 * max(e1, 1e-12), (e0, e1)


def test_cli_stream_stdout(monkeypatch, capsysbinary=None):
    """No output argument: MP3 bytes go to stdout (pipe semantics),
    not to a file named '-.mp3'."""
    rate = 44100
    n = int(0.4 * rate)
    t = np.arange(n) / rate
    x = np.clip(0.3 * np.sin(2 * np.pi * 440 * t) * 22000,
                -32768, 32767).astype(">i2")
    _stdin(monkeypatch, x.tobytes())
    sink = io.BytesIO()
    monkeypatch.setattr("sys.stdout",
                        type("O", (), {"buffer": sink,
                                       "flush": lambda self=None: None})())
    rc = cli.main(["-m", "m", "-b", "64", "-s", "44.1", "-"])
    assert rc == 0
    data = sink.getvalue()
    assert len(data) > 1000 and data[0] == 0xFF
