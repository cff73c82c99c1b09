"""CLI streaming stdin path (musicin.c:310-371 'inf' mode parity)."""
import io

import numpy as np

from mp3tpu import cli
from mp3tpu.decoder import decode_mp3


def test_cli_streams_stdin(tmp_path, monkeypatch):
    rate = 44100
    t = np.arange(int(1.2 * rate)) / rate
    x = np.clip(0.3 * np.sin(2 * np.pi * 440 * t) * 22000,
                -32768, 32767).astype(">i2")        # raw big-endian mono
    monkeypatch.setattr("sys.stdin",
                        type("S", (), {"buffer": io.BytesIO(x.tobytes())})())
    out = tmp_path / "out.mp3"
    rc = cli.main(["-b", "64", "-s", "44.1", "-", str(out)])
    assert rc == 0
    data = out.read_bytes()
    assert data[0] == 0xFF
    dec, r = decode_mp3(data)
    assert r == rate and dec.shape[0] >= len(t) - 1152
