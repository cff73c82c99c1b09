#!/usr/bin/env python3
"""Decoded-SNR quality gate ON THE DEVICE BACKEND (VERDICT r4 weak #4:
all 107 tests pin JAX_PLATFORMS=cpu with x64, so device numerics --
bf16-default matmuls behind the HIGHEST-precision guards, the f64->f32
truncation in jaxresv -- were never quality-checked on the hardware the
headline perf claims are made on).

Encodes the same 21 fixture channels as tests/test_fast_encoder.py on
whatever backend JAX picks (the real TPU under axon; bench.py's
backend), decodes on the host (the decoder is pure NumPy), and asserts
decoded SNR >= the reference encoder's bars (tests/golden/ref_snr.json,
BASELINE.md "decoded SNR >= reference at every bitrate").

Writes QUALITY_TPU_r05.json with per-fixture SNRs and the margin over
each bar.  Exit code 1 if any fixture fails its bar.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mp3tpu.config import EncoderConfig             # noqa: E402
from mp3tpu.decoder import decode_mp3               # noqa: E402
from mp3tpu.decoder.layer3 import snr_db            # noqa: E402
from mp3tpu.encoder import encode_layer3_fast       # noqa: E402
from mp3tpu.runtime.wav import read_wav             # noqa: E402
from mp3tpu.tables import mpeg                      # noqa: E402

CASES = [
    ("sine_mono_64", mpeg.MODE_MONO, 64, 44100),
    ("noise_mono_64", mpeg.MODE_MONO, 64, 44100),
    ("sweep_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("noise_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("trans_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("sine_st_128_32k", mpeg.MODE_STEREO, 128, 32000),
    ("q_sine_mono_64", mpeg.MODE_MONO, 64, 44100),
    ("q_sine_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("q_noise_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("q_sweep_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("q_trans_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("q_mix_st_128", mpeg.MODE_STEREO, 128, 44100),
    ("q_mix_st_192", mpeg.MODE_STEREO, 192, 44100),
    ("q_mix_mono_96_32k", mpeg.MODE_MONO, 96, 32000),
    ("q_mix_st_320_48k", mpeg.MODE_STEREO, 320, 48000),
]


def _mpg123_snr(out, pcm, rate, nch):
    """Cross-decode with the system libmpg123 (independent decoder);
    per-channel best-lag SNR, or None if unavailable."""
    from mp3tpu.runtime import mpg123
    if not mpg123.available():
        return None
    try:
        dec, drate = mpg123.decode(out)
    except RuntimeError as e:
        return {"error": str(e)}
    if drate != rate:
        return {"error": f"rate {drate} != {rate}"}
    snrs = []
    for c in range(min(nch, dec.shape[1])):
        best = -99.0
        for lag in range(2000):
            n = min(pcm.shape[0], dec.shape[0] - lag)
            if n < 1000:
                break
            o = pcm[:n, c].astype(np.float64)
            e = o - dec[lag:lag + n, c]
            best = max(best, 10 * np.log10(
                (o ** 2).sum() / max((e ** 2).sum(), 1e-30)))
        snrs.append(round(best, 2))
    return snrs


def main():
    import jax
    golden = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")
    with open(os.path.join(golden, "ref_snr.json")) as f:
        ref = json.load(f)
    backend = jax.devices()[0].platform
    report = {"backend": backend,
              "device": str(jax.devices()[0]),
              "x64": bool(jax.config.jax_enable_x64),
              "fixtures": {}, "all_pass": True}
    for name, mode, kbps, rate in CASES:
        pcm, r = read_wav(os.path.join(golden, f"{name}.wav"))
        cfg = EncoderConfig(layer=3, mode=mode, bitrate_kbps=kbps,
                            sample_rate_hz=rate)
        data = pcm[:, 0] if mode == mpeg.MODE_MONO else pcm
        out = encode_layer3_fast(data, cfg)
        fsize = (144000 * kbps) // rate
        nframes = -(-pcm.shape[0] // 1152)
        ok_struct = (len(out) == nframes * fsize + 1
                     and out[0] == 0xFF and (out[1] & 0xF0) == 0xF0)
        dec, drate = decode_mp3(out)
        chans = []
        ok = ok_struct and drate == rate
        for c in range(min(dec.shape[1], pcm.shape[1])):
            snr = float(snr_db(pcm[:, c].astype(np.float64), dec[:, c]))
            bar = ref[name][c]
            chans.append({"snr_db": round(snr, 2), "ref_bar_db": bar,
                          "margin_db": round(snr - bar, 2)})
            ok = ok and snr >= bar
        report["fixtures"][name] = {"pass": ok, "channels": chans,
                                    "valid_cbr_grid": ok_struct,
                                    "mpg123_snr_db": _mpg123_snr(
                                        out, pcm, rate, pcm.shape[1])}
        report["all_pass"] = report["all_pass"] and ok
        print(f"{name:20s} {'PASS' if ok else 'FAIL'} "
              + " ".join(f"{c['snr_db']:.1f}>={c['ref_bar_db']}" for c in chans),
              file=sys.stderr)
    out_path = sys.argv[1] if len(sys.argv) > 1 else "QUALITY_TPU_r05.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"backend": backend,
                      "all_pass": report["all_pass"],
                      "fixtures": len(report["fixtures"])}))
    return 0 if report["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
