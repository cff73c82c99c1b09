#!/usr/bin/env python3
"""Honest per-stage device-time attribution for the Layer III fast path.

The production pipeline is async with ONE sync at the end, so the
profiler's stage labels collapse all device time into whichever stage
blocks (VERDICT r4 weak #2).  This tool re-runs the pipeline's pieces
WITH a block_until_ready() after each, on the bench signal, so each
stage's device wall-clock is measured in isolation (slightly pessimistic
-- no cross-stage overlap -- but attribution is real).

Optionally captures a jax.profiler device trace (MP3TPU_XPLANE=dir).

Prints a JSON report; tools/run_profile_r05.py commits it as
PROFILE_r05.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    jax.block_until_ready(x)
    return x


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_signal
    from mp3tpu.config import EncoderConfig
    from mp3tpu.encoder import (SUPER_BUCKETS, _plan_budgets_dev,
                                _plan_segments, encode_layer3_fast)
    from mp3tpu.models import layer3
    from mp3tpu.tables import mpeg

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    rate = 44100
    pcm = make_signal(seconds, rate)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_STEREO, bitrate_kbps=128,
                        sample_rate_hz=rate)

    t0 = time.perf_counter()
    out = encode_layer3_fast(pcm, cfg)
    warmup_s = time.perf_counter() - t0
    assert len(out) > 1000

    # end-to-end reference timing (median of 5)
    e2e = []
    for _ in range(5):
        t0 = time.perf_counter()
        encode_layer3_fast(pcm, cfg)
        e2e.append(time.perf_counter() - t0)
    e2e.sort()

    # ---- staged re-run with per-stage syncs
    cfg.finalize()
    nch = cfg.nchannels
    spf, mode_gr = cfg.samples_per_frame, cfg.mode_gr
    p = np.asarray(pcm, np.float32).T
    nframes = int(np.ceil(p.shape[1] / spf))
    total = nframes * spf
    p = np.pad(p, ((0, 0), (0, total - p.shape[1])))
    G = nframes * mode_gr
    sfreq_hz = float(mpeg.S_FREQ_KHZ[cfg.version][cfg.sampling_frequency]) * 1000.0
    blocks = p.astype(np.int16).reshape(nch, G, 576)
    plan = _plan_segments(G, SUPER_BUCKETS)
    whole_spf, _ = cfg.slots_per_frame()
    bits_per_frame = 8 * whole_spf
    sideinfo_len = mpeg.sideinfo_bits(cfg.version, nch, cfg.error_protection)
    mean_bits = (bits_per_frame - sideinfo_len) // mode_gr
    resv_max = min(max(0, 7680 - bits_per_frame), 4088)
    delta = int(os.environ.get("MP3TPU_RELAX_DELTA", "28"))
    pw = int(os.environ.get("MP3TPU_PW", "96"))

    stages = {}

    def run_once(record):
        fsm = jnp.zeros(nch, jnp.int32)
        segs = []
        t0 = time.perf_counter()
        for pos, n_real, n_pad in plan:
            bl = np.zeros((nch, 4 + n_pad, 576), np.int16)
            if pos:
                bl[:, :4] = blocks[:, pos - 4: pos]
            bl[:, 4:4 + n_real] = blocks[:, pos: pos + n_real]
            ana = layer3.analyze_demand_fused(
                bl, fsm, cfg.version, cfg.sampling_frequency, sfreq_hz)
            fsm = ana["fsm_state"]
            segs.append(ana)
        sync([a["p23"] for a in segs])
        record("analyze+demand", time.perf_counter() - t0)

        t0 = time.perf_counter()
        bud_rows, target_dev, demand_dev, _ = _plan_budgets_dev(
            [a["pe"] for a in segs], [a["p23"] for a in segs], 0, plan,
            nch, mode_gr, mean_bits, resv_max, delta)
        sync(bud_rows)
        record("budget scan", time.perf_counter() - t0)

        t0 = time.perf_counter()
        hosts = []
        for i, ((pos, n_real, n_pad), a) in enumerate(zip(plan, segs)):
            h = layer3.encode_final(
                a["xr"], a["ratio_l"], a["ratio_s"], a["block_type"],
                bud_rows[i], cfg.version, cfg.sampling_frequency,
                payload_words=pw, scfsi=a.get("scfsi"),
                sf_fix=a.get("sf_fix"), nch=nch, qss_lo=a["qss"])
            hosts.append(h)
        sync([h["side"] for h in hosts])
        record("final encode+pack", time.perf_counter() - t0)

        t0 = time.perf_counter()
        got = jax.device_get([(h["side"], h["payload"]) for h in hosts]
                             + [(target_dev, demand_dev)])
        record("download", time.perf_counter() - t0)
        return got

    run_once(lambda k, v: None)  # compile any staged-shape variants
    for rep in range(3):
        run_once(lambda k, v: stages.setdefault(k, []).append(v))

    xplane_dir = os.environ.get("MP3TPU_XPLANE")
    if xplane_dir:
        with jax.profiler.trace(xplane_dir):
            run_once(lambda k, v: None)

    report = {
        "signal_s": seconds,
        "warmup_s": round(warmup_s, 2),
        "e2e_median_s": round(e2e[2], 4),
        "e2e_x_realtime": round(seconds / e2e[2], 1),
        "stages_s": {k: round(float(np.median(v)), 4)
                     for k, v in stages.items()},
        "staged_total_s": round(sum(float(np.median(v))
                                    for v in stages.values()), 4),
        "note": ("per-stage numbers include one host sync each; their "
                 "sum exceeds the pipelined e2e time by the removed "
                 "overlap + extra syncs"),
        "plan": plan,
        "granules": G,
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
