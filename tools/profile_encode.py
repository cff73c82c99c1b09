#!/usr/bin/env python3
"""Produce a per-stage profile artifact for the headline encode.

Runs the 60 s stereo 128 kbps configuration twice (warmup compiles,
then a measured pass with the stage profiler) and writes
PROFILE_r<N>.json at the repo root.

Usage: python tools/profile_encode.py [seconds] [out.json]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PROFILE_r03.json"

    import bench
    from mp3tpu.config import EncoderConfig
    from mp3tpu.encoder import encode_layer3_fast
    from mp3tpu.runtime.profiling import Profiler
    from mp3tpu.tables import mpeg

    pcm = bench.make_signal(seconds, 44100)
    cfg = EncoderConfig(layer=3, mode=mpeg.MODE_STEREO, bitrate_kbps=128,
                        sample_rate_hz=44100)
    t0 = time.perf_counter()
    encode_layer3_fast(pcm, cfg)             # warmup / compile
    warm = time.perf_counter() - t0

    prof = Profiler()
    t0 = time.perf_counter()
    out = encode_layer3_fast(pcm, cfg, prof=prof)
    wall = time.perf_counter() - t0

    import jax
    record = {
        "config": "layer3 stereo 44.1kHz 128kbps",
        "clip_seconds": seconds,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "warmup_s": round(warm, 3),
        "wall_s": round(wall, 4),
        "x_realtime": round(seconds / wall, 2),
        "bytes": len(out),
        "stages_s": {k: round(v, 4) for k, v in prof.stages.items()},
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
