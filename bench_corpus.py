#!/usr/bin/env python3
"""Corpus throughput benchmark: aggregate encode rate over many clips.

BASELINE.json configs[4] is a 1,000-clip corpus; the metric is
aggregate audio-seconds per wall-second.  Clips reuse the encoder's
fixed-size chunk programs, so after the first clip everything is warm
and the corpus runs back-to-back dispatches.

Usage: python bench_corpus.py [n_clips] [seconds_per_clip]
Prints one JSON line like bench.py.
"""
import json
import sys
import time

import numpy as np

BASELINE_RT = 33.1  # reference single-core realtime factor (BASELINE.md)


def make_clip(seed, seconds, rate):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * rate)) / rate
    f0 = 200.0 + 80.0 * (seed % 13)
    x = (0.3 * np.sin(2 * np.pi * f0 * t)
         + 0.1 * np.sin(2 * np.pi * 2.7 * f0 * t)
         + 0.05 * rng.randn(len(t)))
    y = 0.25 * np.sin(2 * np.pi * 1.5 * f0 * t) + 0.05 * rng.randn(len(t))
    pcm = np.stack([x, y], axis=0)
    return np.clip(pcm * 22000, -32768, 32767).astype(np.int16)


def main():
    from mp3tpu.parallel.corpus import encode_corpus_batched
    from mp3tpu.tables import mpeg

    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    rate = 44100
    clips = [(make_clip(s, seconds, rate), rate) for s in range(n_clips)]
    kw = dict(layer=3, mode=mpeg.MODE_STEREO, bitrate_kbps=128)

    # warmup: compile the batched-lane programs
    outs, _ = encode_corpus_batched(clips[:batch], kw, batch=batch)
    assert all(len(o) > 1000 for o in outs)

    outs, stats = encode_corpus_batched(clips, kw, batch=batch)
    assert all(len(o) > 1000 for o in outs)

    rt = stats["x_realtime"]
    print(json.dumps({
        "metric": "layer3 corpus aggregate realtime factor "
                  f"({n_clips} clips x {seconds:.0f}s, stereo 128kbps, "
                  f"lane-batch {batch}, 1 chip)",
        "value": round(rt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rt / BASELINE_RT, 3),
    }))


if __name__ == "__main__":
    main()
