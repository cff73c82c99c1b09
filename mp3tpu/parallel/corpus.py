"""Corpus encoding: many clips, one or many hosts.

The reference encodes one file per process invocation (musicin.c:456);
the corpus config in BASELINE.json (1,000 clips) is its natural
production scale-out.  Clips are independent, so the corpus is data
parallel at two levels:

  - within a host: clips run back-to-back through the fixed-size chunk
    programs (mp3tpu/encoder.py) -- after the first clip everything is
    compiled and the device stays busy via async dispatch;
  - across hosts: `jax.distributed` partitions the clip list by
    process id (contiguous shards); there is no cross-host traffic at
    all -- aggregate metrics are reduced host-side by the caller.

For pod-slice scale-out of a SINGLE long clip, use
mp3tpu/parallel/clip.py (chunk-sharded mesh encode) instead.
"""
import time

import numpy as np

from ..config import EncoderConfig


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize jax.distributed (multi-host).  All arguments default
    to the standard JAX env vars; returns (process_id, num_processes)."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def local_share(n_items, process_id=None, num_processes=None):
    """Contiguous [start, end) range of corpus items owned by this
    process."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    per = -(-n_items // nproc)
    start = min(pid * per, n_items)
    return start, min(start + per, n_items)


def encode_corpus(clips, cfg_kwargs, encode=None, workers=3):
    """Encode a list of (pcm int16, sample_rate_hz) clips; returns
    (outputs, stats dict).  cfg_kwargs: EncoderConfig kwargs applied
    per clip (sample_rate_hz comes from the clip).

    workers > 1 pipelines clips through a thread pool: one clip's
    host stages (PCM framing, reservoir scan, native assembly -- all
    GIL-releasing numpy/ctypes) overlap another clip's device
    dispatches, so the chip never idles between clips.  Encodes are
    stateless per call; outputs keep corpus order."""
    if encode is None:
        from ..encoder import encode_layer3_fast
        encode = encode_layer3_fast

    def one(item):
        pcm, rate = item
        pcm = np.atleast_2d(pcm)
        cfg = EncoderConfig(sample_rate_hz=rate, **cfg_kwargs)
        return encode(pcm, cfg)

    audio_s = sum(max(np.atleast_2d(p).shape) / r for p, r in clips)
    t0 = time.perf_counter()
    if workers > 1 and len(clips) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as ex:
            outputs = list(ex.map(one, clips))
    else:
        outputs = [one(c) for c in clips]
    wall = time.perf_counter() - t0
    return outputs, dict(clips=len(clips), audio_s=audio_s, wall_s=wall,
                         x_realtime=audio_s / wall if wall else 0.0)
