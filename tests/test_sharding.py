"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from mp3tpu.models import layer3
from mp3tpu.parallel import sharding


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_matches_chunked_single_device():
    """The sharded encode must agree with a single-device run that
    feeds the same 8-granule chunks with explicit halos (the exact
    computation each shard performs, with ppermute replaced by host
    slicing).  This isolates the halo-exchange logic from float32
    batch-shape jitter: shapes match, so any disagreement beyond XLA's
    shard_map-vs-jit fusion noise is a sharding bug."""
    n = 8
    per = 8
    G = per * n
    # low-level stationary signal: no attacks -> FSM stays NORM
    tt = np.arange(G * 576) / 44100.0
    x = (1500 * np.sin(2 * np.pi * 200.0 * tt)).astype(np.float32)
    blocks = x.reshape(G, 576)
    budget = np.full(G, 900.0, np.float32)

    ix_chunks, p23_chunks = [], []
    for s in range(n):
        halo = (np.zeros((2, 576), np.float32) if s == 0
                else blocks[per * s - 2: per * s])
        ana = layer3.analyze_granules(blocks[per * s: per * s + per], halo,
                                      1, 0, 44100.0)
        enc = layer3.encode_granules(
            ana["xr"], ana["ratio_l"], ana["ratio_s"], ana["block_type"],
            budget[per * s: per * s + per], 1, 0)
        ix_chunks.append(np.asarray(enc["ix"]))
        p23_chunks.append(np.asarray(enc["part2_3_length"]))
    ix_ref = np.concatenate(ix_chunks)
    p23_ref = np.concatenate(p23_chunks)

    mesh = sharding.make_mesh(devices=jax.devices()[:n])
    out = sharding.encode_sharded(mesh, blocks, budget, 1, 0, 44100.0)
    ix_sh = np.asarray(out["ix"])
    p23_sh = np.asarray(out["part2_3_length"])

    # shard_map and jit may fuse float32 reductions differently; the
    # residual jitter (~4e-9 in xr) can flip nint() on coefficients at
    # the noise floor, so allow a tiny mismatch budget -- but any sign
    # error or search divergence would blow well past it
    coef_match = (ix_ref == ix_sh).mean()
    assert coef_match > 0.999, coef_match
    mism = ix_ref != ix_sh
    assert np.abs(ix_ref[mism] - ix_sh[mism]).max(initial=0) <= 1
    assert np.abs(p23_ref.astype(np.int64) - p23_sh).max() <= 16
