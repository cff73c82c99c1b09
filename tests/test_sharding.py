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
def test_sharded_matches_single_device_interior():
    """Sharded encode must agree with the single-device pipeline for
    all granules whose halos do not cross the stream start; block-type
    FSM state at shard boundaries may differ by design (valid streams
    either way), so compare a granule range away from FSM attacks."""
    n = 8
    G = 8 * n
    rng = np.random.RandomState(7)
    # low-level stationary signal: no attacks -> FSM stays NORM and the
    # sharded result must match exactly
    tt = np.arange(G * 576) / 44100.0
    x = (1500 * np.sin(2 * np.pi * 200.0 * tt)).astype(np.float32)
    blocks = x.reshape(G, 576)
    budget = np.full(G, 900.0, np.float32)

    ana = layer3.analyze_granules(blocks, np.zeros((2, 576), np.float32),
                                  1, 0, 44100.0)
    ref = layer3.encode_granules(ana["xr"], ana["ratio_l"], ana["ratio_s"],
                                 ana["block_type"], budget, 1, 0)

    mesh = sharding.make_mesh(devices=jax.devices()[:n])
    out = sharding.encode_sharded(mesh, blocks, budget, 1, 0, 44100.0)

    ix_ref = np.asarray(ref["ix"])
    ix_sh = np.asarray(out["ix"])
    # identical away from shard-boundary psy halos: the pre-echo memory
    # nb_1/nb_2 reaches 2 granules and itself depends on the two-granule
    # unpredictability history, so the first 4 granules of a shard can
    # differ slightly
    per = G // n
    interior = np.ones(G, bool)
    for s in range(n):
        interior[s * per: s * per + 4] = False
    # float32 accumulation order differs between batch shapes, so xr
    # carries ~1e-9 jitter that occasionally flips a rounding decision;
    # require coefficient-level agreement, not bit-identity
    coef_match = (ix_ref[interior] == ix_sh[interior]).mean()
    assert coef_match > 0.999, coef_match
    p23_ref = np.asarray(ref["part2_3_length"])[interior]
    p23_sh = np.asarray(out["part2_3_length"])[interior]
    assert np.mean(np.abs(p23_ref - p23_sh) <= 64) > 0.9
