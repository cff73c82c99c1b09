"""Pallas bit-count kernel vs the XLA reference path, bit-exact.

The kernel (ops/pallas_bits.py) computes integer histogram sums, so on
ANY backend its outputs must equal jaxloop's XLA formulation exactly.
Runs the kernel in interpret mode (no TPU needed).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mp3tpu.ops import jaxloop, pallas_bits
from mp3tpu.tables import mpeg


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hist_c1_matches_xla(seed):
    rng = np.random.RandomState(seed)
    G = 32
    # mix of magnitudes: silent, tiny, mid, ESC-range, out-of-range
    scale = rng.choice([0.0, 1.5, 8.0, 40.0, 600.0, 9000.0], size=(G, 1))
    ix = np.abs(rng.randn(G, 576) * scale).astype(np.int32)
    # trailing zeros / count1 tails
    for g in range(G):
        cut = rng.randint(0, 577)
        ix[g, cut:] = 0
        tail = rng.randint(0, cut + 1)
        ix[g, tail:cut] = rng.randint(0, 2, size=cut - tail)
    is_short = rng.rand(G) < 0.3
    wsf = is_short | (rng.rand(G) < 0.1)
    block_type = np.where(is_short, 2, np.where(wsf, 1, 0))

    ST = jaxloop._static(mpeg.MPEG1, 0)
    ixj = jnp.asarray(ix)
    short = jnp.asarray(is_short)
    wsfj = jnp.asarray(wsf)

    # inputs the kernel shares with the XLA path
    count1, big_values = jaxloop.calc_runlen(ixj, short)
    r0, r1, a1, a2 = jaxloop.subdivide(big_values, short, wsfj, ST)

    bt_ref, mx_ref = jaxloop._region_table_bits(
        ixj, a1, a2, 2 * big_values, short, ST["r0_pairs_short"])
    c1_ref, sel_ref = jaxloop._count1_bits(ixj, big_values, count1)

    bt_k, mx_k, b0raw, signs = pallas_bits.hist_c1(
        ixj, a1, a2, big_values, count1, short, ST, tg=8, interpret=True)
    b0 = b0raw + signs
    b1 = 4 * count1 + signs
    sel_k = np.where(np.asarray(b0) < np.asarray(b1), 0, 1)
    c1_k = np.where(sel_k == 0, np.asarray(b0), np.asarray(b1))

    np.testing.assert_array_equal(np.asarray(bt_ref, np.int64),
                                  np.asarray(bt_k, np.int64))
    np.testing.assert_array_equal(np.asarray(mx_ref), np.asarray(mx_k))
    np.testing.assert_array_equal(np.asarray(c1_ref, np.int64), c1_k)
    np.testing.assert_array_equal(np.asarray(sel_ref), sel_k)
