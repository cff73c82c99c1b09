"""Device reservoir scan == native C scan, exactly (under x64)."""
import numpy as np

import jax.numpy as jnp

from mp3tpu.ops import jaxresv
from mp3tpu.runtime.bitstream import resv_scan


def _case(seed, nframes, nch, mode_gr, mean_bits, resv_max, delta,
          size0=0):
    rng = np.random.RandomState(seed)
    G = nframes * mode_gr
    pe = (rng.uniform(0, 3000, (nch, G))).astype(np.float32)
    demand = rng.randint(0, 4096, (nch, G)).astype(np.int64)

    if size0 == 0:
        native = resv_scan(pe.astype(np.float64), demand, None, None,
                           nframes, nch, mean_bits, resv_max, mode_gr,
                           delta=delta)
        nsize = None
    else:
        native, nsize = resv_scan(pe.astype(np.float64), demand, None,
                                  None, nframes, nch, mean_bits,
                                  resv_max, mode_gr, delta=delta,
                                  size=size0)

    pe_g = jaxresv.granule_major(jnp.asarray(pe), nch, mode_gr)
    dm_g = jaxresv.granule_major(jnp.asarray(demand), nch, mode_gr)
    bud, size_out = jaxresv.scan_budgets(
        pe_g, dm_g, size0, mean_bits, resv_max, mode_gr, nch, delta)
    dev = np.asarray(jaxresv.from_granule_major(bud, nch, mode_gr),
                     np.int64)
    np.testing.assert_array_equal(native, dev)
    if nsize is not None:
        assert int(size_out) == nsize


def test_matches_native_stereo():
    _case(0, 200, 2, 2, 3080, 4088, 28)


def test_matches_native_mono():
    _case(1, 150, 1, 2, 1460, 4088, 28)


def test_matches_native_lsf():
    _case(2, 120, 1, 1, 1100, 2040, 28)


def test_matches_native_no_delta_and_carry():
    _case(3, 100, 2, 2, 3080, 4088, 0)
    _case(4, 100, 2, 2, 3081, 4088, 12, size0=1024)


def test_matches_native_zero_resv():
    _case(5, 50, 2, 2, 3080, 0, 28)
