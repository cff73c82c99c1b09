"""Layer III granule-batch encoder: the jitted TPU compute graph.

One call processes a batch of granules for one channel through
psy -> filterbank -> MDCT -> rate loop, entirely on device.  The
sequential reference structures become:

  - cross-frame DSP/psy state: halo inputs (512 samples + previous
    granule's subbands + 2 psy blocks), so shards compose with a
    ppermute halo exchange (mp3tpu/parallel);
  - the bit reservoir: granules are first encoded *unconstrained*
    (budget 4095) to reveal their bit demand; the exact reservoir
    policy then runs as a cheap scalar scan on the host, and only
    budget-limited granules are re-encoded at their precise budget
    (mp3tpu/encoder.py).  One fix-up round yields a valid CBR stream
    because repair only ever returns bits to the reservoir.

Production-mode quality deviations from the reference (all strictly
better; the byte-exact replica lives in mp3tpu/numpy_ref):
  - true quantization range handling instead of the saturating
    pow_nint table (see tests/golden/ref_snr.json for the damage);
  - psychoacoustic outputs are used for the granule they were computed
    on (the reference pairs each granule with the previous analysis
    window, l3psy.c:452-456);
  - no scfsi (a small rate optimization, rarely active in the
    reference due to loop.c:676's integer truncations).
"""
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import jaxdsp, jaxloop, jaxpsy
from ..tables import mpeg


@partial(jax.jit, static_argnames=("version", "sampling_frequency", "sfreq_hz"))
def analyze_granules(blocks, halo_samples, version, sampling_frequency,
                     sfreq_hz):
    """Psy + DSP for one channel batch.

    blocks: (G, 576) int16-valued floats.
    halo_samples: (2, 576) preceding blocks (zeros at stream start).
    Returns dict with xr (G, 576), psy outputs, block_type.
    """
    psy = jaxpsy.psycho_granules(blocks, halo_samples, sfreq_hz)
    scaled = blocks / 32768.0
    halo_scaled = halo_samples / 32768.0
    sb = jaxdsp.subband_granules(scaled, halo_scaled[1, 64:])
    # previous granule's subbands for MDCT overlap come from the halo:
    sb_prev = jaxdsp.subband_granules(
        halo_scaled[1][None], halo_scaled[0, 64:])[0]
    xr = jaxdsp.mdct_granules(sb, sb_prev, psy["block_type"])
    return dict(xr=xr, pe=psy["pe"], ratio_l=psy["ratio_l"],
                ratio_s=psy["ratio_s"], block_type=psy["block_type"])


@partial(jax.jit, static_argnames=("version", "sampling_frequency"))
def encode_granules(xr, ratio_l, ratio_s, block_type, budget, version,
                    sampling_frequency):
    """Rate loop for a granule batch at given budgets (bits)."""
    ST = jaxloop._static(version, sampling_frequency)
    is_short_block = block_type != mpeg.NORM_TYPE
    out = jaxloop.outer_loop(xr, budget, ratio_l, ratio_s,
                             is_short_block, block_type, ST)
    out["ix"] = jnp.where((xr < 0) & (out["ix"] > 0), -out["ix"], out["ix"])
    return out


@partial(jax.jit, static_argnames=("version", "sampling_frequency"),
         donate_argnames=("state",))
def encode_update(state, xr, ratio_l, ratio_s, block_type, idx, budget,
                  version, sampling_frequency):
    """Re-encode the granules at ``idx`` (device-side gather) and
    scatter the results into the device-resident state dict.  Keeps all
    large arrays on device; only scalars cross the host link."""
    ST = jaxloop._static(version, sampling_frequency)
    xr_g = xr[idx]
    bt_g = block_type[idx]
    out = jaxloop.outer_loop(xr_g, budget, ratio_l[idx], ratio_s[idx],
                             bt_g != mpeg.NORM_TYPE, bt_g, ST)
    out["ix"] = jnp.where((xr_g < 0) & (out["ix"] > 0), -out["ix"], out["ix"])
    new_state = {k: state[k].at[idx].set(out[k]) for k in state}
    return new_state, out["part2_3_length"]
