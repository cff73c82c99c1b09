"""Pallas TPU kernel for the rate loop's Huffman bit-count histogram.

The stepsize searches evaluate bits(qss) dozens of times per granule
batch.  In pure XLA each evaluation materializes a (G, 288, 256) int8
pair-class one-hot in HBM (~680 MB at G=8192) before the histogram
matmul -- ~2 ms of pure bandwidth per evaluation.  This kernel builds
the one-hot in VMEM and contracts it on the MXU, so HBM sees only the
quantized pair metadata in (~30 MB) and two small result rows out.

The split keeps bit-exactness trivially: quantization, run-length,
region subdivision and table choice stay in XLA (identical code on
every backend); the kernel only computes exact integer sums --
  bits_tab[g, r, t] = sum over pairs p in region r of
                      pair_bits[t, pidx(g, p)]
  mx[g, r]          = max pair component value per region
  c1raw[g], c1sign[g] = count1-region quad bits (table A) and signs
-- so its results are the same integers the XLA reference path
(jaxloop._region_table_bits / _count1_bits) produces, verified by
tests/test_pallas_bits.py in interpret mode and cross-checked against
the XLA program on hardware.

Kernel shape discipline (Mosaic): no in-kernel reshapes or transposes.
XLA prepares per-pair metadata flattened to (G*144, 8) -- pair slot j
of granule g covers even pair 2j and odd pair 2j+1 -- and the kernel
builds both matmul operands by broadcasting those COLUMNS along lanes:
  one-hot  oh[i, c]    = (pidx[i] == c)                 (R, 256) int8
  selector selT[i, gr] = (i//144 == gr//3)
                         & (region[i] == gr%3) & valid[i]  (R, 3*TG)
  hist = selT^T @ oh   -- the per-(granule, region) segment reduction
                          IS the matmul          (3*TG, 256) int32
  bits = hist @ pair_bits^T                       (3*TG, 32)
The count1-region quad bits use the four phase planes (G, 144) -- line
4j+k in plane k -- where the realignment roll (jaxloop._count1_bits)
becomes a phase shuffle plus one lane roll; per-region maxima are 2D
masked lane reductions over the same planes.

Matches the reference's count_bit/bigv_bitcount/count1_bitcount
(loop.c:1954, :1531) in vectorized integer form.
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables.huffman import HUFF

_PBT = np.ascontiguousarray(HUFF.pair_bits.astype(np.int8).T)  # (256, 32)
_C1H0 = HUFF.hlen[32, 0, :16].astype(np.int32)                 # table A


def backend_ok():
    """Opt-in (MP3TPU_PALLAS=1) and only on a real TPU backend.

    Measured on TPU v5e: the kernel is bit-exact but ~7 ms/eval at
    G=8192 -- its one-hot/selector generation is VPU-bound -- while
    the factorized XLA histogram (jaxloop._region_table_bits) runs the
    same evaluation in ~0.9 ms.  The kernel is kept as a verified
    alternative implementation, not the production default."""
    import os
    if not os.environ.get("MP3TPU_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


def _kernel(pm_ref, p0_ref, p1_ref, p2_ref, p3_ref, meta_ref, pbt_ref,
            bits_ref, aux_ref, *, r0_pairs_short, interpret):
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    pm = pm_ref[:]                    # (R, 8): pidx_e/o reg_e/o val_e/o
    R = pm.shape[0]
    TG = R // 144
    p = [r[:] for r in (p0_ref, p1_ref, p2_ref, p3_ref)]  # (TG, 144) i32
    a1 = meta_ref[:, 0:1]
    a2 = meta_ref[:, 1:2]
    bvr = meta_ref[:, 2:3]
    start = meta_ref[:, 3:4]          # 2 * big_values
    count1 = meta_ref[:, 4:5]
    fshort = meta_ref[:, 5:6]         # 1 if short block
    jidx = jax.lax.broadcasted_iota(jnp.int32, (TG, 144), 1)
    short = fshort == 1

    # ---- per-(granule, region) histogram as two MXU matmuls
    rows_g = jax.lax.broadcasted_iota(jnp.int32, (R, 3 * TG), 0) // 144
    sel_g = jax.lax.broadcasted_iota(jnp.int32, (R, 3 * TG), 1) // 3
    sel_r = jax.lax.broadcasted_iota(jnp.int32, (R, 3 * TG), 1) % 3
    ci = jax.lax.broadcasted_iota(jnp.int32, (R, 256), 1)

    def hist(pidx_col, reg_col, val_col):
        oh = (pidx_col == ci).astype(jnp.int8)            # (R, 256)
        selT = ((rows_g == sel_g) & (reg_col == sel_r)
                & (val_col != 0)).astype(jnp.int8)        # (R, 3TG)
        return jax.lax.dot_general(
            selT, oh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (3TG, 256)

    h = (hist(pm[:, 0:1], pm[:, 2:3], pm[:, 4:5])
         + hist(pm[:, 1:2], pm[:, 3:4], pm[:, 5:6])).astype(jnp.float32)
    # counts <= 288 and costs <= 45: products/sums exact in f32
    bits = jax.lax.dot_general(
        h, pbt_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)               # (3TG, 32)
    bits_ref[:] = bits.astype(jnp.int32)

    # ---- per-region max pair component (2D masked lane reductions)
    def regions(pairidx):
        pos2 = 2 * pairidx
        long_r = jnp.where(pos2 < a1, 0, jnp.where(pos2 < a2, 1, 2))
        short_r = jnp.where(pairidx < r0_pairs_short, 0, 1)
        r = jnp.where(short, short_r, long_r)
        valid = short | (pos2 < bvr)      # short blocks: every pair
        return r, valid

    reg_e, val_e = regions(2 * jidx)
    reg_o, val_o = regions(2 * jidx + 1)
    pmax_e = jnp.maximum(p[0], p[1])
    pmax_o = jnp.maximum(p[2], p[3])
    mxs = []
    for r in range(3):
        m_e = (reg_e == r) & val_e
        m_o = (reg_o == r) & val_o
        mxs.append(jnp.maximum(
            jnp.max(jnp.where(m_e, pmax_e, 0), axis=1, keepdims=True),
            jnp.max(jnp.where(m_o, pmax_o, 0), axis=1, keepdims=True)))

    # ---- count1 region: realign quads to static positions (the roll
    # trick of jaxloop._count1_bits as a phase shuffle + lane roll)
    mis = (start % 4) != 0

    def roll1(x):
        if interpret:
            return jnp.roll(x, -1, axis=1)
        return pltpu.roll(x, x.shape[1] - 1, 1)   # roll by -1 (shift>=0)

    q0 = jnp.where(mis, p[2], p[0])
    q1 = jnp.where(mis, p[3], p[1])
    q2 = jnp.where(mis, roll1(p[0]), p[2])
    q3 = jnp.where(mis, roll1(p[1]), p[3])
    start_al = jnp.where(mis, start - 2, start)
    a0c = jnp.minimum(q0, 1)
    a1c = jnp.minimum(q1, 1)
    a2c = jnp.minimum(q2, 1)
    a3c = jnp.minimum(q3, 1)
    # conformant quad index, v (first sample) at bit 3 -- matches
    # jaxloop._count1_bits (see the conformance note there)
    p16 = 8 * a0c + 4 * a1c + 2 * a2c + a3c
    hl0 = jnp.zeros((TG, 144), jnp.int32)
    for c in range(16):
        hl0 = hl0 + jnp.where(p16 == c, int(_C1H0[c]), 0)
    q4 = 4 * jidx
    inr = (q4 >= start_al) & (q4 < start_al + 4 * count1)
    b0raw = jnp.sum(jnp.where(inr, hl0, 0), axis=1, keepdims=True)
    signs = jnp.sum(jnp.where(inr, a0c + a1c + a2c + a3c, 0), axis=1,
                    keepdims=True)

    aux_ref[:] = jnp.concatenate(
        mxs + [b0raw, signs, jnp.zeros((TG, 3), jnp.int32)], axis=1)


@lru_cache(maxsize=None)
def _build(r0_pairs_short, tg, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_kernel, r0_pairs_short=r0_pairs_short,
                   interpret=interpret)

    def call(pairmeta, p0, p1, p2, p3, meta, pbt):
        G = p0.shape[0]
        grid = (G // tg,)
        bs = lambda w: pl.BlockSpec((tg, w), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
        pm_spec = pl.BlockSpec((tg * 144, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        pbt_spec = pl.BlockSpec((256, 32), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        bits_spec = pl.BlockSpec((3 * tg, 32), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pm_spec] + [bs(144)] * 4 + [bs(8), pbt_spec],
            out_specs=[bits_spec, bs(8)],
            out_shape=[jax.ShapeDtypeStruct((3 * G, 32), jnp.int32),
                       jax.ShapeDtypeStruct((G, 8), jnp.int32)],
            interpret=interpret,
        )(pairmeta, p0, p1, p2, p3, meta, pbt)

    return call


def hist_c1(ixp, a1, a2, big_values, count1, is_short, ST, tg=16,
            interpret=False):
    """Histogram bit totals + count1 bits for a PERMUTED quantized
    batch ixp (G, 576) int32.

    Returns (bits_tab (G, 3, 32) f32, mx (G, 3) i32,
             c1_b0raw (G,) i32, c1_signs (G,) i32) -- exactly the
    integers of jaxloop's XLA reference path."""
    G = ixp.shape[0]
    assert G % tg == 0, (G, tg)
    ph = ixp.reshape(G, 144, 4)

    # flat (G*144, 8) per-pair metadata (XLA-side reshapes are free):
    # pidx/region/valid for the even (2j) and odd (2j+1) pair of slot j
    xc = jnp.minimum(ph, 15)
    pidx_e = xc[:, :, 0] * 16 + xc[:, :, 1]
    pidx_o = xc[:, :, 2] * 16 + xc[:, :, 3]
    j = jnp.arange(144)[None, :]
    a1c = a1.astype(jnp.int32)[:, None]
    a2c = a2.astype(jnp.int32)[:, None]
    bvrc = (2 * big_values.astype(jnp.int32))[:, None]
    shortc = is_short[:, None]

    def reg_val(pairidx):
        pos2 = 2 * pairidx
        long_r = jnp.where(pos2 < a1c, 0, jnp.where(pos2 < a2c, 1, 2))
        short_r = jnp.where(pairidx < int(ST["r0_pairs_short"]), 0, 1)
        r = jnp.where(shortc, short_r, long_r)
        v = shortc | (pos2 < bvrc)
        return r, v.astype(jnp.int32)

    reg_e, val_e = reg_val(2 * j)
    reg_o, val_o = reg_val(2 * j + 1)
    z = jnp.zeros_like(pidx_e)
    pairmeta = jnp.stack(
        [pidx_e, pidx_o, reg_e, reg_o, val_e, val_o, z, z],
        axis=2).reshape(G * 144, 8)

    meta = jnp.stack(
        [a1.astype(jnp.int32), a2.astype(jnp.int32),
         2 * big_values.astype(jnp.int32),
         2 * big_values.astype(jnp.int32),
         count1.astype(jnp.int32), is_short.astype(jnp.int32),
         jnp.zeros(G, jnp.int32), jnp.zeros(G, jnp.int32)], axis=1)
    call = _build(int(ST["r0_pairs_short"]), tg, interpret)
    bits, aux = call(pairmeta, ph[:, :, 0], ph[:, :, 1], ph[:, :, 2],
                     ph[:, :, 3], meta, jnp.asarray(_PBT))
    bits_tab = bits.reshape(G, 3, 32).astype(jnp.float32)
    return bits_tab, aux[:, 0:3], aux[:, 3], aux[:, 4]
