"""Multi-chip Layer III clip -> MP3 bytes over a device mesh.

The reference's whole job is a strictly sequential per-frame loop
(/root/reference/src/musicin.c:585-800).  Here the clip becomes a grid
of fixed-size granule CHUNKS (the same unit as the single-chip chunked
path, mp3tpu/encoder.py) laid out contiguously over the mesh axis
"frames": every device analyzes and encodes its own chunks with no
neighbor traffic at all -- the reference's carried DSP/psy state S1-S3
(SURVEY.md section 2.3) is satisfied by 4 preceding PCM blocks per
chunk, which are sliced from the input on the host, and the only
genuinely sequential pieces are

  - the block-type FSM (l3psy.c:647-733): each chunk's 4-entry
    transition map is all_gather'ed over ICI and every device composes
    the global prefix locally (ops/jaxpsy.fsm_maps), so emitted block
    types are IDENTICAL to the sequential scan;
  - the bit reservoir (reservoir.c:101-134): a scalar scan over
    (pe, demand) pairs, run natively on the host between the demand
    and final passes, exactly as in the single-chip path.

Outputs come back as sharded arrays; the host gathers only the
entropy-coded payload + side scalars and runs the same native
assembler as the single-chip path.
"""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models import layer3
from ..ops import jaxbits, jaxdsp, jaxloop, jaxpsy
from ..runtime import profiling
from ..tables import mpeg
from .sharding import make_mesh


def _psy_one(ext, halo2, sfreq_hz):
    return jaxpsy.psycho_granules(ext, halo2, sfreq_hz, warmup=2)


def _chunk_xr(bl_f32, h4, block_type, nch):
    """MDCT spectra for one chunk: (nch, C, 576) -> (nch*C, 576)."""
    xs = []
    for ch in range(nch):
        scaled = jnp.concatenate([h4[ch, 2:], bl_f32[ch]], axis=0) / 32768.0
        sb = jaxdsp.subband_granules(scaled[2:], scaled[1, 64:])
        sb_prev = jaxdsp.subband_granules(scaled[1][None],
                                          scaled[0, 64:])[0]
        xs.append(jaxdsp.mdct_granules(sb, sb_prev, block_type[ch]))
    return jnp.concatenate(xs)


@lru_cache(maxsize=None)
def _build_programs(mesh, nch, C, version, sampling_frequency, sfreq_hz,
                    payload_words):
    """Compile the two sharded programs for one (mesh, shape) combo."""
    ST = jaxloop._static(version, sampling_frequency)
    lsf = bool(ST["lsf"])
    spec = P("frames")

    def analyze_fn(blocks_l, halo4_l):
        """Per-device body: (Kl, nch, C, 576) int16 chunks + their
        (Kl, nch, 4, 576) halos -> psy/xr/demand, FSM-exact."""
        Kl = blocks_l.shape[0]
        bl_f32 = blocks_l.astype(jnp.float32)

        def chunk_psy(bl, h4):
            outs = []
            for ch in range(nch):
                ext = jnp.concatenate([h4[ch, 2:], bl[ch]], axis=0)
                outs.append(_psy_one(ext, h4[ch, :2], sfreq_hz))
            return {k: jnp.stack([o[k] for o in outs])
                    for k in ("pe", "ratio_l", "ratio_s", "attack")}

        psy = jax.vmap(chunk_psy)(bl_f32, halo4_l)

        # ---- global block-type FSM: compose each chunk's transition
        # map, all_gather the tiny (Kl, nch, 4) maps over ICI, compose
        # the global prefix on every device, and emit with the exact
        # sequential init state.
        def chunk_map(a):
            return jax.lax.associative_scan(
                jaxpsy.fsm_compose, jaxpsy.fsm_maps(a), axis=0)[-1]

        maps = jax.vmap(jax.vmap(chunk_map))(psy["attack"])  # (Kl,nch,4)
        gathered = jax.lax.all_gather(maps, "frames")        # (D,Kl,nch,4)
        D = gathered.shape[0]
        allmaps = gathered.reshape(D * Kl, nch, 4)
        pref = jax.lax.associative_scan(jaxpsy.fsm_compose, allmaps,
                                        axis=0)
        inits = jnp.concatenate(
            [jnp.zeros((1, nch), jnp.int32), pref[:-1, :, 0]])
        mine = jax.lax.axis_index("frames") * Kl + jnp.arange(Kl)
        init_l = inits[mine]                                  # (Kl, nch)

        def chunk_bt(a, i):
            return jaxpsy._fsm_blocktype(a, i)[0]

        bt = jax.vmap(jax.vmap(chunk_bt))(psy["attack"], init_l)

        xr = jax.vmap(lambda b, h, t: _chunk_xr(b, h, t, nch))(
            bl_f32, halo4_l, bt)                     # (Kl, nch*C, 576)

        # ---- unconstrained demand encode (budget 4095)
        N = Kl * nch * C
        rl = psy["ratio_l"].reshape(N, -1)
        rs = psy["ratio_s"].reshape(N, 12, 3)
        btf = bt.reshape(N)
        demand_budget = jnp.full(N, 4095.0, jnp.float32)
        if hasattr(jax.lax, "pcast"):
            demand_budget = jax.lax.pcast(demand_budget, "frames",
                                          to="varying")
        else:  # pre-pcast JAX: pvary (deprecated alias)
            demand_budget = jax.lax.pvary(demand_budget, "frames")
        out = jaxloop.outer_loop(
            xr.reshape(N, 576), demand_budget, rl, rs,
            btf != mpeg.NORM_TYPE, btf, ST)
        res = dict(xr=xr, ratio_l=psy["ratio_l"], ratio_s=psy["ratio_s"],
                   block_type=bt, pe=psy["pe"],
                   p23=out["part2_3_length"].reshape(Kl, nch, C))
        if not lsf:
            # scfsi flags per chunk (pairs never straddle chunks: C
            # even) + demand granule-0 scalefactors for pair fixing
            xr4 = xr.reshape(Kl, nch, C, 576)
            res["scfsi"] = jax.vmap(jax.vmap(
                lambda x, rl, rs, b:
                layer3._scfsi_flags(x, rl, rs, b, ST)))(
                xr4, psy["ratio_l"], psy["ratio_s"], bt)  # (Kl,nch,C/2,4)
            sf_d = out["sf_l"].astype(jnp.int32).reshape(Kl, nch, C, 21)
            res["sf_fix"] = sf_d[:, :, 0::2]
        return res

    ana_out = dict(xr=spec, ratio_l=spec, ratio_s=spec,
                   block_type=spec, pe=spec, p23=spec)
    if not lsf:
        ana_out.update(scfsi=spec, sf_fix=spec)
    analyze = jax.jit(jax.shard_map(
        analyze_fn, mesh=mesh, in_specs=(spec, spec), out_specs=ana_out))

    def final_fn(xr_l, rl_l, rs_l, bt_l, budget_l, scfsi_l=None,
                 sf_fix_l=None):
        """(Kl, ...) sharded chunks -> final coding state + payload,
        with the same one-batch scfsi coupling as the single-chip
        encode_final (pairs fixed to their demand scalefactors);
        MPEG-2 LSF has no scfsi (reservoir.c:53-62 frame layout)."""
        Kl = bt_l.shape[0]
        N = Kl * nch * C
        bt = bt_l.reshape(N)
        mask = vals = skipm = None
        if scfsi_l is not None:
            band = scfsi_l.reshape(Kl * nch, C // 2, 4).astype(bool)[
                :, :, layer3._BAND_OF_SFB]
            mask = jnp.repeat(band, 2, axis=1).reshape(N, 21)
            vals = jnp.repeat(sf_fix_l.reshape(Kl * nch, C // 2, 21), 2,
                              axis=1).reshape(N, 21)
            odd = (jnp.arange(C) % 2 == 1)
            skipm = mask & jnp.tile(odd, (Kl * nch,))[:, None]

        xr = xr_l.reshape(N, 576)
        out = jaxloop.outer_loop(
            xr, budget_l.reshape(N), rl_l.reshape(N, 21),
            rs_l.reshape(N, 12, 3), bt != mpeg.NORM_TYPE, bt, ST,
            sf_fix_mask=mask, sf_fix_val=vals, sf_skip_mask=skipm)
        ix_signed = jnp.where((xr < 0) & (out["ix"] > 0),
                              -out["ix"], out["ix"])
        payload, _ = jaxbits.granule_payload(
            out, ix_signed, (bt == 2), ST, payload_words,
            skip_mask=skipm)
        side = layer3.pack_state(out, bt)
        return dict(side=side.reshape(Kl, nch, C, 19),
                    payload=payload.reshape(Kl, nch, C, -1))

    n_in = 5 if lsf else 7
    final = jax.jit(jax.shard_map(
        final_fn, mesh=mesh, in_specs=(spec,) * n_in,
        out_specs=dict(side=spec, payload=spec)))
    return analyze, final


def encode_layer3_sharded(pcm, cfg, mesh=None, chunk=None, prof=None):
    """Encode int16 PCM to MP3 bytes on an N-device mesh.

    Semantics match encode_layer3_fast (same psy/rate-loop policy, same
    reservoir scan, same assembler); the chunk grid is padded so every
    device carries the same number of chunks.
    """
    import os

    from ..encoder import _chunk_size, _marshal_and_assemble

    prof = prof if prof is not None else profiling.from_env()
    cfg.finalize()
    assert cfg.layer == 3
    mesh = mesh if mesh is not None else make_mesh()
    D = int(np.prod(mesh.devices.shape))

    pcm = np.atleast_2d(np.asarray(pcm, np.float32))
    if pcm.shape[0] > pcm.shape[1]:
        pcm = pcm.T
    nch = cfg.nchannels
    assert pcm.shape[0] == nch
    spf = cfg.samples_per_frame
    mode_gr = cfg.mode_gr
    nframes = int(np.ceil(pcm.shape[1] / spf))
    pcm = np.pad(pcm, ((0, 0), (0, nframes * spf - pcm.shape[1])))
    G = nframes * mode_gr
    sfreq_hz = float(
        mpeg.S_FREQ_KHZ[cfg.version][cfg.sampling_frequency]) * 1000.0
    sfb_s = mpeg.sfb_short(cfg.version, cfg.sampling_frequency)

    C = chunk or _chunk_size((G + D - 1) // D)
    K = -(-G // C)
    K = -(-K // D) * D                   # pad to a full chunk per device
    Gp = K * C
    flat = np.zeros((nch, Gp, 576), np.int16)
    flat[:, :G] = pcm.astype(np.int16).reshape(nch, G, 576)
    blocks = np.ascontiguousarray(
        flat.reshape(nch, K, C, 576).transpose(1, 0, 2, 3))
    halo4 = np.zeros((K, nch, 4, 576), np.float32)
    for k in range(1, K):
        halo4[k] = flat[:, k * C - 4: k * C].astype(np.float32)

    # payload width: the full row on the mesh path (ICI, not the
    # single-chip host tunnel, carries the gather; no bucketing needed)
    pw = jaxbits.PAYLOAD_WORDS
    analyze, final = _build_programs(
        mesh, nch, C, cfg.version, cfg.sampling_frequency, sfreq_hz, pw)

    with prof.stage("sharded analyze+demand"):
        ana = analyze(blocks, halo4)
        small = jax.device_get({"pe": ana["pe"], "p23": ana["p23"],
                                "scfsi": ana.get("scfsi")})
    if mode_gr == 2:
        # (K, nch, C//2, 4) -> per-frame flags (nch, F, 4)
        scfsi_frames = np.asarray(small["scfsi"]) \
            .transpose(1, 0, 2, 3).reshape(nch, Gp // 2, 4)[:, :G // 2]
    else:
        scfsi_frames = np.zeros((nch, nframes, 4), np.int32)

    def to_grid(x):                   # (K, nch, C, ...) -> (nch, G, ...)
        x = np.asarray(x)
        x = x.transpose((1, 0, 2) + tuple(range(3, x.ndim)))
        return x.reshape((nch, Gp) + x.shape[3:])[:, :G]

    pe = to_grid(small["pe"]).astype(np.float64)
    demand = to_grid(small["p23"]).astype(np.int64)

    whole_spf, _ = cfg.slots_per_frame()
    bits_per_frame = 8 * whole_spf
    sideinfo_len = mpeg.sideinfo_bits(cfg.version, nch,
                                      cfg.error_protection)
    mean_bits = (bits_per_frame - sideinfo_len) // mode_gr
    resv_limit = 4088 if mode_gr == 2 else 2040
    resv_max = min(max(0, 7680 - bits_per_frame), resv_limit)

    # same policy as the single-chip path (mp3tpu/encoder.py): slack-
    # compensated first scan, relax loop as a safety net
    from ..runtime.bitstream import resv_guard, resv_scan
    delta = int(os.environ.get("MP3TPU_RELAX_DELTA", "28"))
    target = np.minimum(
        demand, resv_scan(pe, demand, None, None, nframes, nch,
                          mean_bits, resv_max, mode_gr, delta=delta))

    def run_final(target, label):
        budget = np.full((nch, Gp), 4095.0, np.float32)
        budget[:, :G] = np.where(target < demand, target, 4095)
        budget = np.ascontiguousarray(
            budget.reshape(nch, K, C).transpose(1, 0, 2))
        args = (ana["xr"], ana["ratio_l"], ana["ratio_s"],
                ana["block_type"], budget)
        if mode_gr == 2:
            args = args + (ana["scfsi"], ana["sf_fix"])
        with prof.stage(label):
            host = jax.device_get(final(*args))
        payload = np.asarray(host["payload"]) \
            .transpose(1, 0, 2, 3).reshape(nch, Gp, -1)[:, :G]
        side = to_grid(host["side"])              # (nch, G, 19)
        return side, payload

    side, payload = run_final(target, "sharded final encode")
    p23 = side[:, :, 0].astype(np.int64)
    for _retry in range(4):
        bad, limits = resv_guard(p23, nframes, nch, mean_bits, resv_max,
                                 mode_gr)
        if not bad:
            break
        if _retry == 3:
            raise RuntimeError(
                "reservoir guard failed on a guaranteed-feasible clamp")
        from ..runtime.bitstream import guard_clamp
        target = guard_clamp(target, limits, _retry, mean_bits, nch)
        side, payload = run_final(target, "sharded final retry")
        p23 = side[:, :, 0].astype(np.int64)

    return _marshal_and_assemble(cfg, side, payload, nframes,
                                 bits_per_frame, mean_bits, resv_max,
                                 sfb_s, prof, scfsi=scfsi_frames)
