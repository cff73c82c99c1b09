"""High-level TPU encoder: fast mode (production path).

Pipeline per clip:
  1. device: analyze_granules per channel (psy + filterbank + MDCT);
  2. device: unconstrained encode (budget 4095) -> per-granule demand;
  3. host:   exact reservoir scan (reservoir.c policy) over scalars;
     granules whose demand exceeds their budget are re-encoded on
     device at the precise budget (one batched fix-up pass -- repairs
     only return bits to the reservoir, so a single round is valid);
  4. host:   stuffing planning + bitstream assembly (C++ fast path via
     mp3tpu.runtime.bitstream, Python fallback).

The exact byte-replica of the reference lives in mp3tpu.numpy_ref and
is used by tests; this path trades bit-identity for speed and fixes
the reference's quantizer saturation (better decoded SNR everywhere).
"""
import numpy as np

from .config import EncoderConfig
from .models import layer3
from .numpy_ref import bitstream as BS
from .numpy_ref.loop import GrInfo
from .numpy_ref.reservoir import Reservoir
from .tables import mpeg


def _to_gr_info(out, g, stuffed_p23):
    gi = GrInfo()
    gi.part2_3_length = int(stuffed_p23)
    gi.big_values = int(out["big_values"][g])
    gi.count1 = int(out["count1"][g])
    gi.global_gain = int(out["global_gain"][g])
    gi.scalefac_compress = int(out["compress"][g])
    gi.window_switching_flag = int(out["window_switching_flag"][g])
    gi.block_type = int(out["block_type"][g]) if gi.window_switching_flag else 0
    gi.table_select = [int(t) for t in out["table_select"][g]]
    gi.region0_count = int(out["r0"][g])
    gi.region1_count = int(out["r1"][g])
    gi.preflag = int(out["preflag"][g])
    gi.count1table_select = int(out["count1table_select"][g])
    gi.part2_length = int(out["part2"][g])
    gi.address1 = int(out["a1"][g])
    gi.address2 = int(out["a2"][g])
    gi.address3 = 2 * gi.big_values
    return gi


def _merge(dst, src, idx):
    for k in src:
        if k not in dst:
            continue
        arr = np.array(dst[k])
        arr[idx] = np.asarray(src[k])
        dst[k] = arr
    return dst


def encode_layer3_fast(pcm, cfg: EncoderConfig, device_outputs=None):
    """Encode int16 PCM to MP3 bytes via the TPU path."""
    cfg.finalize()
    assert cfg.layer == 3 and cfg.version == mpeg.MPEG1
    pcm = np.atleast_2d(np.asarray(pcm, np.float32))
    if pcm.shape[0] > pcm.shape[1]:
        pcm = pcm.T
    nch = cfg.nchannels
    assert pcm.shape[0] == nch
    spf = cfg.samples_per_frame
    nframes = int(np.ceil(pcm.shape[1] / spf))
    total = nframes * spf
    pcm = np.pad(pcm, ((0, 0), (0, total - pcm.shape[1])))
    G = nframes * 2
    sfreq_hz = float(mpeg.S_FREQ_KHZ[cfg.version][cfg.sampling_frequency]) * 1000.0
    sfb_s = mpeg.sfb_short(cfg.version, cfg.sampling_frequency)

    # ---- device: analysis + unconstrained (demand) encode
    if device_outputs is None:
        outs = []
        for ch in range(nch):
            blocks = pcm[ch].reshape(G, 576)
            ana = layer3.analyze_granules(
                blocks, np.zeros((2, 576), np.float32), cfg.version,
                cfg.sampling_frequency, sfreq_hz)
            enc = layer3.encode_granules(
                ana["xr"], ana["ratio_l"], ana["ratio_s"],
                ana["block_type"], np.full(G, 4095.0, np.float32),
                cfg.version, cfg.sampling_frequency)
            outs.append({**{k: np.asarray(v) for k, v in ana.items()},
                         **{k: np.asarray(v) for k, v in enc.items()}})
    else:
        outs = device_outputs

    # ---- host: exact reservoir scan + repair list
    whole_spf, _ = cfg.slots_per_frame()
    bits_per_frame = 8 * whole_spf
    sideinfo_len = mpeg.sideinfo_bits(cfg.version, nch, cfg.error_protection)
    mean_bits = (bits_per_frame - sideinfo_len) // 2

    resv = Reservoir()
    resv.max = 0
    budgets = np.zeros((nch, G), np.int64)
    p23 = np.stack([o["part2_3_length"].astype(np.int64) for o in outs])
    pe = np.stack([o["pe"] for o in outs])
    resv_limit = 4088
    resv.size = 0
    for f in range(nframes):
        resv.max = min(max(0, 7680 - bits_per_frame), resv_limit)
        for gr in range(2):
            for ch in range(nch):
                g = f * 2 + gr
                b = resv.max_bits(float(pe[ch, g]), mean_bits, nch)
                budgets[ch, g] = b
                used = min(p23[ch, g], b)
                resv.size += mean_bits // nch - used
        # simulate the frame-end stuffing clamp (reservoir.c:155-226):
        # stuffing consumes reservoir, so the final pass never has more
        # than this conservative trajectory assumes
        if nch == 2 and (mean_bits & 1):
            resv.size += 1
        resv.size = min(resv.size, resv.max)
        resv.size -= resv.size % 8

    # repair pass 1: re-encode granules whose demand exceeds their
    # budget at exactly that budget (actual usage <= assumption, so the
    # scan trajectory stays valid)
    demand = p23.copy()
    for ch in range(nch):
        over = np.where(np.minimum(demand[ch], 4095) > budgets[ch])[0]
        if len(over) == 0:
            continue
        o = outs[ch]
        enc = layer3.encode_granules(
            o["xr"][over], o["ratio_l"][over], o["ratio_s"][over],
            o["block_type"][over],
            np.minimum(budgets[ch][over], 4095).astype(np.float32),
            cfg.version, cfg.sampling_frequency)
        _merge(outs[ch], {k: np.asarray(v) for k, v in enc.items()
                          if k in outs[ch]}, over)
        p23[ch, over] = np.asarray(enc["part2_3_length"])

    # relax passes: a forward scan recomputes per-granule targets.
    # The reservoir update predicts each granule's usage as its last
    # observed usage plus the target delta (slack tends to be stable),
    # which mirrors the reference's sequential accounting closely; a
    # final validation scan afterwards guarantees feasibility.
    last_target = np.array(budgets, np.int64)
    for _relax in range(4):
        targets = np.zeros_like(p23)
        resv = Reservoir()
        resv.size = 0
        for f in range(nframes):
            resv.max = min(max(0, 7680 - bits_per_frame), resv_limit)
            for gr in range(2):
                for ch in range(nch):
                    g = f * 2 + gr
                    b = resv.max_bits(float(pe[ch, g]), mean_bits, nch)
                    tgt = min(int(demand[ch, g]), b, 4095)
                    targets[ch, g] = tgt
                    pred = int(min(max(p23[ch, g] + tgt - last_target[ch, g], 0), tgt))
                    resv.size += mean_bits // nch - pred
            if nch == 2 and (mean_bits & 1):
                resv.size += 1
            resv.size = min(resv.size, resv.max)
            resv.size -= resv.size % 8
        changed = False
        for ch in range(nch):
            redo = np.where(np.abs(targets[ch] - last_target[ch]) > 2)[0]
            if len(redo) == 0:
                continue
            changed = True
            o = outs[ch]
            enc = layer3.encode_granules(
                o["xr"][redo], o["ratio_l"][redo], o["ratio_s"][redo],
                o["block_type"][redo], targets[ch][redo].astype(np.float32),
                cfg.version, cfg.sampling_frequency)
            _merge(outs[ch], {k: np.asarray(v) for k, v in enc.items()
                              if k in outs[ch]}, redo)
            p23[ch, redo] = np.asarray(enc["part2_3_length"])
            last_target[ch, redo] = targets[ch, redo]
        if not changed:
            break

    # validation: with the *actual* usage, the reservoir must never be
    # overdrawn.  Where it would be, re-encode at the feasible budget.
    for _guard in range(8):
        resv = Reservoir()
        resv.size = 0
        bad = []
        for f in range(nframes):
            resv.max = min(max(0, 7680 - bits_per_frame), resv_limit)
            for gr in range(2):
                for ch in range(nch):
                    g = f * 2 + gr
                    limit = mean_bits // nch + resv.size
                    if p23[ch, g] > min(limit, 4095):
                        bad.append((ch, g, min(limit, 4095)))
                        resv.size += mean_bits // nch - min(limit, 4095)
                    else:
                        resv.size += mean_bits // nch - int(p23[ch, g])
            if nch == 2 and (mean_bits & 1):
                resv.size += 1
            resv.size = min(resv.size, resv.max)
            resv.size -= resv.size % 8
        if not bad:
            break
        for ch in range(nch):
            idx = np.array([g for c2, g, _ in bad if c2 == ch], np.int64)
            if len(idx) == 0:
                continue
            lim = np.array([l for c2, g, l in bad if c2 == ch], np.float32)
            o = outs[ch]
            enc = layer3.encode_granules(
                o["xr"][idx], o["ratio_l"][idx], o["ratio_s"][idx],
                o["block_type"][idx], lim, cfg.version,
                cfg.sampling_frequency)
            _merge(outs[ch], {k: np.asarray(v) for k, v in enc.items()
                              if k in outs[ch]}, idx)
            p23[ch, idx] = np.asarray(enc["part2_3_length"])

    # ---- final exact reservoir + stuffing + assembly
    # vectorized side-info arrays: (nch, G, 18) in the native layout
    # p23 bv gg compress wsf bt mixed ts0 ts1 ts2 r0 r1 pre ss c1ts part2 a1 a2
    side = np.zeros((nch, G, 19), np.int32)
    sfl_all = np.zeros((nch, G, 22), np.int32)
    sfs_all = np.zeros((nch, G, 39), np.int32)
    ix_all = np.zeros((nch, G, 576), np.int32)
    for ch in range(nch):
        o = outs[ch]
        side[ch, :, 0] = p23[ch]
        side[ch, :, 1] = o["big_values"]
        side[ch, :, 2] = o["global_gain"]
        side[ch, :, 3] = o["compress"]
        side[ch, :, 4] = o["window_switching_flag"]
        side[ch, :, 5] = np.where(o["window_switching_flag"] == 1,
                                  o["block_type"], 0)
        side[ch, :, 7:10] = o["table_select"]
        side[ch, :, 10] = o["r0"]
        side[ch, :, 11] = o["r1"]
        side[ch, :, 12] = o["preflag"]
        side[ch, :, 14] = o["count1table_select"]
        side[ch, :, 15] = o["part2"]
        side[ch, :, 16] = o["a1"]
        side[ch, :, 17] = o["a2"]
        side[ch, :, 18] = o["count1"]
        sfl_all[ch, :, :21] = o["sf_l"]
        sfs_all[ch] = o["sf_s"].reshape(G, 36)[:, :39] if o["sf_s"].shape[1:] == (36,)             else np.concatenate([o["sf_s"].reshape(G, 36),
                                 np.zeros((G, 3), np.int32)], axis=1)
        neg = (o["xr"] < 0) & (o["ix"] > 0)
        ix_all[ch] = np.where(neg, -o["ix"], o["ix"])

    from .runtime.bitstream import NativeAssembler
    sfb_s_full = np.asarray(sfb_s, np.int32)
    asm = NativeAssembler(cfg, sfb_s_full)
    resv = Reservoir()
    main_data_begin = 0
    scfsi = np.zeros((2, 4), np.int32)
    count1 = np.stack([outs[ch]["count1"] for ch in range(nch)])
    for f in range(nframes):
        resv.frame_begin(cfg.version, bits_per_frame, main_data_begin)
        g0, g1 = 2 * f, 2 * f + 1
        for gr in (g0, g1):
            for ch in range(nch):
                resv.adjust(mean_bits, nch, int(p23[ch, gr]))
        # stuffing (reservoir.c:155-226) applied to granule/channel p23s
        frame_p23 = [[int(p23[ch, g]) for ch in range(nch)] for g in (g0, g1)]
        if nch == 2 and (mean_bits & 1):
            resv.size += 1
        over = max(0, resv.size - resv.max)
        resv.size -= over
        stuffing = over
        align = resv.size % 8
        if align:
            stuffing += align
            resv.size -= align
        resv_drain = 0
        if stuffing:
            if frame_p23[0][0] + stuffing < 4095:
                frame_p23[0][0] += stuffing
            else:
                for gi_ in range(2):
                    for ch in range(nch):
                        if stuffing == 0:
                            break
                        extra = 4095 - frame_p23[gi_][ch]
                        take = min(extra, stuffing)
                        frame_p23[gi_][ch] += take
                        stuffing -= take
                resv_drain = stuffing

        # granule-major (gr, ch) layout for the native call
        fs = np.zeros((2 * nch, 19), np.int32)
        fl = np.zeros((2 * nch, 22), np.int32)
        ffs = np.zeros((2 * nch, 39), np.int32)
        fix = np.zeros((2 * nch, 576), np.int32)
        for gr in range(2):
            for ch in range(nch):
                g = 2 * f + gr
                row = gr * nch + ch
                fs[row] = side[ch, g]
                fs[row, 0] = frame_p23[gr][ch]
                # count1 trimming when stuffing pushed p23 only: none
                fl[row] = sfl_all[ch, g]
                ffs[row] = sfs_all[ch, g]
                fix[row] = ix_all[ch, g]
        main_data_begin = asm.add_frame(
            bits_per_frame, 0, main_data_begin,
            np.ascontiguousarray(scfsi), np.ascontiguousarray(fs),
            np.ascontiguousarray(fl), np.ascontiguousarray(ffs),
            np.ascontiguousarray(fix), resv_drain)
    return asm.finish()
