"""Psychoacoustic model 2, Layer III flavour (l3psy.c:443-740), batched.

Stateless reformulation over the granule axis.  All reference carried
state becomes indexing:

  savebuf slide (l3psy.c:477-481): granule g's long FFT window is
    stream[576 g - 768 : 576 g + 256), zero-padded before t=0;
  r/phi two-granule history (l3psy.c:496-512): shifts of per-granule
    spectra;
  nb_1/nb_2 pre-echo memory (l3psy.c:629-636): shifts of raw nb;
  blocktype FSM + one-granule emission delay (l3psy.c:647-733):
    a tiny sequential scan over {NORM, SHORT, STOP} with
      state' = attack ? SHORT : (state==SHORT ? STOP : NORM)
      emit   = attack ? (state==NORM ? START : SHORT) : state
  ratio emission delay (l3psy.c:452-456): output[g] = computed[g-1].

FFT precision follows the reference: the split-radix FFT runs in
float32 (subs.c FLOAT), with the energy floor of 0.0005 on interior
lines and zeroed phase there (subs.c:67-122).  The unpredictability
measure is invariant to the FFT's phase sign convention, so np.fft is a
valid stand-in for Malvar's packing.
"""
import numpy as np

from ..tables import mpeg
from ..tables.psy import (CBANDS, CBANDS_S, HBLKSIZE, HBLKSIZE_S, SBMAX_L,
                          SBMAX_S, S3IND, psy_params_for_sfreq)

LN = mpeg.LN_TO_LOG10
SWITCH_PE = 1800.0


def _hann(n):
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1 - np.cos(2.0 * mpeg.REF_PI * (i - 0.5) / n))).astype(np.float32)


def _fft_energy_phi(frames_f32):
    """energy/phi per reference conventions; frames (..., N) float32."""
    N = frames_f32.shape[-1]
    X = np.fft.rfft(frames_f32.astype(np.float64), axis=-1)
    re = X.real.astype(np.float32).astype(np.float64)
    im = X.imag.astype(np.float32).astype(np.float64)
    energy = re * re + im * im
    phi = np.arctan2(im, re)
    # interior lines: floor energy, zero phi (subs.c:67-80)
    floor = energy < 0.0005
    floor[..., 0] = False
    floor[..., N // 2] = False
    energy = np.where(floor, 0.0005, energy)
    phi = np.where(floor, 0.0, phi)
    energy[..., 0] = re[..., 0] ** 2
    energy[..., N // 2] = re[..., N // 2] ** 2
    phi[..., 0] = np.arctan2(0.0, re[..., 0])
    phi[..., N // 2] = np.arctan2(0.0, re[..., N // 2])
    return energy, phi


def psycho_granules(samples, sfreq_hz):
    """Run model 2 over all granules of one channel.

    samples: int16-valued float/int array, one channel, length 576*G
             (the raw PCM, *not* scaled).
    Returns dict with per-granule emitted outputs (already one-granule
    delayed exactly like the reference):
      block_type (G,), ratio_l (G,21), ratio_s (G,12,3), pe (G,)
    """
    P = psy_params_for_sfreq(float(sfreq_hz))
    s = np.asarray(samples, np.float64)
    G = len(s) // 576
    s = s[:576 * G]

    win_l = _hann(1024)
    win_s = _hann(256)

    # --- long FFT windows: stream[576g-768 : 576g+256)
    pad = np.concatenate([np.zeros(768), s])
    idx = 576 * np.arange(G)[:, None] + np.arange(1024)[None, :]
    frames = (pad[idx]).astype(np.float32) * win_l[None, :]
    energy, phi = _fft_energy_phi(frames)        # (G, 513)

    # --- short FFT windows at offsets 256,384,512 within the savebuf
    sidx = (576 * np.arange(G)[:, None, None] + 128 * (2 + np.arange(3))[None, :, None]
            + np.arange(256)[None, None, :])
    sframes = pad[sidx].astype(np.float32) * win_s[None, None, :]
    energy_s, phi_s = _fft_energy_phi(sframes)   # (G, 3, 129)

    # --- unpredictability cw
    cw = np.full((G, HBLKSIZE), 0.4)
    r = np.sqrt(energy).astype(np.float32).astype(np.float64)
    r1 = np.concatenate([np.zeros((1, HBLKSIZE)), r[:-1]])
    r2 = np.concatenate([np.zeros((2, HBLKSIZE)), r[:-2]])
    phi1 = np.concatenate([np.zeros((1, HBLKSIZE)), phi[:-1]])
    phi2 = np.concatenate([np.zeros((2, HBLKSIZE)), phi[:-2]])
    rp = 2.0 * r1 - r2
    pp = 2.0 * phi1 - phi2
    t1 = r * np.cos(phi) - rp * np.cos(pp)
    t2 = r * np.sin(phi) - rp * np.sin(pp)
    t3 = r + np.abs(rp)
    cw_l = np.where(t3 != 0.0, np.sqrt(t1 * t1 + t2 * t2) / np.where(t3 == 0, 1, t3), 0.0)
    cw[:, :6] = cw_l[:, :6]

    rs = np.sqrt(energy_s).astype(np.float32).astype(np.float64)  # (G,3,129)
    k = (np.arange(6, 206, 4) + 2) >> 2        # 2..51
    rp_s = 2.0 * rs[:, 0, k] - rs[:, 2, k]
    pp_s = 2.0 * phi_s[:, 0, k] - phi_s[:, 2, k]
    r2s = rs[:, 1, k]
    p2s = phi_s[:, 1, k]
    t1 = r2s * np.cos(p2s) - rp_s * np.cos(pp_s)
    t2 = r2s * np.sin(p2s) - rp_s * np.sin(pp_s)
    t3 = r2s + np.abs(rp_s)
    cws = np.where(t3 != 0.0, np.sqrt(t1 * t1 + t2 * t2) / np.where(t3 == 0, 1, t3), 0.0)
    cw[:, 6:206] = np.repeat(cws, 4, axis=1)

    # --- partition energies (ascending j accumulation)
    part_l = P["partition_l"]
    eb = np.zeros((G, CBANDS))
    cbw = np.zeros((G, CBANDS))
    np.add.at(eb.T, part_l, energy.T)
    np.add.at(cbw.T, part_l, (cw * energy).T)

    # --- spreading convolution
    sfreq_idx = {32000.0: 0, 44100.0: 1, 48000.0: 2}[float(sfreq_hz)]
    s3 = P["s3_l"]
    if sfreq_idx == 1:
        s3 = s3 * P["s3_mask"]  # sparse bounds, l3psy.c:591-593
    ecb = np.zeros((G, CBANDS))
    ctb = np.zeros((G, CBANDS))
    for kk in range(CBANDS):  # ascending-k accumulation like the C loop
        ecb += s3[None, :, kk] * eb[:, kk:kk + 1]
        ctb += s3[None, :, kk] * cbw[:, kk:kk + 1]

    # --- tonality -> SNR -> thresholds
    with np.errstate(divide="ignore", invalid="ignore"):
        cbb = np.where(ecb != 0.0, np.log(np.maximum(ctb / np.where(ecb == 0, 1, ecb), 0.01)), 0.0)
    tbb = np.clip(-0.299 - 0.43 * cbb, 0.0, 1.0)
    snr_l = np.maximum(P["minval"][None, :], 29.0 * tbb + 6.0 * (1.0 - tbb))
    nb = ecb * P["norm_l"][None, :] * np.exp(-snr_l * LN)
    nb1 = np.concatenate([np.zeros((1, CBANDS)), nb[:-1]])
    nb2 = np.concatenate([np.zeros((2, CBANDS)), nb[:-2]])
    thr = np.maximum(P["qthr_l"][None, :], np.minimum(nb, np.minimum(2.0 * nb1, 16.0 * nb2)))

    # --- perceptual entropy
    pe = -np.sum(P["numlines"][None, :] * np.minimum(0.0, np.log((thr + 1.0) / (eb + 1.0))), axis=1)

    # --- long-block sfb ratios
    en_l = np.zeros((G, SBMAX_L))
    thm_l = np.zeros((G, SBMAX_L))
    for sb in range(SBMAX_L):
        bu, bo = P["bu_l"][sb], P["bo_l"][sb]
        en = P["w1_l"][sb] * eb[:, bu] + P["w2_l"][sb] * eb[:, bo]
        th = P["w1_l"][sb] * thr[:, bu] + P["w2_l"][sb] * thr[:, bo]
        for b in range(bu + 1, bo):
            en = en + eb[:, b]
            th = th + thr[:, b]
        en_l[:, sb] = en
        thm_l[:, sb] = th
    ratio_l = np.where(en_l != 0.0, thm_l / np.where(en_l == 0, 1, en_l), 0.0)

    # --- short-block sfb ratios (for attack granules; computed for all)
    part_s = P["partition_s"]
    eb_s = np.zeros((G, 3, CBANDS))
    np.add.at(eb_s.transpose(2, 0, 1), part_s, energy_s.transpose(2, 0, 1))
    # full conv with the *long* matrix restricted to CBANDS_S (l3psy.c:707-709)
    ecb_s = np.zeros((G, 3, CBANDS))
    for kk in range(CBANDS_S):
        ecb_s[..., :CBANDS_S] += P["s3_l"][None, None, :CBANDS_S, kk] * eb_s[:, :, kk:kk + 1]
    nb_s = ecb_s * P["norm_l"][None, None, :] * np.exp(P["snr_s"][None, None, :] * LN)
    thr_s = np.maximum(P["qthr_s"][None, None, :], nb_s)
    en_s = np.zeros((G, SBMAX_S, 3))
    thm_s = np.zeros((G, SBMAX_S, 3))
    for sb in range(SBMAX_S):
        bu, bo = P["bu_s"][sb], P["bo_s"][sb]
        en = P["w1_s"][sb] * eb_s[:, :, bu] + P["w2_s"][sb] * eb_s[:, :, bo]
        th = P["w1_s"][sb] * thr_s[:, :, bu] + P["w2_s"][sb] * thr_s[:, :, bo]
        for b in range(bu + 1, bo):
            en = en + eb_s[:, :, b]
            th = th + thr_s[:, :, b]
        en_s[:, sb] = en
        thm_s[:, sb] = th
    ratio_s = np.where(en_s != 0.0, thm_s / np.where(en_s == 0, 1, en_s), 0.0)

    # --- block type FSM with one-granule emission delay
    attack = pe >= SWITCH_PE
    state = mpeg.NORM_TYPE
    emit_bt = np.zeros(G, np.int32)
    for g in range(G):
        if attack[g]:
            emit_bt[g] = mpeg.START_TYPE if state == mpeg.NORM_TYPE else mpeg.SHORT_TYPE
            state = mpeg.SHORT_TYPE
        else:
            emit_bt[g] = state
            state = mpeg.STOP_TYPE if state == mpeg.SHORT_TYPE else mpeg.NORM_TYPE

    # --- one-granule delayed ratio emission
    out_ratio_l = np.concatenate([np.zeros((1, SBMAX_L)), ratio_l[:-1]])
    out_ratio_s = np.concatenate([np.zeros((1, SBMAX_S, 3)), ratio_s[:-1]])

    return dict(block_type=emit_bt, ratio_l=out_ratio_l, ratio_s=out_ratio_s,
                pe=pe, attack=attack)
