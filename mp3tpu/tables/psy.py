"""Psychoacoustic model 2 partition tables (Layer III flavour).

Parses the flat ``psy_data`` array exactly the way the reference's
``L3para_read`` does (l3psy.c:770-994): six per-sample-rate blocks of
long-partition rows, short-partition rows, and the partition->scalefactor
band conversion tables, followed by spreading-function computation from
the partition bark values (including the reference's asymmetric 1.5/3.0
slopes and -60 dB cutoff).

Also reproduces two deliberate reference quirks needed for parity:
  - at 44.1 kHz the long-block spreading convolution is restricted to the
    sparse index bounds ``s3ind`` (l3psy.c:996-1060);
  - the short-block path reuses the *long* spreading matrix and norm
    (l3psy.c:707-712).
"""
import os
from functools import lru_cache

import numpy as np

CBANDS = 63
CBANDS_S = 42
HBLKSIZE = 513
HBLKSIZE_S = 129
SBMAX_L = 21
SBMAX_S = 12

_LN_TO_LOG10 = 0.2302585093

_D = np.load(os.path.join(os.path.dirname(__file__), "data", "iso_tables.npz"))
PSY_DATA = _D["psy_data"]

# Sparse spreading bounds used for the 44.1 kHz long path (l3psy.c:996-1060).
S3IND = np.array([
    (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 9), (0, 10),
    (0, 11), (0, 12), (1, 14), (1, 14), (2, 15), (3, 15), (5, 16), (6, 17),
    (7, 19), (9, 20), (10, 21), (11, 22), (12, 23), (14, 24), (15, 25),
    (15, 27), (16, 28), (16, 28), (17, 29), (18, 30), (19, 31), (19, 32),
    (20, 34), (21, 35), (22, 36), (22, 36), (23, 37), (24, 38), (25, 39),
    (26, 41), (27, 42), (28, 43), (29, 44), (30, 45), (31, 46), (32, 47),
    (33, 48), (34, 49), (35, 50), (36, 51), (37, 52), (37, 53), (38, 54),
    (39, 55), (40, 56), (41, 57), (42, 58), (43, 59), (44, 60), (45, 61),
    (46, 62), (47, 62), (48, 62), (48, 62),
], dtype=np.int32)


def _spreading(bval, nmax):
    """Spreading matrix per l3psy.c:820-851 (same formula for short :893-920)."""
    s3 = np.zeros((CBANDS, CBANDS))
    for i in range(nmax):
        for j in range(nmax):
            if j >= i:
                tempx = (bval[i] - bval[j]) * 3.0
            else:
                tempx = (bval[i] - bval[j]) * 1.5
            if 0.5 <= tempx <= 2.5:
                t = tempx - 0.5
                x = 8.0 * (t * t - 2.0 * t)
            else:
                x = 0.0
            tempx += 0.474
            tempy = 15.811389 + 7.5 * tempx - 17.5 * np.sqrt(1.0 + tempx * tempx)
            if tempy > -60.0:
                s3[i, j] = np.exp((x + tempy) * _LN_TO_LOG10)
    return s3


@lru_cache(maxsize=None)
def psy_params_for_sfreq(sfreq_hz):
    """All Layer III model-2 tables for one sample rate (Hz, e.g. 44100).

    Returns a dict of numpy arrays sized to the fixed CBANDS/CBANDS_S
    dimensions with zero padding, mirroring the reference's static
    buffers.
    """
    p = PSY_DATA
    pos = 0
    out = {}

    # --- long partition block (l3psy.c:784-811)
    numlines = np.zeros(CBANDS, np.int32)
    minval = np.zeros(CBANDS)
    qthr_l = np.zeros(CBANDS)
    norm_l = np.zeros(CBANDS)
    bval_l = np.zeros(CBANDS)
    partition_l = np.zeros(HBLKSIZE, np.int32)
    cbmax_l = 0
    for _ in range(6):
        freq = p[pos]; n = int(p[pos + 1]) + 1; pos += 2
        if freq == sfreq_hz:
            cbmax_l = n
            k2 = 0
            for i in range(n):
                row = p[pos:pos + 6]; pos += 6
                assert int(row[0]) == i
                numlines[i] = int(row[1])
                minval[i], qthr_l[i], norm_l[i], bval_l[i] = row[2:6]
                partition_l[k2:k2 + numlines[i]] = i
                k2 += numlines[i]
            # lines beyond k2 keep partition 0, as in the C static array
        else:
            pos += n * 6

    s3_l = _spreading(bval_l, cbmax_l)

    # --- short partition block (l3psy.c:856-883)
    numlines_s = np.zeros(CBANDS, np.int32)
    qthr_s = np.zeros(CBANDS)
    norm_s = np.zeros(CBANDS)
    snr_s = np.zeros(CBANDS)
    bval_s = np.zeros(CBANDS)
    partition_s = np.zeros(HBLKSIZE_S, np.int32)
    cbmax_s = 0
    for _ in range(6):
        freq = p[pos]; n = int(p[pos + 1]) + 1; pos += 2
        if freq == sfreq_hz:
            cbmax_s = n
            k2 = 0
            for i in range(n):
                row = p[pos:pos + 6]; pos += 6
                assert int(row[0]) == i
                numlines_s[i] = int(row[1])
                qthr_s[i], norm_s[i], snr_s[i], bval_s[i] = row[2:6]
                partition_s[k2:k2 + numlines_s[i]] = i
                k2 += numlines_s[i]
        else:
            pos += n * 6

    s3_s = _spreading(bval_s, cbmax_s)  # computed but unused by the
    # reference short path, which reuses s3_l (l3psy.c:708); kept for the
    # future "fixed psychoacoustics" quality mode.

    # --- long partition -> sfb conversion (l3psy.c:927-957)
    cbw_l = np.zeros(SBMAX_L, np.int32); bu_l = np.zeros(SBMAX_L, np.int32)
    bo_l = np.zeros(SBMAX_L, np.int32)
    w1_l = np.zeros(SBMAX_L); w2_l = np.zeros(SBMAX_L)
    for _ in range(6):
        freq = p[pos]; n = int(p[pos + 1]) + 1; pos += 2
        if freq == sfreq_hz:
            for i in range(n):
                row = p[pos:pos + 6]; pos += 6
                assert int(row[0]) == i
                cbw_l[i], bu_l[i], bo_l[i] = int(row[1]), int(row[2]), int(row[3])
                w1_l[i], w2_l[i] = row[4], row[5]
        else:
            pos += n * 6

    # --- short partition -> sfb conversion (l3psy.c:962-992)
    cbw_s = np.zeros(SBMAX_S, np.int32); bu_s = np.zeros(SBMAX_S, np.int32)
    bo_s = np.zeros(SBMAX_S, np.int32)
    w1_s = np.zeros(SBMAX_S); w2_s = np.zeros(SBMAX_S)
    for _ in range(6):
        freq = p[pos]; n = int(p[pos + 1]) + 1; pos += 2
        if freq == sfreq_hz:
            for i in range(n):
                row = p[pos:pos + 6]; pos += 6
                assert int(row[0]) == i
                cbw_s[i], bu_s[i], bo_s[i] = int(row[1]), int(row[2]), int(row[3])
                w1_s[i], w2_s[i] = row[4], row[5]
        else:
            pos += n * 6

    assert cbmax_l > 0 and cbmax_s > 0, f"unsupported sample rate {sfreq_hz}"

    # Dense mask for the 44.1 kHz sparse convolution: weight is s3_l
    # within the s3ind bounds, zero outside.
    s3_mask = np.zeros((CBANDS, CBANDS))
    for b in range(CBANDS):
        lo, hi = S3IND[b]
        s3_mask[b, lo:hi + 1] = 1.0

    # L3para_read reads the short-partition rows into the *same*
    # numlines array (l3psy.c:868), clobbering long entries < cbmax_s.
    # pe (l3psy.c:639-645) therefore uses this mixture.
    numlines_pe = numlines.copy()
    numlines_pe[:cbmax_s] = numlines_s[:cbmax_s]

    out.update(
        sfreq=sfreq_hz, cbmax_l=cbmax_l, cbmax_s=cbmax_s,
        numlines=numlines, numlines_pe=numlines_pe, minval=minval, qthr_l=qthr_l, norm_l=norm_l,
        bval_l=bval_l, partition_l=partition_l, s3_l=s3_l, s3_mask=s3_mask,
        numlines_s=numlines_s, qthr_s=qthr_s, norm_s=norm_s, snr_s=snr_s,
        bval_s=bval_s, partition_s=partition_s, s3_s=s3_s,
        cbw_l=cbw_l, bu_l=bu_l, bo_l=bo_l, w1_l=w1_l, w2_l=w2_l,
        cbw_s=cbw_s, bu_s=bu_s, bo_s=bo_s, w1_s=w1_s, w2_s=w2_s,
    )
    return out
