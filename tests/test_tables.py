import numpy as np

import mp3tpu.tables as T
from mp3tpu.tables.huffman import HUFF


def test_ana_filter_shape_and_symmetry():
    M = T.ANA_FILTER
    assert M.shape == (32, 64)
    # cos((2i+1)(16-k)pi/64) symmetries used by the Tavenard fold
    assert np.allclose(M[:, 0], M[:, 32])
    assert np.allclose(M[:, 16], 1.0)
    assert np.allclose(M[:, 48], 0.0)
    for j in range(1, 16):
        assert np.allclose(M[:, j], M[:, 32 - j])
    for j in range(15):
        assert np.allclose(M[:, 33 + j], -M[:, 63 - j])


def test_mdct_windows():
    assert np.allclose(T.MDCT_WIN[0][:18], T.MDCT_WIN[1][:18])
    assert np.all(T.MDCT_WIN[2][12:] == 0)
    assert np.all(T.MDCT_WIN[1][30:] == 0)


def test_huffman_meta():
    assert HUFF.codes.shape == (34, 16, 16)
    assert HUFF.xlen[1] == 2 and HUFF.xlen[13] == 16
    assert HUFF.linbits[16] == 1 and HUFF.linmax[23] == 8191
    # codeword length sanity: Kraft inequality holds for each real table
    for t in [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15]:
        n = int(HUFF.xlen[t])
        lens = HUFF.hlen[t, :n, :n].astype(np.int64)
        assert np.sum(2.0 ** (-lens)) <= 1.0 + 1e-9


def test_psy_params_rates():
    for hz in (32000.0, 44100.0, 48000.0):
        p = T.psy_params_for_sfreq(hz)
        assert p["cbmax_l"] > 0 and p["cbmax_s"] > 0
        assert p["numlines"].sum() <= 513
        assert np.all(p["s3_l"] >= 0)


def test_padding_is_disabled_like_reference():
    from mp3tpu.config import EncoderConfig
    cfg = EncoderConfig(bitrate_kbps=64, sample_rate_hz=44100.0).finalize()
    assert cfg.padding_sequence(100).sum() == 0
    assert cfg.padding_sequence(100, true_cbr=True).sum() > 0
