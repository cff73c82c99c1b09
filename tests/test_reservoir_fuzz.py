"""Reservoir property fuzzing (reservoir.c policy, SURVEY.md section 2.3 S4).

The fast path's native budget scan (mp3resv_scan) predicts per-granule
usage and assigns budgets; the guard scan (mp3resv_guard) re-checks the
actual usage.  These tests fuzz both against the byte-exact oracle
reservoir (numpy_ref/reservoir.py) on randomized and adversarial
pe/demand streams and assert the CBR invariants that the reference
enforces with runtime asserts (reservoir.c:73, musicin.c:793-797).
"""
import numpy as np
import pytest

from mp3tpu.runtime.bitstream import resv_guard, resv_scan


class _OracleScan:
    """Reference reservoir dynamics (max_bits / adjust / frame_end
    arithmetic without the stuffing redistribution)."""

    def __init__(self, mean_bits, resv_max, nch, mode_gr):
        self.size = 0
        self.mean_bits = mean_bits
        self.resv_max = resv_max
        self.nch = nch
        self.mode_gr = mode_gr

    def max_bits(self, pe):
        from mp3tpu.numpy_ref.reservoir import Reservoir
        r = Reservoir()
        r.size = self.size
        r.max = self.resv_max
        return r.max_bits(pe, self.mean_bits, self.nch)

    def use(self, used):
        self.size += self.mean_bits // self.nch - used

    def frame_end(self):
        if self.nch == 2 and (self.mean_bits & 1):
            self.size += 1
        self.size -= max(0, self.size - self.resv_max)
        self.size -= self.size % 8


def _streams(seed, nframes, nch, loud=False):
    rng = np.random.RandomState(seed)
    G = nframes * 2
    if loud:
        pe = np.full((nch, G), 4000.0)
        demand = np.full((nch, G), 4095, np.int64)
    else:
        pe = rng.uniform(100.0, 3500.0, (nch, G))
        demand = rng.randint(0, 4096, (nch, G)).astype(np.int64)
    return pe, demand


@pytest.mark.parametrize("seed,nch,kbps", [
    (0, 2, 128), (1, 1, 64), (2, 2, 320), (3, 2, 32), (4, 1, 160),
])
def test_scan_matches_oracle_policy(seed, nch, kbps):
    """Native scan budgets == the oracle ResvMaxBits sequence when fed
    the same usage prediction."""
    nframes = 40
    rate = 44100
    bits_per_frame = 8 * ((1152 // 8) * 1000 * kbps // rate // 1000 * 8) \
        if False else 8 * int(1152 / 44.1 * kbps / 8)
    sideinfo = 32 + (256 if nch == 2 else 136)
    mean_bits = (bits_per_frame - sideinfo) // 2
    resv_max = min(max(0, 7680 - bits_per_frame), 4088)
    pe, demand = _streams(seed, nframes, nch)

    budgets = resv_scan(pe, demand, None, None, nframes, nch,
                        mean_bits, resv_max)

    ora = _OracleScan(mean_bits, resv_max, nch, 2)
    idx = 0
    for f in range(nframes):
        for gr in range(2):
            for ch in range(nch):
                g = 2 * f + gr
                b = ora.max_bits(float(pe[ch, g]))
                assert budgets[ch, g] == b, (f, gr, ch, budgets[ch, g], b)
                ora.use(min(int(demand[ch, g]), b))
                idx += 1
        ora.frame_end()
        assert 0 <= ora.size <= resv_max


@pytest.mark.parametrize("seed", range(6))
def test_scan_targets_always_feasible(seed):
    """min(demand, scan budget) usage never overdraws: the guard scan
    accepts it and the reservoir level stays in [0, resv_max]."""
    nch, kbps, nframes = 2, 128, 60
    bits_per_frame = 8 * int(1152 / 44.1 * kbps / 8)
    mean_bits = (bits_per_frame - 288) // 2
    resv_max = min(max(0, 7680 - bits_per_frame), 4088)
    pe, demand = _streams(seed, nframes, nch, loud=(seed % 3 == 0))

    target = np.minimum(demand, resv_scan(pe, demand, None, None,
                                          nframes, nch, mean_bits,
                                          resv_max))
    assert int(target.max()) <= 4095
    bad, limits = resv_guard(target, nframes, nch, mean_bits, resv_max)
    assert not bad, "scan-assigned targets must satisfy the guard"
    # any usage <= target is also feasible (the reservoir only runs
    # higher when granules use less)
    rng = np.random.RandomState(seed + 100)
    usage = (target * rng.uniform(0.3, 1.0, target.shape)).astype(np.int64)
    bad2, _ = resv_guard(usage, nframes, nch, mean_bits, resv_max)
    assert not bad2


def test_guard_flags_overdraw():
    """An adversarial stream that spends over the frame budget must be
    flagged, and the returned limits must themselves be feasible."""
    nch, nframes = 2, 20
    bits_per_frame = 8 * int(1152 / 44.1 * 128 / 8)
    mean_bits = (bits_per_frame - 288) // 2
    resv_max = min(max(0, 7680 - bits_per_frame), 4088)
    p23 = np.full((nch, nframes * 2), 4095, np.int64)
    bad, limits = resv_guard(p23, nframes, nch, mean_bits, resv_max)
    assert bad
    clamped = np.minimum(p23, limits)
    bad2, _ = resv_guard(clamped, nframes, nch, mean_bits, resv_max)
    assert not bad2


def test_lsf_mode_gr_scan():
    """mode_gr=1 (MPEG-2 LSF) reservoir dynamics: one granule per
    frame, 2040-bit limit."""
    nch, nframes = 1, 50
    bits_per_frame = 8 * int(576 / 22.05 * 64 / 8)
    mean_bits = bits_per_frame - 104
    resv_max = min(max(0, 7680 - bits_per_frame), 2040)
    rng = np.random.RandomState(9)
    pe = rng.uniform(100.0, 3000.0, (nch, nframes))
    demand = rng.randint(0, 4096, (nch, nframes)).astype(np.int64)
    target = np.minimum(demand, resv_scan(pe, demand, None, None,
                                          nframes, nch, mean_bits,
                                          resv_max, mode_gr=1))
    bad, _ = resv_guard(target, nframes, nch, mean_bits, resv_max,
                        mode_gr=1)
    assert not bad
