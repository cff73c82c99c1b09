"""Device-side main_data emission (ops/jaxbits) vs the byte-exact
oracle emitters (numpy_ref/bitstream.py encode_scalefacs +
encode_spectrum, themselves golden-tested against the reference)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mp3tpu.numpy_ref import bitstream as oref
from mp3tpu.ops import jaxbits, jaxloop
from mp3tpu.tables import mpeg


class _GI:
    pass


def _oracle_bits(state, ix_signed, is_short, sfb_s, g):
    """Pack granule g's main_data with the oracle emitters -> bit string."""
    gi = _GI()
    gi.window_switching_flag = 1 if bool(is_short[g]) else 0
    gi.block_type = 2 if bool(is_short[g]) else 0
    gi.mixed_block_flag = 0
    gi.scalefac_compress = int(state["compress"][g])
    gi.big_values = int(state["big_values"][g])
    gi.count1 = int(state["count1"][g])
    gi.count1table_select = int(state["count1table_select"][g])
    gi.table_select = [int(t) for t in state["table_select"][g]]
    gi.address1 = int(state["a1"][g])
    gi.address2 = int(state["a2"][g])
    gi.part2_length = int(state["part2"][g])
    # p23 == part2 + data bits exactly (stuffing is drained to the
    # ancillary region, never inside the granule) => no stuffing here
    gi.part2_3_length = int(state["part2_3_length"][g])
    el = oref.encode_scalefacs(
        gi, np.asarray(state["sf_l"][g]), np.asarray(state["sf_s"][g]),
        [0, 0, 0, 0], 0, mpeg.MPEG1)
    data = oref.encode_spectrum(gi, np.asarray(ix_signed[g]), sfb_s,
                                count1_conformant=True)
    el = el + data
    bits = ""
    for v, ln in el:
        bits += format(int(v) & ((1 << ln) - 1), "0%db" % ln)
    return bits


def _payload_bits(words, nbits):
    s = ""
    for w in np.asarray(words):
        s += format(int(w), "032b")
    return s[:int(nbits)]


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(7)
    G = 24
    xr = rng.randn(G, 576).astype(np.float32) * 40
    # exercise sparse spectra, ESC values, silence, and short blocks
    xr[::3, 200:] = 0
    xr[1] *= 400            # big linbits values
    xr[2] = 0               # silent granule
    xr[4, 100:] = 0
    bt = np.full(G, mpeg.NORM_TYPE, np.int32)
    bt[5:9] = 2
    bt[9] = 1
    bt[10] = 3
    is_short_block = bt != mpeg.NORM_TYPE
    ST = jaxloop._static(mpeg.MPEG1, 0)
    budget = np.full(G, 1200.0, np.float32)
    budget[6] = 4095.0
    budget[7] = 300.0
    out = jaxloop.outer_loop(jnp.asarray(xr), jnp.asarray(budget),
                             jnp.abs(jnp.asarray(xr[:, :21])) * 0 + 0.02,
                             jnp.zeros((G, 12, 3), jnp.float32) + 0.02,
                             jnp.asarray(is_short_block), jnp.asarray(bt),
                             ST)
    out = {k: np.asarray(v) for k, v in out.items()}
    ix_signed = np.where((xr < 0) & (out["ix"] > 0), -out["ix"], out["ix"])
    is_short = is_short_block & (bt == 2)
    return out, ix_signed.astype(np.int32), is_short, ST


def test_payload_matches_oracle(batch):
    state, ix_signed, is_short, ST = batch
    sfb_s = mpeg.sfb_short(mpeg.MPEG1, 0)
    st_j = {k: jnp.asarray(v) for k, v in state.items()
            if isinstance(v, np.ndarray)}
    words, nbits = jaxbits.granule_payload(
        st_j, jnp.asarray(ix_signed), jnp.asarray(is_short), ST)
    words = np.asarray(words)
    nbits = np.asarray(nbits)
    for g in range(ix_signed.shape[0]):
        ref = _oracle_bits(state, ix_signed, is_short, sfb_s, g)
        got = _payload_bits(words[g], nbits[g])
        assert nbits[g] == len(ref), (g, int(nbits[g]), len(ref))
        assert got == ref, (g, got[:64], ref[:64])


def test_nbits_equals_part2_3_length(batch):
    state, ix_signed, is_short, ST = batch
    st_j = {k: jnp.asarray(v) for k, v in state.items()
            if isinstance(v, np.ndarray)}
    _, nbits = jaxbits.granule_payload(
        st_j, jnp.asarray(ix_signed), jnp.asarray(is_short), ST)
    np.testing.assert_array_equal(np.asarray(nbits),
                                  state["part2_3_length"])


def test_pack_elements_random():
    rng = np.random.RandomState(3)
    G, E = 8, 100
    lengths = rng.randint(0, 29, size=(G, E)).astype(np.int32)
    lengths[:, ::7] = 0
    values = rng.randint(0, 2 ** 28, size=(G, E)).astype(np.uint32)
    words, nbits = jaxbits.pack_elements_jit(jnp.asarray(values),
                                             jnp.asarray(lengths), 128)
    words = np.asarray(words)
    for g in range(G):
        ref = ""
        for v, ln in zip(values[g], lengths[g]):
            if ln:
                ref += format(int(v) & ((1 << int(ln)) - 1), "0%db" % ln)
        got = _payload_bits(words[g], int(nbits[g]))
        assert int(np.asarray(nbits)[g]) == len(ref)
        assert got == ref
