"""ETSI channel-coding chain tests: NumPy Viterbi oracle, round-trips,
noise resilience, erasure handling."""

import numpy as np
import pytest
import jax.numpy as jnp

from tetraear_tpu.ops import channel_coding as cc
from tetraear_tpu.ops import interleave as il
from tetraear_tpu.ops import scramble as scr
from tetraear_tpu.ops import viterbi as vit


# --- NumPy hard-decision Viterbi oracle (independent implementation) -------

def oracle_viterbi(llrs, n_input):
    nxt, out = vit._tables()
    llrs = np.asarray(llrs).reshape(n_input, 4)
    metrics = np.full(16, -1e9)
    metrics[0] = 0.0
    decisions = np.zeros((n_input, 16), np.uint8)
    for t in range(n_input):
        new_m = np.full(16, -1e18)
        dec = np.zeros(16, np.uint8)
        for sp in range(16):
            u = sp >> 3
            for d, s in enumerate((((sp & 7) << 1), ((sp & 7) << 1) | 1)):
                bm = float(np.sum(llrs[t] * (out[s, u].astype(float) * 2 - 1)))
                cand = metrics[s] + bm
                if cand > new_m[sp]:
                    new_m[sp] = cand
                    dec[sp] = d
        metrics = new_m
        decisions[t] = dec
    state = 0
    bits = np.zeros(n_input, np.uint8)
    for t in range(n_input - 1, -1, -1):
        bits[t] = state >> 3
        state = ((state & 7) << 1) | decisions[t, state]
    return bits[:n_input - 4]


class TestConvCode:
    def test_encoder_output_length_and_termination(self):
        msg = np.random.default_rng(0).integers(0, 2, 60)
        mother = vit.conv_encode(msg, terminate=True)
        assert len(mother) == 4 * 64
        # tail drives state back to zero: re-encoding from the final state
        # of the message with 4 zeros must match the last 16 output bits of
        # an encoder started in that state — implicitly covered by decode
        # round-trip below.

    def test_puncture_rate(self):
        idx = vit.puncture_indices(64)
        assert len(idx) == 96                  # 64 in -> 96 out = rate 2/3
        assert idx.max() < 4 * 64
        # first block keeps mother bits 0,1,4
        np.testing.assert_array_equal(idx[:6], [0, 1, 4, 8, 9, 12])

    def test_clean_roundtrip_rate23(self):
        rng = np.random.default_rng(1)
        for n in (60, 124, 268):
            msg = rng.integers(0, 2, n).astype(np.uint8)
            coded = vit.encode_rate_2_3(msg)
            assert len(coded) == (n + 4) * 3 // 2
            llrs = jnp.asarray(coded.astype(np.float32) * 2 - 1)
            got = np.asarray(vit.decode_rate_2_3(llrs, n + 4))
            np.testing.assert_array_equal(got, msg)

    def test_matches_numpy_oracle_on_noisy_llrs(self):
        rng = np.random.default_rng(2)
        n = 64
        llrs = rng.standard_normal(4 * n).astype(np.float32)
        got = np.asarray(vit.viterbi_decode(jnp.asarray(llrs), n))
        want = oracle_viterbi(llrs, n)
        np.testing.assert_array_equal(got, want)

    def test_corrects_channel_errors(self):
        """Rate-2/3 K=5 should correct scattered hard errors."""
        rng = np.random.default_rng(3)
        msg = rng.integers(0, 2, 124).astype(np.uint8)
        coded = vit.encode_rate_2_3(msg).astype(np.float32) * 2 - 1
        # flip 6 scattered bits
        flips = rng.choice(len(coded), 6, replace=False)
        coded[flips] *= -1
        got = np.asarray(vit.decode_rate_2_3(jnp.asarray(coded), 128))
        assert (got == msg).mean() == 1.0

    def test_soft_noise_beats_hard(self):
        rng = np.random.default_rng(4)
        msg = rng.integers(0, 2, 268).astype(np.uint8)
        clean = vit.encode_rate_2_3(msg).astype(np.float32) * 2 - 1
        noisy = clean + rng.standard_normal(len(clean)) * 0.6
        got = np.asarray(vit.decode_rate_2_3(jnp.asarray(noisy), 272))
        assert (got == msg).mean() > 0.97

    def test_batched_decode(self):
        rng = np.random.default_rng(5)
        msgs = rng.integers(0, 2, (8, 60)).astype(np.uint8)
        coded = np.stack([vit.encode_rate_2_3(m) for m in msgs])
        llrs = jnp.asarray(coded.astype(np.float32) * 2 - 1)
        got = np.asarray(vit.decode_rate_2_3(llrs, 64))
        np.testing.assert_array_equal(got, msgs)


class TestInterleave:
    @pytest.mark.parametrize("channel", ["BSCH", "SCH/HD", "SCH/F"])
    def test_roundtrip_and_permutation(self, channel):
        k, _ = il.BLOCK_PARAMS[channel]
        x = jnp.arange(k, dtype=jnp.int32)
        y = il.interleave(x, channel)
        assert sorted(np.asarray(y).tolist()) == list(range(k))
        z = il.deinterleave(y, channel)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
        # actually interleaves (not identity)
        assert not np.array_equal(np.asarray(y), np.asarray(x))


class TestScramble:
    def test_self_inverse(self):
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, 432).astype(np.uint8))
        ecc = scr.extended_colour_code(260, 98, 5)
        s = scr.scramble(bits, ecc)
        assert not np.array_equal(np.asarray(s), np.asarray(bits))
        np.testing.assert_array_equal(np.asarray(scr.descramble(s, ecc)),
                                      np.asarray(bits))

    def test_sequences_differ_by_seed(self):
        a = scr.scrambling_sequence(0, 256)
        b = scr.scrambling_sequence(scr.extended_colour_code(260, 1, 1), 256)
        assert not np.array_equal(a, b)
        # pseudo-random balance
        assert 0.3 < a.mean() < 0.7

    def test_soft_descramble_consistent(self):
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, 120).astype(np.uint8)
        ecc = 12345
        tx = np.asarray(scr.scramble(jnp.asarray(bits), ecc))
        llrs = jnp.asarray(tx.astype(np.float32) * 2 - 1)
        soft = np.asarray(scr.scramble_soft(llrs, ecc))
        np.testing.assert_array_equal((soft > 0).astype(np.uint8), bits)


class TestFullChain:
    @pytest.mark.parametrize("channel", ["BSCH", "SCH/HD", "SCH/F"])
    def test_encode_decode_roundtrip(self, channel):
        k1, air = cc.CHANNEL_GEOMETRY[channel]
        rng = np.random.default_rng(7)
        msg = rng.integers(0, 2, k1).astype(np.uint8)
        ecc = scr.extended_colour_code(260, 98, 5)
        tx = cc.encode_channel(msg, channel, ecc30=ecc)
        assert len(tx) == air
        res = cc.decode_channel_hard(jnp.asarray(tx), channel, ecc30=ecc)
        assert bool(res.crc_ok)
        np.testing.assert_array_equal(np.asarray(res.bits), msg)

    def test_wrong_scrambling_code_fails_crc(self):
        msg = np.random.default_rng(8).integers(0, 2, 60).astype(np.uint8)
        tx = cc.encode_channel(msg, "BSCH", ecc30=111)
        res = cc.decode_channel_hard(jnp.asarray(tx), "BSCH", ecc30=222)
        assert not bool(res.crc_ok)

    def test_noise_resilience_with_crc_gate(self):
        """A few channel bit errors are corrected; CRC still passes."""
        rng = np.random.default_rng(9)
        msg = rng.integers(0, 2, 268).astype(np.uint8)
        tx = cc.encode_channel(msg, "SCH/F", ecc30=0).astype(np.float32) * 2 - 1
        # stay within the punctured code's free-distance budget: a few
        # well-separated flips (clustered errors can defeat rate 2/3 K=5)
        flips = np.arange(4) * 100 + 13
        tx[flips] *= -1
        res = cc.decode_channel_soft(jnp.asarray(tx), "SCH/F", ecc30=0)
        assert bool(res.crc_ok)
        np.testing.assert_array_equal(np.asarray(res.bits), msg)

    def test_batched_chain(self):
        rng = np.random.default_rng(10)
        msgs = rng.integers(0, 2, (4, 124)).astype(np.uint8)
        tx = np.stack([cc.encode_channel(m, "SCH/HD") for m in msgs])
        res = cc.decode_channel_hard(jnp.asarray(tx), "SCH/HD")
        assert np.asarray(res.crc_ok).all()
        np.testing.assert_array_equal(np.asarray(res.bits), msgs)
