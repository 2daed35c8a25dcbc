"""Traffic-channel coding chains (TCH/7.2, TCH/4.8, TCH/2.4, TCH/S):
rates, N-burst interleaving, noise resilience, and the vocoder soft-bit
contract.  Capability beyond the reference (it never channel-decodes,
protocol.py:300)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tetraear_tpu.ops import channel_coding as cc
from tetraear_tpu.ops import interleave as il
from tetraear_tpu.ops import viterbi as vit


def _llr(bits, flip=None, rng=None):
    x = np.asarray(bits).astype(np.float32) * 2 - 1
    if flip is not None:
        idx = rng.choice(x.size, flip, replace=False)
        x.reshape(-1)[idx] *= -1
    return jnp.asarray(x)


class TestSpecPuncturing:
    @pytest.mark.parametrize("n_in,n_out", [(292, 432), (148, 432),
                                            (80, 120)])
    def test_indices_strictly_increasing_in_range(self, n_in, n_out):
        idx = vit.puncture_indices_spec(n_in, n_out)
        assert idx.size == n_out
        assert np.all(np.diff(idx) > 0)
        assert idx[0] >= 0 and idx[-1] < 4 * n_in

    def test_spec_index_vectors(self):
        """Pin the §8.2.3.1.3 k(j) values (0-based): k(j) =
        8*floor((i-1)/t) + P(i - t*floor((i-1)/t)) - 1 with the spec's
        (t, P, i-map) per scheme."""
        # rate 2/3: t=3, P=(1,2,5), i=j -> 0,1,4, 8,9,12, 16,...
        idx = vit.puncture_indices_spec(80, 120)
        np.testing.assert_array_equal(idx[:9],
                                      [0, 1, 4, 8, 9, 12, 16, 17, 20])
        # TCH/4.8 292->432: i = j + (j-1)//65 -> first skip lands at j=66
        idx = vit.puncture_indices_spec(292, 432)
        np.testing.assert_array_equal(idx[:6], [0, 1, 4, 8, 9, 12])
        assert idx[64] == 8 * 21 + 1          # j=65: i=65 -> P(2)
        assert idx[65] == 8 * 22 + 0          # j=66: i=67 -> P(1)
        assert idx[-1] == 1164 and (idx[-1] // 4) + 1 == 292
        # TCH/2.4 148->432: t=6, P=(1,2,3,5,6,7), i = j + (j-1)//35
        idx = vit.puncture_indices_spec(148, 432)
        np.testing.assert_array_equal(idx[:8], [0, 1, 2, 4, 5, 6, 8, 9])
        assert idx[-1] == 590 and (idx[-1] // 4) + 1 == 148

    def test_unknown_rate_raises(self):
        with pytest.raises(ValueError):
            vit.puncture_indices_spec(100, 177)

    # measured correction floors for the spec tables (8-trial sweeps):
    # rate 292/432 cleans ~1.4% coded BER, rate 148/432 cleans >8.8%
    @pytest.mark.parametrize("k1,flips", [(288, 6), (144, 30)])
    def test_punctured_round_trip_clean_and_noisy(self, k1, flips):
        rng = np.random.default_rng(k1)
        bits = rng.integers(0, 2, k1).astype(np.uint8)
        coded = vit.encode_punctured(bits, 432)
        assert coded.shape == (432,)
        out = vit.decode_punctured(_llr(coded), k1 + 4)
        np.testing.assert_array_equal(np.asarray(out), bits)
        out = vit.decode_punctured(_llr(coded, flip=flips, rng=rng), k1 + 4)
        np.testing.assert_array_equal(np.asarray(out), bits)

    def test_rate_2_3_spec_matches_control_path(self):
        """puncture_indices_spec at plain 2/3 equals the control-channel
        puncturer used everywhere else (same spec row)."""
        np.testing.assert_array_equal(vit.puncture_indices_spec(80, 120),
                                      vit.puncture_indices(80))


class TestMultiburstInterleave:
    @pytest.mark.parametrize("depth", [1, 4, 8])
    def test_round_trip(self, depth):
        rng = np.random.default_rng(depth)
        blocks = rng.integers(0, 2, (6, 432)).astype(np.uint8)
        mixed = il.interleave_multiburst(blocks, depth)
        assert mixed.shape == (6 + depth - 1, 432)
        back = il.deinterleave_multiburst(mixed, depth)
        np.testing.assert_array_equal(back, blocks)

    def test_depth1_matches_block_interleaver(self):
        rng = np.random.default_rng(0)
        blocks = rng.integers(0, 2, (3, 432)).astype(np.uint8)
        a = il.interleave_multiburst(blocks, 1)
        b = np.asarray(il.interleave(jnp.asarray(blocks), "SCH/F"))
        np.testing.assert_array_equal(a, b)

    def test_diagonal_spread(self):
        # one block's bits must land in `depth` consecutive burst blocks
        blocks = np.zeros((1, 432), np.uint8)
        blocks[0] = 1
        mixed = il.interleave_multiburst(blocks, 4)
        per_burst = mixed.sum(axis=1)
        assert per_burst.shape[0] == 4
        assert np.all(per_burst == 108)      # 432/4 per burst


class TestTchChains:
    @pytest.mark.parametrize("channel", ["TCH/7.2", "TCH/4.8", "TCH/2.4"])
    def test_clean_round_trip(self, channel):
        k1, _ = cc.TCH_GEOMETRY[channel]
        rng = np.random.default_rng(1)
        blocks = rng.integers(0, 2, (4, k1)).astype(np.uint8)
        air = cc.encode_tch(blocks, channel, ecc30=1234)
        out = cc.decode_tch_soft(_llr(air), channel, ecc30=1234)
        np.testing.assert_array_equal(np.asarray(out), blocks)

    @pytest.mark.parametrize("channel,flips", [("TCH/4.8", 8),
                                               ("TCH/2.4", 30)])
    def test_coded_tch_corrects_errors(self, channel, flips):
        k1, _ = cc.TCH_GEOMETRY[channel]
        rng = np.random.default_rng(2)
        blocks = rng.integers(0, 2, (3, k1)).astype(np.uint8)
        air = cc.encode_tch(blocks, channel, ecc30=7)
        noisy = _llr(air, flip=flips, rng=rng)
        out = cc.decode_tch_soft(noisy, channel, ecc30=7)
        errs = int(np.sum(np.asarray(out) != blocks))
        assert errs <= 2, f"{errs} residual errors after {flips} flips"

    # a full-burst fade spreads into 432/depth erasures per coded block:
    # 25% erasures needs the rate-0.343 code; 12.5% is fine at rate 0.676
    @pytest.mark.parametrize("channel,depth", [("TCH/2.4", 4),
                                               ("TCH/4.8", 8)])
    def test_deep_interleave_shrugs_off_burst_erasure(self, channel, depth):
        k1, _ = cc.TCH_GEOMETRY[channel]
        rng = np.random.default_rng(3)
        blocks = rng.integers(0, 2, (6, k1)).astype(np.uint8)
        air = cc.encode_tch(blocks, channel, depth=depth)
        llrs = np.array(_llr(air))
        llrs[2] = 0.0                          # one burst fully erased
        out = cc.decode_tch_soft(jnp.asarray(llrs), channel, depth=depth)
        errs = int(np.sum(np.asarray(out) != blocks))
        assert errs == 0

    def test_depth1_burst_erasure_fails_where_deep_succeeds(self):
        k1, _ = cc.TCH_GEOMETRY["TCH/4.8"]
        rng = np.random.default_rng(4)
        blocks = rng.integers(0, 2, (6, k1)).astype(np.uint8)
        air = cc.encode_tch(blocks, "TCH/4.8", depth=1)
        llrs = np.array(_llr(air))
        llrs[2] = 0.0
        out = cc.decode_tch_soft(jnp.asarray(llrs), "TCH/4.8", depth=1)
        errs = int(np.sum(np.asarray(out)[2] != blocks[2]))
        assert errs > 10                       # whole block lost

    def test_tch_s_soft_passthrough(self):
        rng = np.random.default_rng(5)
        voc = rng.integers(0, 2, (2, 432)).astype(np.uint8)
        air = cc.encode_tch(voc, "TCH/S", ecc30=42)
        soft = cc.decode_tch_soft(_llr(air), "TCH/S", ecc30=42)
        assert soft.shape == (2, 432)
        # soft values preserve sign == vocoder bits, magnitudes intact
        np.testing.assert_array_equal((np.asarray(soft) > 0).astype(np.uint8),
                                      voc)
        assert np.allclose(np.abs(np.asarray(soft)), 1.0)

    def test_tch_s_feeds_codec_block(self):
        from tetraear_tpu.audio.blocks import block_from_soft_llrs, \
            validate_block
        rng = np.random.default_rng(6)
        voc = rng.integers(0, 2, (1, 432)).astype(np.uint8)
        air = cc.encode_tch(voc, "TCH/S", ecc30=9)
        soft = cc.decode_tch_soft(_llr(air), "TCH/S", ecc30=9)
        block = block_from_soft_llrs(np.asarray(soft)[0])
        assert validate_block(block)
