"""Timing / DQPSK / sync / CRC op tests against exact NumPy oracles that
mirror the reference algorithms (processor.py, decoder.py, protocol.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tetraear_tpu import constants as C
from tetraear_tpu.ops import timing, dqpsk, sync, crc


# --- NumPy oracles (reference semantics, written against SURVEY.md specs) ---

def oracle_best_phase(x, sps):
    """processor.py:186-215."""
    step = max(1, sps // 8)
    best_phase, max_power = 0, -1.0
    for phase in range(0, sps, step):
        num = (len(x) - phase) // sps
        if num <= 0:
            continue
        idx = phase + np.arange(num) * sps
        p = np.mean(np.abs(x[idx]) ** 2)
        if p > max_power:
            max_power, best_phase = p, phase
    num = (len(x) - best_phase) // sps
    return x[best_phase + np.arange(num) * sps], best_phase


def oracle_dqpsk(x):
    """processor.py:120-166."""
    if len(x) < 2:
        return np.zeros(0, np.uint8)
    m = np.abs(x).max()
    if m > 0:
        x = x / m
    out = []
    for prev, cur in zip(x[:-1], x[1:]):
        d = cur * np.conj(prev)
        ph = np.arctan2(d.imag, d.real)
        if ph < -5 * np.pi / 8:
            out.append(3)
        elif ph < -3 * np.pi / 8:
            out.append(2)
        elif ph < 3 * np.pi / 8:
            out.append(0)
        elif ph < 5 * np.pi / 8:
            out.append(1)
        else:
            out.append(3)
    return np.array(out, np.uint8)


def oracle_sync_corr(bits):
    """Dense best-of-TS1/TS2 match fraction at every position."""
    n = len(bits)
    L = 22
    out = np.zeros(n - L + 1, np.float32)
    for pos in range(n - L + 1):
        w = bits[pos:pos + L]
        c1 = np.sum(w == C.TS1) / L
        c2 = np.sum(w == C.TS2) / L
        out[pos] = max(c1, c2)
    return out


class TestTiming:
    def test_matches_oracle(self, rng):
        x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)
             ).astype(np.complex64)
        # plant a stronger phase
        x[7::13] *= 3.0
        got = timing.best_phase_pick(jnp.asarray(x), 13)
        want_syms, want_phase = oracle_best_phase(x, 13)
        assert int(got.best_phase) == want_phase
        assert int(got.count) == len(want_syms)
        np.testing.assert_allclose(
            np.asarray(got.symbols)[:len(want_syms)], want_syms, rtol=1e-5)

    def test_tie_breaks_to_first_phase(self):
        x = np.ones(130, np.complex64)
        got = timing.best_phase_pick(jnp.asarray(x), 13)
        # constant power: ref picks phase 0 on strict > comparisons... but
        # counts differ per phase: phase 0 has 10 symbols, all means equal ->
        # first max wins -> phase 0
        assert int(got.best_phase) == 0

    def test_batched(self, rng):
        x = (rng.standard_normal((4, 500)) + 1j * rng.standard_normal((4, 500))
             ).astype(np.complex64)
        got = timing.best_phase_pick(jnp.asarray(x), 13)
        for i in range(4):
            w, p = oracle_best_phase(x[i], 13)
            assert int(got.best_phase[i]) == p
            assert int(got.count[i]) == len(w)


class TestDQPSK:
    def test_matches_oracle_random(self, rng):
        x = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
             ).astype(np.complex64)
        got = np.asarray(dqpsk.demodulate_hard(jnp.asarray(x)))
        want = oracle_dqpsk(x)
        assert (got == want).mean() > 0.999  # f32 atan2 boundary ties only

    def test_clean_constellation_exact_etsi(self):
        """Synthesized ideal pi/4-DQPSK round-trips every symbol under the
        etsi quantizer (the reference bins cannot — see quirk test below)."""
        rng = np.random.default_rng(7)
        syms = rng.integers(0, 4, 1000)
        phases = np.array([np.pi / 4, 3 * np.pi / 4, -np.pi / 4, -3 * np.pi / 4])
        phi = np.cumsum(phases[syms])
        x = np.exp(1j * np.concatenate([[0.0], phi])).astype(np.complex64)
        got = np.asarray(dqpsk.demodulate_hard(jnp.asarray(x), profile="etsi"))
        np.testing.assert_array_equal(got, syms.astype(np.uint8))

    def test_ref_bins_quirk(self):
        """Documented reference quirk (processor.py:152-161): bins centered on
        {0, +-pi/2, pi} misread ideal -pi/4 transitions as 0 and +3pi/4 as 3."""
        dphi = jnp.asarray([np.pi / 4, 3 * np.pi / 4, -np.pi / 4, -3 * np.pi / 4],
                           jnp.float32)
        got = np.asarray(dqpsk.quantize_phase_ref(dphi))
        np.testing.assert_array_equal(got, [0, 3, 0, 3])
        etsi = np.asarray(dqpsk.quantize_phase_etsi(dphi))
        np.testing.assert_array_equal(etsi, [0, 1, 2, 3])

    def test_soft_signs_agree_with_hard(self, rng):
        x = (rng.standard_normal(2000) + 1j * rng.standard_normal(2000)
             ).astype(np.complex64)
        soft = dqpsk.demodulate_soft(jnp.asarray(x))
        hard = np.asarray(soft.symbols)
        bits_from_soft = (np.asarray(soft.soft_bits) > 0).astype(int)
        msb, lsb = bits_from_soft[..., 0], bits_from_soft[..., 1]
        agree = ((msb * 2 + lsb) == hard).mean()
        assert agree > 0.99

    def test_symbols_to_bits(self):
        s = jnp.asarray([0, 1, 2, 3], jnp.uint8)
        got = np.asarray(dqpsk.symbols_to_bits(s))
        np.testing.assert_array_equal(got, [0, 0, 0, 1, 1, 0, 1, 1])


class TestSync:
    def test_dense_correlation_matches_oracle(self, rng):
        bits = rng.integers(0, 2, 600).astype(np.uint8)
        bits[100:122] = C.TS1
        bits[400:422] = C.TS2
        got = np.asarray(sync.best_correlation(jnp.asarray(bits)))
        want = oracle_sync_corr(bits)
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert got[100] == 1.0 and got[400] == 1.0

    def test_short_input(self):
        got = sync.sync_correlation(jnp.zeros(10, jnp.uint8))
        assert got.shape[-1] == 0


class TestCRC:
    def test_scalar_known_value(self):
        # CRC-CCITT (0xFFFF init) of ASCII "123456789" is 0x29B1
        bits = np.unpackbits(np.frombuffer(b"123456789", np.uint8))
        assert crc.crc16_bits(bits) == 0x29B1

    def test_batch_matches_scalar(self, rng):
        frames = rng.integers(0, 2, (16, 200)).astype(np.uint8)
        got = np.asarray(crc.crc16_batch(jnp.asarray(frames)))
        for i in range(16):
            np.testing.assert_array_equal(got[i], crc.crc16_bits_arr(frames[i]))

    def test_soft_check_passes_valid_and_2bit_errors(self, rng):
        payload = rng.integers(0, 2, (8, 200)).astype(np.uint8)
        crcs = np.stack([crc.crc16_bits_arr(p) for p in payload])
        data = np.concatenate([payload, crcs], axis=1)
        ok = np.asarray(crc.soft_crc_check_batch(jnp.asarray(data)))
        assert ok.all()
        # flip 2 CRC bits -> still passes; flip 3 -> fails
        d2 = data.copy(); d2[:, -1] ^= 1; d2[:, -2] ^= 1
        assert np.asarray(crc.soft_crc_check_batch(jnp.asarray(d2))).all()
        d3 = d2.copy(); d3[:, -3] ^= 1
        assert not np.asarray(crc.soft_crc_check_batch(jnp.asarray(d3))).any()

    def test_soft_check_rejects_degenerate(self):
        assert not crc.soft_crc_check_host(np.zeros(216, np.uint8))
        assert not crc.soft_crc_check_host(np.ones(216, np.uint8))
        assert not crc.soft_crc_check_host(np.ones(8, np.uint8))

    def test_host_equals_batch(self, rng):
        data = rng.integers(0, 2, (32, 216)).astype(np.uint8)
        got = np.asarray(crc.soft_crc_check_batch(jnp.asarray(data)))
        want = np.array([crc.soft_crc_check_host(d) for d in data])
        np.testing.assert_array_equal(got, want)


class TestDenseSoftCrc:
    """ops/crc.soft_crc_dense == the windowed soft_crc_check_batch oracle
    at every position (the flagship multicarrier path's CRC gate)."""

    def test_matches_windowed_oracle_with_planted_frame(self, rng):
        import jax.numpy as jnp
        from tetraear_tpu.ops.crc import (soft_crc_check_batch,
                                          soft_crc_dense)
        from tetraear_tpu.utils.synth import make_mac_resource_frame_bits
        bits = rng.integers(0, 2, (3, 1500)).astype(np.uint8)
        frame = make_mac_resource_frame_bits(b"HELLO", seed=4)
        bits[1, 137:137 + 510] = frame

        dense = np.asarray(soft_crc_dense(jnp.asarray(bits)))
        p = 1500 - 229
        wins = np.stack([np.stack([row[s:s + 230] for s in range(p)])
                         for row in bits])
        data = np.concatenate([wins[..., 0:108], wins[..., 122:230]],
                              axis=-1)
        want = np.asarray(soft_crc_check_batch(jnp.asarray(data)))
        np.testing.assert_array_equal(dense, want)
        assert dense[1, 137]                 # the planted frame passes

    def test_short_and_degenerate_streams(self):
        import jax.numpy as jnp
        from tetraear_tpu.ops.crc import soft_crc_dense
        assert soft_crc_dense(jnp.zeros((2, 100), jnp.uint8)).shape == (2, 0)
        all0 = np.asarray(soft_crc_dense(jnp.zeros((1, 600), jnp.uint8)))
        all1 = np.asarray(soft_crc_dense(jnp.ones((1, 600), jnp.uint8)))
        assert not all0.any() and not all1.any()

    @pytest.mark.parametrize("fold,bf16", [(4, False), (4, True),
                                           (8, True), (1, True)])
    def test_folded_bf16_variants_bit_identical(self, rng, fold, bf16):
        """Output-folded / bf16 dense CRC == the legacy f32 stride-1
        program EXACTLY (bits and the 0/1 kernel are exact in bf16 and
        accumulation is f32, so the integer sums cannot differ) — incl.
        lengths where the folded position count is not a multiple of
        fold and a planted real frame."""
        import jax.numpy as jnp
        from tetraear_tpu.ops.crc import soft_crc_dense
        from tetraear_tpu.utils.synth import make_mac_resource_frame_bits
        for b in (701, 1024, 1500):
            bits = rng.integers(0, 2, (3, b)).astype(np.uint8)
            bits[1, 99:99 + 510] = make_mac_resource_frame_bits(
                b"HELLO", seed=4)
            legacy = np.asarray(soft_crc_dense(jnp.asarray(bits),
                                               fold=1, bf16=False))
            fast = np.asarray(soft_crc_dense(jnp.asarray(bits),
                                             fold=fold, bf16=bf16))
            np.testing.assert_array_equal(fast, legacy)
            assert legacy[1, 99]            # sanity: planted frame hits

    def test_env_variant_selection(self, rng, monkeypatch):
        import jax.numpy as jnp
        from tetraear_tpu.ops import crc as crc_mod
        bits = rng.integers(0, 2, (2, 800)).astype(np.uint8)
        want = np.asarray(crc_mod.soft_crc_dense(jnp.asarray(bits),
                                                 fold=1, bf16=False))
        monkeypatch.setenv("TETRAEAR_CRC_DENSE", "of4_bf16")
        got = np.asarray(crc_mod.soft_crc_dense(jnp.asarray(bits)))
        np.testing.assert_array_equal(got, want)
        monkeypatch.setenv("TETRAEAR_CRC_DENSE", "bogus")
        with pytest.raises(ValueError):
            crc_mod.soft_crc_dense(jnp.asarray(bits))
