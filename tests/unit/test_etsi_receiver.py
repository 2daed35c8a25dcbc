"""etsi-profile receiver tests: rational resampler, true-rate symbol
recovery, and the full PHY round-trip (channel coding + modulation)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tetraear_tpu.models.receiver_etsi import EtsiReceiver
from tetraear_tpu.ops import channel_coding as cc
from tetraear_tpu.ops import resample
from tetraear_tpu.utils import synth


class TestRationalResample:
    @pytest.mark.parametrize("L,M", [(3, 10), (2, 5), (5, 7)])
    def test_matches_upfirdn_oracle(self, rng, L, M):
        from scipy.signal import firwin
        x = (rng.standard_normal(6000) + 1j * rng.standard_normal(6000)
             ).astype(np.complex64)
        taps = firwin(121, 0.8 / max(L, M)) * L
        got = np.asarray(resample.rational_resample(jnp.asarray(x), L, M, taps))
        # textbook upfirdn with center-delay compensation
        xu = np.zeros(len(x) * L, complex)
        xu[::L] = x
        full = np.convolve(xu, taps)
        delay = (len(taps) - 1) // 2
        want = full[delay: delay + len(x) * L: M]
        nn = min(len(got), len(want))
        rel = (np.linalg.norm(got[:nn] - want[:nn])
               / np.linalg.norm(want[:nn]))
        assert rel < 1e-5

    def test_output_rate(self):
        x = jnp.ones(24000, jnp.complex64)
        taps = resample.design_rrc_resampler(3, 10, 4)
        y = resample.rational_resample(x, 3, 10, taps)
        assert abs(y.shape[-1] - 7200) <= 3     # 24000 * 3/10


class TestEtsiReceiver:
    def test_true_rate_symbol_recovery(self):
        """2000 symbols at the TRUE 18 kHz grid recovered exactly — the
        capability the ref-compat chain structurally lacks (its integer-sps
        clock slips one symbol every ~40, SURVEY.md §6)."""
        rng = np.random.default_rng(0)
        syms = rng.integers(0, 4, 2000)
        x = synth.synthesize_iq(syms, 2.4e6, snr_db=30, mapping="pi4", seed=1)
        rx = EtsiReceiver()
        out = rx.process(x)
        n = min(len(out), len(syms))
        assert n >= 1990
        assert (out[:n] == syms[:n]).mean() == 1.0

    def test_ref_compat_slips_on_true_rate(self):
        """Contrast case documenting the reference's structural limit."""
        from tetraear_tpu.models.receiver import SignalProcessor
        rng = np.random.default_rng(0)
        syms = rng.integers(0, 4, 2000)
        x = synth.synthesize_iq(syms, 2.4e6, snr_db=30, mapping="pi4", seed=1)
        out = SignalProcessor().process(x)
        n = min(len(out), len(syms))
        agreement = (out[:n] == syms[:n]).mean()
        assert agreement < 0.9   # clock slip destroys long-run agreement

    def test_noise_resilience(self):
        rng = np.random.default_rng(3)
        syms = rng.integers(0, 4, 1000)
        x = synth.synthesize_iq(syms, 2.4e6, snr_db=12, mapping="pi4", seed=4)
        out = EtsiReceiver().process(x)
        n = min(len(out), len(syms))
        assert (out[:n] == syms[:n]).mean() > 0.97

    def test_soft_bits_shape_and_signs(self):
        rng = np.random.default_rng(5)
        syms = rng.integers(0, 4, 500)
        x = synth.synthesize_iq(syms, 2.4e6, snr_db=25, mapping="pi4", seed=6)
        res = EtsiReceiver()(x)
        count = int(res.count)
        soft = np.asarray(res.soft_bits)[:count - 1]
        hard = np.asarray(res.hard_symbols)[:count - 1]
        bits_from_soft = (soft > 0).astype(int)
        recon = bits_from_soft[:, 0] * 2 + bits_from_soft[:, 1]
        assert (recon == hard).mean() > 0.999


class TestFullPhyRoundTrip:
    def test_sch_f_over_the_air(self):
        """MAC bits -> channel encode (CRC+RCPC+interleave+scramble) ->
        pi/4-DQPSK at true 18 kHz -> etsi receive -> soft channel decode ->
        CRC verdict + exact MAC bits.  The complete ETSI PHY, end to end —
        the chain the reference explicitly skips (protocol.py:300)."""
        rng = np.random.default_rng(11)
        mac_bits = rng.integers(0, 2, 268).astype(np.uint8)
        ecc = 0
        air_bits = cc.encode_channel(mac_bits, "SCH/F", ecc30=ecc)   # (432,)

        # modulate: 432 bits -> 216 dibit symbols -> IQ with lead/tail syms
        lead = rng.integers(0, 4, 32)
        tail = rng.integers(0, 4, 32)
        syms = np.concatenate([lead, synth.bits_to_symbols(air_bits), tail])
        x = synth.synthesize_iq(syms, 2.4e6, snr_db=18, mapping="pi4", seed=12)

        rx = EtsiReceiver()
        res = rx(x)
        count = int(res.count)
        soft = np.asarray(res.soft_bits)[:count - 1].reshape(-1)  # bit LLRs
        hard = np.asarray(res.hard_symbols)[:count - 1]

        # locate the payload: the demod stream's alignment to the source
        # symbols depends on the chosen timing phase (±1 symbol), so search
        # the small lag window — the real pipeline does this via the
        # training-sequence sync correlation.
        best_lag, best_agree = 0, 0.0
        for lag in range(-2, 3):
            a = hard[max(0, lag):max(0, lag) + 200]
            b = syms[1 - min(0, lag):1 - min(0, lag) + len(a)]
            m = min(len(a), len(b))
            agree = (a[:m] == b[:m]).mean()
            if agree > best_agree:
                best_lag, best_agree = lag, agree
        assert best_agree > 0.99, best_agree
        # payload symbols occupy positions [32, 32+216) of syms ->
        # demod indices [31 + best_lag, ...)
        start = 31 + best_lag
        llrs = soft[2 * start: 2 * (start + 216)]
        assert llrs.shape[0] == 432
        res_dec = cc.decode_channel_soft(jnp.asarray(llrs), "SCH/F", ecc30=ecc)
        assert bool(res_dec.crc_ok)
        np.testing.assert_array_equal(np.asarray(res_dec.bits), mac_bits)
