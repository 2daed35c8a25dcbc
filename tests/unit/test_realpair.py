"""Real-pair (complex-free, transcendental-free) pipeline tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from tetraear_tpu.models.multicarrier import MulticarrierFrontend
from tetraear_tpu.models.realpair import RealPairFrontend, mixer_table
from tetraear_tpu.ops import dqpsk
from tetraear_tpu.utils import synth


class TestZQuantizers:
    def test_z_ref_matches_atan2_path(self, rng):
        z = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
             ).astype(np.complex64)
        dphi = np.arctan2(z.imag, z.real)
        want = np.asarray(dqpsk.quantize_phase_ref(jnp.asarray(dphi)))
        got = np.asarray(dqpsk.quantize_z_ref(jnp.asarray(z.real),
                                              jnp.asarray(z.imag)))
        assert (got == want).mean() > 0.999     # boundary fp ties only

    def test_z_etsi_matches_atan2_path(self, rng):
        z = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
             ).astype(np.complex64)
        dphi = np.arctan2(z.imag, z.real)
        want = np.asarray(dqpsk.quantize_phase_etsi(jnp.asarray(dphi)))
        got = np.asarray(dqpsk.quantize_z_etsi(jnp.asarray(z.real),
                                               jnp.asarray(z.imag)))
        assert (got == want).mean() > 0.999


class TestMixerTable:
    def test_periodicity_and_values(self):
        offs = np.array([0.0, 25e3, -50e3], np.float32)
        table = mixer_table(offs, 2.4e6)
        assert table.shape == (2, 3, 96)
        # channel 0: DC -> cos=1, sin=0
        np.testing.assert_allclose(table[0, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(table[1, 0], 0.0, atol=1e-6)
        # 25 kHz at 2.4 MS/s: one full cycle per 96 samples
        np.testing.assert_allclose(table[0, 1, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(table[0, 1, 48], -1.0, atol=1e-5)

    def test_off_grid_rejected(self):
        with pytest.raises(AssertionError):
            mixer_table(np.array([12.5e3], np.float32), 2.4e6)


class TestRealPairEquivalence:
    def test_bit_identical_to_complex_pipeline(self):
        fs = 2.4e6
        st = synth.make_stream_bits(num_frames=4, lead_bits=64, seed=2,
                                    golden=True)
        syms = synth.bits_to_symbols(st)
        ph = synth.synthesize_symbol_phasors(syms, mapping="ref")
        iq = synth.upsample_hold(ph, fs, fs / 130.0)
        n = (len(iq) // 96) * 96
        t = np.arange(n) / fs
        rng = np.random.default_rng(0)
        x = (iq[:n] * np.exp(2j * np.pi * 25e3 * t)).astype(np.complex64)
        x += 0.02 * (rng.standard_normal(n)
                     + 1j * rng.standard_normal(n)).astype(np.complex64)
        offsets = np.array([0.0, 25e3, -25e3, 50e3], np.float32)

        rp = RealPairFrontend()(x, offsets)
        mc = MulticarrierFrontend()(x, offsets)
        cnt_rp = np.asarray(rp.count)
        cnt_mc = np.asarray(mc.count)
        np.testing.assert_array_equal(cnt_rp, cnt_mc)
        bits_rp = np.asarray(rp.bits)
        bits_mc = np.asarray(mc.bits)
        for c in range(4):
            nb = 2 * (int(cnt_rp[c]) - 1)
            assert (bits_rp[c, :nb] == bits_mc[c, :nb]).mean() == 1.0, c

    def test_candidates_stage_matches_multicarrier(self):
        """k>0 appends extract_candidates: full-decode outputs (positions,
        correlations, frame windows, CRC verdicts) must equal the complex
        MulticarrierFrontend's on the same grid-locked carriers."""
        fs = 2.4e6
        st = synth.make_stream_bits(num_frames=4, lead_bits=64, seed=2,
                                    golden=True)
        syms = synth.bits_to_symbols(st)
        ph = synth.synthesize_symbol_phasors(syms, mapping="ref")
        iq = synth.upsample_hold(ph, fs, fs / 130.0)
        n = (len(iq) // 96) * 96
        t = np.arange(n) / fs
        rng = np.random.default_rng(0)
        x = (iq[:n] * np.exp(2j * np.pi * 25e3 * t)).astype(np.complex64)
        x += 0.02 * (rng.standard_normal(n)
                     + 1j * rng.standard_normal(n)).astype(np.complex64)
        offsets = np.array([0.0, 25e3, -25e3], np.float32)

        rp = RealPairFrontend(num_candidates=16, threshold=0.8)(x, offsets)
        mc = MulticarrierFrontend(num_candidates=16, threshold=0.8)(
            x, offsets)
        np.testing.assert_array_equal(np.asarray(rp.cand_pos),
                                      np.asarray(mc.cand_pos))
        np.testing.assert_allclose(np.asarray(rp.cand_corr),
                                   np.asarray(mc.cand_corr), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(rp.cand_valid),
                                      np.asarray(mc.cand_valid))
        np.testing.assert_array_equal(np.asarray(rp.frame_bits),
                                      np.asarray(mc.frame_bits))
        np.testing.assert_array_equal(np.asarray(rp.crc_ok),
                                      np.asarray(mc.crc_ok))
        # the signal carrier (25 kHz) must actually produce CRC-valid hits
        assert np.asarray(rp.crc_ok)[1][np.asarray(rp.cand_valid)[1]].any()

    def test_pfb_realpair_matches_complex_pfb(self, rng):
        """ops/pfb.pfb_channelize_realpair (IDFT-as-matmul) == complex
        pfb_channelize to f32 matmul-vs-fft rounding."""
        from tetraear_tpu.ops import pfb
        n = 96 * 400
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        yc = np.asarray(pfb.pfb_channelize(jnp.asarray(x), 96, 10,
                                           chunk=512))
        x_ri = jnp.asarray(np.stack([x.real, x.imag]).astype(np.float32))
        yp = np.asarray(pfb.pfb_channelize_realpair(x_ri, 96, 10,
                                                    chunk=512))
        np.testing.assert_allclose(yp[0], yc.real, atol=2e-3)
        np.testing.assert_allclose(yp[1], yc.imag, atol=2e-3)

    def test_pfb_frontend_decision_equivalence(self):
        """RealPairPfbFrontend decodes the same frames as the complex
        PfbMulticarrierFrontend (decision level; quantizer boundaries may
        flip isolated noise bits)."""
        from tetraear_tpu.models.multicarrier import PfbMulticarrierFrontend
        from tetraear_tpu.models.realpair import RealPairPfbFrontend
        fs = 2.4e6
        st = synth.make_stream_bits(num_frames=4, lead_bits=64, seed=2,
                                    golden=True)
        syms = synth.bits_to_symbols(st)
        ph = synth.synthesize_symbol_phasors(syms, mapping="ref")
        iq = synth.upsample_hold(ph, fs, fs / 130.0)
        n = (len(iq) // 96) * 96
        t = np.arange(n) / fs
        x = (iq[:n] * np.exp(2j * np.pi * 50e3 * t)).astype(np.complex64)

        rp = RealPairPfbFrontend(num_candidates=16, threshold=0.8)(x)
        mc = PfbMulticarrierFrontend(num_candidates=16, threshold=0.8)(x)
        np.testing.assert_array_equal(np.asarray(rp.count),
                                      np.asarray(mc.count))
        # signal lands in channel 2 (+50 kHz, fftfreq order)
        ch = 2
        nb = 2 * (int(np.asarray(rp.count)[ch]) - 1)
        agree = (np.asarray(rp.bits)[ch, :nb]
                 == np.asarray(mc.bits)[ch, :nb]).mean()
        assert agree > 0.999, agree
        # both find CRC-valid frames on the signal channel
        for res in (rp, mc):
            ok = np.asarray(res.crc_ok)[ch][np.asarray(res.cand_valid)[ch]]
            assert ok.any(), res.__class__.__name__

    def test_decodes_through_standard_host_decoder(self):
        import types
        from tetraear_tpu.models.multicarrier import MulticarrierDecoder
        fs = 2.4e6
        st = synth.make_stream_bits(num_frames=4, lead_bits=64, seed=2,
                                    golden=True)
        syms = synth.bits_to_symbols(st)
        ph = synth.synthesize_symbol_phasors(syms, mapping="ref")
        iq = synth.upsample_hold(ph, fs, fs / 130.0)
        n = (len(iq) // 96) * 96
        x = iq[:n].astype(np.complex64)
        res = RealPairFrontend()(x, np.array([0.0], np.float32))
        fake = types.SimpleNamespace(bits=res.bits, sync_corr=res.sync_corr,
                                     count=res.count)
        per = MulticarrierDecoder(1, auto_decrypt=False).decode(fake)
        texts = {f.get("sds_message") for f in per[0]}
        assert "[TXT] HELLO HELLO" in texts
