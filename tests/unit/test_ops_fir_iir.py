"""FIR/IIR op tests against scipy oracles."""

import numpy as np
import pytest
from scipy import signal as sps

import jax
import jax.numpy as jnp

from tetraear_tpu.ops import fir, iir


class TestIIRExact:
    def test_lfilter_matches_scipy_real(self, rng):
        b, a = sps.butter(4, 0.1)
        x = rng.standard_normal(4096).astype(np.float32)
        got = np.asarray(iir.lfilter(b, a, jnp.asarray(x)))
        want = sps.lfilter(b, a, x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_sosfilt_matches_scipy_complex_high_order(self, rng):
        """Order-8 cheby1 is unstable in f32 direct form; the SOS cascade
        must track scipy's float64 result."""
        b, a = sps.cheby1(8, 0.05, 0.08)
        sos = sps.tf2sos(b, a)
        x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
             ).astype(np.complex64)
        got = np.asarray(iir.sosfilt(sos, jnp.asarray(x)))
        want = sps.sosfilt(sos, x)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 1e-3

    def test_filtfilt_matches_scipy(self, rng):
        b, a = sps.butter(4, 0.10417)
        x = rng.standard_normal(4096).astype(np.float64)
        got = np.asarray(iir.filtfilt(b, a, jnp.asarray(x, dtype=jnp.float32)))
        want = sps.filtfilt(b, a, x)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)

    def test_decimate_exact_matches_scipy(self, noisy_carrier_iq):
        x = noisy_carrier_iq[:16384]
        got = np.asarray(iir.decimate_exact(jnp.asarray(x), 10))
        want = sps.decimate(x, 10)
        assert got.shape == want.shape
        # f32 vs f64 and an 8th-order IIR: allow loose elementwise tolerance
        err = np.abs(got - want) / (np.abs(want).mean() + 1e-12)
        assert np.median(err) < 1e-2


class TestFIRCompat:
    def test_decimate_shape_matches_scipy_grid(self, noisy_carrier_iq):
        x = noisy_carrier_iq[:10240]
        taps = fir.design_decimation_fir(10)
        got = np.asarray(fir.fir_decimate(jnp.asarray(x), jnp.asarray(taps), 10))
        want = sps.decimate(x, 10)
        assert got.shape == want.shape

    def test_decimate_tracks_iir_in_band(self, noisy_carrier_iq):
        """FIR-compat output must track the scipy IIR path closely on the
        block interior for an in-band signal."""
        x = noisy_carrier_iq[:16384]
        taps = fir.design_decimation_fir(10)
        got = np.asarray(fir.fir_decimate(jnp.asarray(x), jnp.asarray(taps), 10))
        want = sps.decimate(x, 10)
        core = slice(50, -50)
        num = np.linalg.norm(got[core] - want[core])
        den = np.linalg.norm(want[core])
        assert num / den < 0.05

    def test_channel_fir_tracks_butter_filtfilt(self, rng):
        fs = 240e3
        n = 8192
        t = np.arange(n) / fs
        x = (np.exp(2j * np.pi * 5e3 * t)
             + 0.1 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
             ).astype(np.complex64)
        cutoff = 12500 / (fs / 2)
        taps = fir.design_channel_fir(129, cutoff)
        got = np.asarray(fir.fir_filter_same(jnp.asarray(x), jnp.asarray(taps)))
        b, a = sps.butter(4, cutoff)
        want = sps.filtfilt(b, a, x)
        core = slice(200, -200)
        rel = (np.linalg.norm(got[core] - want[core])
               / np.linalg.norm(want[core]))
        assert rel < 0.05

    def test_halo_variant_equals_padded_interior(self, rng):
        """Overlap-save with true neighbour halos == unsharded filter."""
        x = (rng.standard_normal(4000) + 1j * rng.standard_normal(4000)
             ).astype(np.complex64)
        taps = jnp.asarray(fir.design_decimation_fir(10))
        G = (taps.shape[0] - 1) // 2
        full = np.asarray(fir.fir_decimate(jnp.asarray(x), taps, 10))
        # emulate a shard covering samples [1000, 3000) with halos
        shard = jnp.asarray(x[1000:3000])
        left = jnp.asarray(x[1000 - G:1000])
        right = jnp.asarray(x[3000:3000 + G])
        local = np.asarray(fir.fir_decimate_halo(shard, taps, 10, left, right))
        np.testing.assert_allclose(local, full[100:300], rtol=1e-4, atol=1e-5)

    def test_rrc_unit_energy(self):
        taps = fir.design_rrc(4, 0.35, 10)
        assert abs(np.sum(taps ** 2) - 1.0) < 1e-5
