"""Pallas kernel tests (interpret mode on the CPU test mesh; the same
kernels compile and run on real TPU — see the perf notes in the module
docstrings)."""

import numpy as np
import jax.numpy as jnp

from tetraear_tpu.ops import channelizer, fir
from tetraear_tpu.ops.pallas.fused_channelize import fused_channelize


class TestFusedChannelize:
    def test_matches_xla_path(self, rng):
        n = 512 * 10 * 4
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        offs = np.array([0.0, 25e3, -25e3, 50e3], np.float32)
        taps = fir.design_decimation_fir(10)
        want = np.asarray(channelizer.channelize(
            jnp.asarray(x), jnp.asarray(offs), 2.4e6, 10,
            taps=jnp.asarray(taps)))
        got = np.asarray(fused_channelize(jnp.asarray(x), offs, 2.4e6, 10,
                                          taps))
        assert got.shape == want.shape
        rel = (np.linalg.norm(got - want) / np.linalg.norm(want))
        assert rel < 2e-4

    def test_phase_continuity_across_chunks(self, rng):
        """Two chunked invocations with start_index must equal one big call."""
        n = 512 * 10 * 2
        x = (rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n)
             ).astype(np.complex64)
        offs = np.array([25e3], np.float32)
        taps = fir.design_decimation_fir(10)
        full = np.asarray(fused_channelize(jnp.asarray(x), offs, 2.4e6, 10,
                                           taps))
        a = np.asarray(fused_channelize(jnp.asarray(x[:n]), offs, 2.4e6, 10,
                                        taps, start_index=0))
        b = np.asarray(fused_channelize(jnp.asarray(x[n:]), offs, 2.4e6, 10,
                                        taps, start_index=n))
        # interiors match (edges differ by the zero-padded halo)
        m = n // 10
        core = slice(16, m - 16)
        np.testing.assert_allclose(a[:, core], full[:, :m][:, core],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(b[:, core], full[:, m:][:, core],
                                   rtol=1e-4, atol=1e-5)

    def test_shape_contract_enforced(self, rng):
        x = jnp.ones(1000, jnp.complex64)    # not a multiple of TILE_M*decim
        taps = fir.design_decimation_fir(10)
        try:
            fused_channelize(x, np.array([0.0], np.float32), 2.4e6, 10, taps)
            assert False, "expected assertion"
        except AssertionError:
            pass
