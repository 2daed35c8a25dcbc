"""Native host-DSP engine (native/hostdsp.cpp via utils/native_dsp.py):
bit-exact parity with the pure-Python oracles, plus the graceful
degradation contract when the library is absent."""

import numpy as np
import pytest

from tetraear_tpu import constants as C
from tetraear_tpu.ops import crc
from tetraear_tpu.utils import native_dsp

pytestmark = pytest.mark.skipif(native_dsp.get_lib() is None,
                                reason="native hostdsp not built")


class TestCrcParity:
    @pytest.mark.parametrize("seed", range(6))
    def test_crc16_exact(self, seed):
        rng = np.random.default_rng(seed)
        for n in (1, 7, 16, 200, 510):
            bits = rng.integers(0, 2, n).astype(np.uint8)
            assert native_dsp.crc16_bits(bits) == crc.crc16_bits(bits)

    @pytest.mark.parametrize("seed", range(6))
    def test_soft_check_exact(self, seed):
        rng = np.random.default_rng(100 + seed)
        for _ in range(40):
            n = int(rng.integers(10, 250))
            bits = rng.integers(0, 2, n).astype(np.uint8)
            want = crc._py_soft_crc_check_host(bits)
            got = native_dsp.soft_crc_check(bits, C.CRC_SOFT_ERROR_BUDGET)
            assert got == want
        # degenerate + passing cases
        for bits in (np.zeros(50, np.uint8), np.ones(50, np.uint8)):
            assert native_dsp.soft_crc_check(
                bits, C.CRC_SOFT_ERROR_BUDGET) is False
        payload = rng.integers(0, 2, 200).astype(np.uint8)
        good = np.concatenate([payload, crc.crc16_bits_arr(payload)])
        assert native_dsp.soft_crc_check(good, C.CRC_SOFT_ERROR_BUDGET)

    def test_batch_matches_scalar(self):
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 2, (32, 216)).astype(np.uint8)
        got = native_dsp.soft_crc_check_batch(frames,
                                              C.CRC_SOFT_ERROR_BUDGET)
        want = np.array([crc._py_soft_crc_check_host(f) for f in frames])
        np.testing.assert_array_equal(got, want)


class TestConversions:
    def test_sc16q11(self):
        rng = np.random.default_rng(0)
        raw = rng.integers(-2048, 2048, 4096).astype(np.int16)
        got = native_dsp.sc16q11_to_cf32(raw)
        iq = raw.astype(np.float32).reshape(-1, 2) / 2048.0
        want = (iq[:, 0] + 1j * iq[:, 1]).astype(np.complex64)
        np.testing.assert_array_equal(got, want)

    def test_fm_discriminator(self):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(5000)
             + 1j * rng.standard_normal(5000)).astype(np.complex64)
        got = native_dsp.fm_discriminator(x)
        want = (np.angle(x[1:] * np.conj(x[:-1])) / np.pi * 0.5
                ).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestIntegration:
    def test_soft_crc_check_host_uses_native(self):
        """ops/crc.soft_crc_check_host verdicts are unchanged with the
        native fast path in front."""
        rng = np.random.default_rng(7)
        for _ in range(30):
            bits = rng.integers(0, 2, 216).astype(np.uint8)
            assert (crc.soft_crc_check_host(bits)
                    == crc._py_soft_crc_check_host(bits))
