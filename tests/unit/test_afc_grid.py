"""Multicarrier grid-comb AFC (ops/spectrum.estimate_grid_offset_hz):
recover the SHARED tuner offset of the 25 kHz channel grid from the
folded average spectrum, and the CLI --afc flag that applies it."""

import numpy as np
import pytest

from tetraear_tpu.ops.spectrum import estimate_grid_offset_hz
from tetraear_tpu.utils import synth


def _multicarrier_iq(offsets_hz, fs=2.4e6, seed0=1):
    x = None
    for i, off in enumerate(offsets_hz):
        st = synth.make_stream_bits(num_frames=4, lead_bits=64,
                                    seed=seed0 + i, golden=True)
        syms = synth.bits_to_symbols(st)
        ph = synth.synthesize_symbol_phasors(syms, mapping="ref")
        iq = synth.upsample_hold(ph, fs, fs / 130.0)
        if x is None:
            x = np.zeros(len(iq), np.complex64)
        t = np.arange(len(x)) / fs
        x += (iq[:len(x)] * np.exp(2j * np.pi * off * t)
              ).astype(np.complex64)
    return x


class TestGridOffsetEstimator:
    @pytest.mark.parametrize("ppm_hz", [-4000.0, -900.0, 1500.0, 3000.0])
    def test_recovers_shared_offset(self, ppm_hz):
        fs = 2.4e6
        x = _multicarrier_iq([-50e3, 0.0, 75e3], fs)
        t = np.arange(len(x)) / fs
        x = (x * np.exp(2j * np.pi * ppm_hz * t)).astype(np.complex64)
        est = estimate_grid_offset_hz(x, fs)
        # structured bursts have asymmetric spectra (sync/training fields)
        # so a few hundred Hz of bias is inherent; the demod tolerates
        # ~1 kHz residual, so pin the estimator inside one FFT bin (586 Hz)
        assert abs(est - ppm_hz) < 600.0, (est, ppm_hz)

    def test_zero_for_noise_only(self, rng):
        x = (rng.standard_normal(200_000)
             + 1j * rng.standard_normal(200_000)).astype(np.complex64)
        est = estimate_grid_offset_hz(x, 2.4e6)
        # no occupied bins stand 10 dB above the floor -> no estimate
        assert abs(est) < 12.5e3

    def test_short_input_is_safe(self):
        assert estimate_grid_offset_hz(np.zeros(100, np.complex64),
                                       2.4e6) == 0.0


class TestCliAfc:
    def test_decode_with_afc_recovers_offset_capture(self, tmp_path):
        """--carriers --afc decodes a +3 kHz-offset capture the plain
        path loses (observed live: 1/6 frames without, 6/6 with)."""
        import subprocess
        import sys
        fs = 2.4e6
        x = _multicarrier_iq([0.0], fs)
        t = np.arange(len(x)) / fs
        (x * np.exp(2j * np.pi * 3000.0 * t)).astype(np.complex64).tofile(
            tmp_path / "ppm.cf32")
        out = tmp_path / "frames.jsonl"
        r = subprocess.run(
            [sys.executable, "-m", "tetraear_tpu", "--platform", "cpu",
             "decode", str(tmp_path / "ppm.cf32"), "--carriers", "1",
             "--afc", "-o", str(out)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-500:]
        assert "[AFC] grid offset" in r.stdout
        import json
        frames = [json.loads(l) for l in open(out)]
        assert len(frames) >= 4, r.stdout[-400:]
