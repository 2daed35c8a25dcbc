"""Conformance: SignalProcessor decisions vs the scipy reference oracle."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from oracle_ref import oracle_process  # noqa: E402

from tetraear_tpu.config import ReceiverConfig
from tetraear_tpu.models.receiver import SignalProcessor
from tetraear_tpu.utils import synth


@pytest.fixture(scope="module")
def fixture_iq():
    """~0.5 s of noisy pi/4-DQPSK at 15 dB SNR with 5 kHz offset."""
    rng = np.random.default_rng(11)
    syms = rng.integers(0, 4, 2000)
    return synth.synthesize_iq(syms, freq_offset_hz=5e3, snr_db=15, seed=5)


class TestRefExact:
    def test_symbol_decisions_match_oracle(self, fixture_iq):
        sp = SignalProcessor(config=ReceiverConfig(profile="ref-exact"))
        got = sp.process(fixture_iq, freq_offset=5e3)
        want, want_syms, want_phase = oracle_process(
            fixture_iq, freq_offset=5e3)
        assert len(got) == len(want)
        agreement = (got == want).mean()
        assert agreement >= 0.999, f"agreement {agreement}"
        # side-channel symbols match too
        assert len(sp.symbols) == len(want_syms)

    def test_no_offset_path(self, fixture_iq):
        sp = SignalProcessor(config=ReceiverConfig(profile="ref-exact"))
        got = sp.process(fixture_iq)
        want, _, _ = oracle_process(fixture_iq)
        assert (got == want).mean() >= 0.999


class TestRefCompat:
    def test_symbol_decisions_track_oracle(self, fixture_iq):
        """FIR fast path: decision-level agreement within the SNR bound
        (BASELINE.md conformance criterion)."""
        sp = SignalProcessor(config=ReceiverConfig(profile="ref-compat"))
        got = sp.process(fixture_iq, freq_offset=5e3)
        want, _, _ = oracle_process(fixture_iq, freq_offset=5e3)
        n = min(len(got), len(want))
        assert n > 0
        agreement = (got[:n] == want[:n]).mean()
        assert agreement >= 0.97, f"agreement {agreement}"

    def test_empty_input(self):
        sp = SignalProcessor()
        out = sp.process(np.array([], dtype=np.complex64))
        assert out.size == 0 and sp.symbols.size == 0

    def test_stage_api_parity(self, fixture_iq):
        """Individual stage methods exist with reference signatures
        (exercised by the reference unit suite, SURVEY.md §4)."""
        sp = SignalProcessor()
        x = fixture_iq[:4096]
        r = sp.resample(x, 240e3)
        assert len(r) == int(len(x) * 240e3 / 2.4e6)
        f = sp.filter_signal(x, bandwidth=25000)
        assert f.shape == x.shape
        s = sp.frequency_shift(x, 1e3)
        assert s.shape == x.shape
        sy = sp.extract_symbols(x)
        assert sy.dtype.kind == "c"
        d = sp.demodulate_dqpsk(sy)
        assert d.dtype == np.uint8 and len(d) == max(0, len(sy) - 1)


class TestGoldenRoundTrip:
    def test_known_bits_recover_through_chain(self):
        """End-to-end golden: a clean signal whose symbol period is exactly
        130 capture samples (13 samples post-decimation — the grid the
        integer-sps picker expects) must round-trip all symbols through the
        ref-compat chain with the ref-friendly transition mapping."""
        rng = np.random.default_rng(3)
        syms = rng.integers(0, 4, 800)
        symbol_rate = 2.4e6 / 130.0
        phasors = synth.synthesize_symbol_phasors(syms, mapping="ref")
        x = synth.upsample_hold(phasors, 2.4e6, symbol_rate).astype(np.complex64)
        sp = SignalProcessor(config=ReceiverConfig(profile="ref-compat"))
        got = sp.process(x)
        n = min(len(got), len(syms))
        assert n >= len(syms) - 2
        agreement = (got[:n] == syms[:n]).mean()
        assert agreement >= 0.995, f"agreement {agreement}"
