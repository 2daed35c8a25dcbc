"""The `etsi` quality receiver (north-star profile).

Chain: decimate 2.4 MS/s -> 240 kHz (shared FIR front end) -> polyphase
rational resample x3/10 with an RRC matched filter -> 72 kHz = exactly
4 samples/symbol on the TRUE 18 kHz TETRA grid -> energy-max symbol timing
over the 4 phases -> soft pi/4-DQPSK demod (maximum-margin quantizer +
per-bit LLRs) -> soft bits for the full channel-decode chain
(ops/channel_coding.py).

Unlike `ref-compat` (which reproduces the reference's truncated-sps clock
that slips ~1 symbol per 40), this profile tracks real TETRA transmissions
indefinitely — the capability gap called out in SURVEY.md §6.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tetraear_tpu import constants as C
from tetraear_tpu.config import ReceiverConfig
from tetraear_tpu.ops import dqpsk, fir, resample, sync, timing


class EtsiDemodResult(NamedTuple):
    symbols_iq: jnp.ndarray   # (M,) complex64 at symbol rate (padded)
    hard_symbols: jnp.ndarray  # (M-1,) uint8, etsi quantizer
    soft_bits: jnp.ndarray    # (M-1, 2) float32 LLR-ish in [-1, 1]
    bits: jnp.ndarray         # (2*(M-1),) uint8
    sync_corr: jnp.ndarray    # dense TS1/TS2 scores
    count: jnp.ndarray        # () int32
    best_phase: jnp.ndarray   # () int32 — timing phase in [0, sps)


def _etsi_block(iq: jnp.ndarray, freq_offset, cfg: ReceiverConfig):
    decim = cfg.decimation_factor
    taps_d = jnp.asarray(fir.design_decimation_fir(
        decim, cfg.decim_fir_taps_per_phase))
    y = fir.fir_decimate(iq, taps_d, decim) if decim > 1 else iq
    if not isinstance(freq_offset, (int, float)) or freq_offset != 0.0:
        from tetraear_tpu.ops.ddc import frequency_shift
        y = frequency_shift(y, freq_offset, cfg.intermediate_rate_hz)

    # 240 kHz -> 72 kHz with RRC matched filtering (L=3, M=10)
    sps_out = cfg.etsi_sps
    taps_r = resample.design_rrc_resampler(3, 10, sps_out, cfg.rrc_alpha,
                                           cfg.rrc_span_symbols)
    z = resample.rational_resample(y, 3, 10, taps_r)

    ts = timing.best_phase_pick(z, sps_out, step=1)
    soft = dqpsk.demodulate_soft(ts.symbols)
    bits = dqpsk.symbols_to_bits(soft.symbols)
    corr = sync.best_correlation(bits)
    return EtsiDemodResult(ts.symbols, soft.symbols, soft.soft_bits, bits,
                           corr, ts.count, ts.best_phase)


class EtsiReceiver:
    """Jit-cached etsi-profile demodulator."""

    def __init__(self, config: ReceiverConfig | None = None):
        import dataclasses
        base = config or ReceiverConfig()
        if base.profile != "etsi":
            base = dataclasses.replace(base, profile="etsi")
        self.config = base

    @functools.lru_cache(maxsize=8)
    def _compiled(self, n: int):
        cfg = self.config

        @jax.jit
        def run(iq, freq_offset):
            return _etsi_block(iq, freq_offset, cfg)
        return run

    def __call__(self, iq, freq_offset: float = 0.0) -> EtsiDemodResult:
        from tetraear_tpu.utils.backend import ensure_complex_on_device
        iq = ensure_complex_on_device(iq)
        return self._compiled(iq.shape[-1])(iq, jnp.float32(freq_offset))

    def process(self, iq, freq_offset: float = 0.0) -> np.ndarray:
        """SignalProcessor-compatible hard-symbol surface."""
        res = self(iq, freq_offset)
        count = int(res.count)
        if count < 2:
            return np.array([], dtype=np.uint8)
        return np.asarray(res.hard_symbols)[:count - 1]

    def __hash__(self):
        return hash(self.config)

    def __eq__(self, other):
        return isinstance(other, EtsiReceiver) and self.config == other.config
