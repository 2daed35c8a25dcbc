"""NumPy/SciPy oracle reproducing the reference DSP semantics.

This mirrors tetraear/signal/processor.py:221-273 behavior using the same
scipy primitives the reference calls (decimate, butter, filtfilt) — the
acceptance anchor for the ref-* profiles.  Fresh implementation against the
SURVEY.md behavioral spec; no reference code copied.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sps


def oracle_process(samples: np.ndarray, sample_rate: float = 2.4e6,
                   freq_offset: float = 0.0):
    """Returns (demodulated_uint8, complex_symbols, best_phase)."""
    samples = np.asarray(samples)
    target = 240_000
    rate = sample_rate
    if rate > target * 2:
        d = int(rate / target)
        if d > 1:
            samples = sps.decimate(samples, d)
            rate = rate / d
    if freq_offset != 0:
        t = np.arange(len(samples)) / rate
        samples = samples * np.exp(-2j * np.pi * freq_offset * t)
    cutoff = min(0.99, max(0.01, (25000 / 2) / (rate / 2)))
    b, a = sps.butter(4, cutoff, btype="low")
    samples = sps.filtfilt(b, a, samples)

    spsym = int(rate / 18000)
    if spsym > 1:
        step = max(1, spsym // 8)
        best_phase, max_power = 0, -1.0
        for phase in range(0, spsym, step):
            num = (len(samples) - phase) // spsym
            if num <= 0:
                continue
            idx = phase + np.arange(num) * spsym
            p = np.mean(np.abs(samples[idx]) ** 2)
            if p > max_power:
                max_power, best_phase = p, phase
        num = (len(samples) - best_phase) // spsym
        symbols = samples[best_phase + np.arange(num) * spsym]
    else:
        best_phase = 0
        symbols = samples

    demod = oracle_dqpsk(symbols)
    return demod, symbols, best_phase


def oracle_dqpsk(x: np.ndarray) -> np.ndarray:
    if len(x) < 2:
        return np.zeros(0, np.uint8)
    m = np.abs(x).max()
    if m > 0:
        x = x / m
    d = x[1:] * np.conj(x[:-1])
    ph = np.arctan2(d.imag, d.real)
    out = np.full(ph.shape, 3, np.uint8)
    out[(ph >= -5 * np.pi / 8) & (ph < -3 * np.pi / 8)] = 2
    out[(ph >= -3 * np.pi / 8) & (ph < 3 * np.pi / 8)] = 0
    out[(ph >= 3 * np.pi / 8) & (ph < 5 * np.pi / 8)] = 1
    return out
