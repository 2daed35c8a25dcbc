"""Spectrum estimation, signal detection and AFC peak tracking.

Device-side replacements for the reference's per-chunk spectrum path
(ui/modern.py:1928-2019): 2048-point Hann FFT in dBFS, in-band/out-of-band
power statistics, SNR gating and AFC peak-offset estimation — all batched so
a whole waterfall column stack or a scan sweep computes in one launch.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tetraear_tpu import constants as C


def spectrum_dbfs(x: jnp.ndarray, n_fft: int = C.SPECTRUM_FFT_SIZE
                  ) -> jnp.ndarray:
    """Hann-windowed power spectrum in dBFS, fftshifted.

    x: (..., N) complex with N >= n_fft; uses the first n_fft samples per row
    (modern.py:1929-1941).  Returns (..., n_fft) float32.
    """
    seg = x[..., :n_fft]
    win = jnp.asarray(np.hanning(n_fft), dtype=jnp.float32)
    f = jnp.fft.fftshift(jnp.fft.fft(seg * win), axes=-1)
    return (20.0 * jnp.log10(jnp.abs(f) / n_fft + 1e-20)).astype(jnp.float32)


def spectrum_frames_dbfs(x: jnp.ndarray, n_fft: int = C.SPECTRUM_FFT_SIZE,
                         hop: int | None = None) -> jnp.ndarray:
    """Waterfall: frame the signal and compute a spectrum per frame.

    x: (N,) complex -> (num_frames, n_fft) float32.
    """
    if hop is None:
        hop = n_fft
    n = x.shape[-1]
    num = max(0, (n - n_fft) // hop + 1)
    idx = jnp.arange(num)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return spectrum_dbfs(x[idx], n_fft)


def fft_freqs(n_fft: int, sample_rate_hz: float) -> np.ndarray:
    """fftshifted baseband bin frequencies (modern.py:1936)."""
    return np.fft.fftshift(np.fft.fftfreq(n_fft, 1.0 / sample_rate_hz))


class DetectionResult(NamedTuple):
    signal_present: jnp.ndarray   # bool
    signal_power: jnp.ndarray     # mean in-band dBFS
    peak_power: jnp.ndarray       # max in-band dBFS
    noise_floor: jnp.ndarray      # mean out-of-band dBFS
    snr: jnp.ndarray
    afc_offset_hz: jnp.ndarray    # peak bin baseband frequency


def detect_signal(power_db: jnp.ndarray, sample_rate_hz: float,
                  n_fft: int = C.SPECTRUM_FFT_SIZE,
                  bandwidth_hz: float = C.CHANNEL_BANDWIDTH_HZ
                  ) -> DetectionResult:
    """Reference chunk-level signal gate (modern.py:1952-2010).

    power_db: (..., n_fft) fftshifted dBFS spectrum.
    Gate: SNR > 15 dB AND peak > -70 dBFS AND (peak - avg) > 3 dB, with the
    in-band window = bandwidth_hz around DC and the noise floor averaged from
    bins at least 10 away from the band edges.
    """
    center = n_fft // 2
    freq_res = sample_rate_hz / n_fft
    bw_bins = int(bandwidth_hz / freq_res)
    start = max(0, center - bw_bins // 2)
    end = min(n_fft, center + bw_bins // 2)

    band = power_db[..., start:end]
    signal_power = band.mean(axis=-1)
    peak_power = band.max(axis=-1)
    peak_local = jnp.argmax(band, axis=-1)
    peak_idx = start + peak_local
    freqs = jnp.asarray(fft_freqs(n_fft, sample_rate_hz), jnp.float32)
    afc = freqs[peak_idx]

    noise_parts = []
    if start - 10 > 0:
        noise_parts.append(power_db[..., : start - 10])
    if end + 10 < n_fft:
        noise_parts.append(power_db[..., end + 10:])
    if noise_parts:
        noise = jnp.concatenate(noise_parts, axis=-1).mean(axis=-1)
    else:
        noise = jnp.full(power_db.shape[:-1], -100.0, power_db.dtype)

    snr = signal_power - noise
    peak_above_avg = peak_power - signal_power
    present = ((snr > C.DETECT_SNR_DB)
               & (peak_power > C.DETECT_PEAK_DBFS)
               & (peak_above_avg > C.DETECT_PEAK_ABOVE_AVG_DB))
    return DetectionResult(present, signal_power, peak_power, noise, snr, afc)


def parabolic_peak(power_db: np.ndarray, freqs: np.ndarray,
                   lo_hz: float, hi_hz: float) -> float:
    """Sub-bin quadratic peak interpolation (modern.py:756-772).

    Host-side helper (small arrays): finds the max bin in [lo, hi] and refines
    with a three-point parabola, clamping the offset to +/-1 bin.
    """
    mask = (freqs >= lo_hz) & (freqs <= hi_hz)
    if not np.any(mask):
        return float((lo_hz + hi_hz) / 2)
    idxs = np.where(mask)[0]
    i = int(idxs[np.argmax(power_db[idxs])])
    if 0 < i < len(power_db) - 1:
        y1, y2, y3 = power_db[i - 1], power_db[i], power_db[i + 1]
        denom = y1 - 2 * y2 + y3
        if denom != 0:
            delta = float(np.clip(0.5 * (y1 - y3) / denom, -1.0, 1.0))
            x1, x2, x3 = freqs[i - 1], freqs[i], freqs[i + 1]
            step = float((x3 - x1) / 2.0) if x3 != x1 else float(x3 - x2)
            return float(x2 + delta * step)
    return float(freqs[i])


def estimate_grid_offset_hz(x: np.ndarray, sample_rate_hz: float,
                            spacing_hz: float = 25e3,
                            n_fft: int = 4096,
                            gate_db: float = 10.0,
                            channel_half_hz: float = 9e3) -> float:
    """Common frequency offset of the TETRA channel grid (hardware ppm).

    Multicarrier AFC: every active carrier sits on the spacing_hz grid
    shifted by ONE shared tuner error, so folding the average spectrum
    modulo the spacing and taking the power-weighted circular mean of the
    occupied bins recovers that shared offset — robust with any number of
    active carriers and no per-carrier tracking.  (The reference's GUI
    AFC, modern.py:5223-5257, tracks a single peak instead; this is the
    full-band analogue.)  Returns the offset in Hz, in
    [-spacing/2, spacing/2); subtract it (ops/ddc.frequency_shift with
    -offset) before channelizing on grid offsets.
    """
    import jax.numpy as jnp
    x = np.asarray(x)
    if len(x) < n_fft:
        return 0.0
    frames = np.asarray(spectrum_frames_dbfs(jnp.asarray(x), n_fft))
    if frames.size == 0:
        return 0.0
    avg_db = frames.mean(axis=0)                      # (n_fft,) dBFS
    freqs = fft_freqs(n_fft, sample_rate_hz)
    # gate: occupied bins stand gate_db above the median floor
    floor = np.median(avg_db)
    sel = avg_db > floor + gate_db
    if not np.any(sel):
        return 0.0
    w = 10.0 ** ((avg_db[sel] - avg_db[sel].max()) / 10.0)  # linear, peak=1
    # (normalized so the z-magnitude guard below is scale-free — absolute
    # levels can underflow when zero-padded silence drags the dB average)
    theta = 2.0 * np.pi * (freqs[sel] % spacing_hz) / spacing_hz
    # two-pass: modulation sidelobes (worst case: the rect-pulse synth's
    # sinc skirts) pass the gate at fold phases unrelated to the carrier
    # grid and bias a global circular mean by ~an FFT bin.  Anchor on the
    # strongest bin's fold phase (main-lobe peak), then average only bins
    # within half a channel of it — symmetric near-sidelobe pairs fold to
    # mirrored phases inside the window and cancel.
    phi0 = theta[np.argmax(w)]
    half = 2.0 * np.pi * (channel_half_hz / spacing_hz)
    d = np.angle(np.exp(1j * (theta - phi0)))         # circular distance
    keep = np.abs(d) <= half
    z = np.sum(w[keep] * np.exp(1j * theta[keep]))
    if abs(z) < 1e-12:
        return 0.0
    frac = np.angle(z) / (2.0 * np.pi)                # (-0.5, 0.5]
    off = frac * spacing_hz
    if off >= spacing_hz / 2:
        off -= spacing_hz
    return float(off)
