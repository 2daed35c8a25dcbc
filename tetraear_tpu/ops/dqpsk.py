"""pi/4-DQPSK differential demodulation (processor.py:102-166).

Two quantizers:

``quantize_phase_ref`` — the reference's bins (processor.py:152-161),
reproduced verbatim for `ref-compat` conformance:

    dphi < -5pi/8          -> 3   (bits 1,1)
    -5pi/8 <= dphi < -3pi/8 -> 2  (bits 1,0)
    -3pi/8 <= dphi <  3pi/8 -> 0  (bits 0,0)
     3pi/8 <= dphi <  5pi/8 -> 1  (bits 0,1)
     dphi >= 5pi/8          -> 3  (wrap)

NOTE (documented quirk, SURVEY.md §7): these bins are centered on
{0, +-pi/2, pi} rather than on the pi/4-DQPSK transition set
{+-pi/4, +-3pi/4}, so an *ideal* TETRA signal has its -pi/4 transitions
misread as symbol 0 and +3pi/4 as symbol 3.  `ref-compat` must keep this.

``quantize_phase_etsi`` — maximum-margin boundaries at {0, +-pi/2, pi}
relative to the true transition set (used by the `etsi` profile and
consistent with the soft-bit signs):

    sign(dphi) selects the MSB, |dphi| vs pi/2 selects the LSB.

The reference's per-sample Python loop becomes one vectorized pass:
z[n] = x[n] * conj(x[n-1]), dphi = atan2(Im z, Re z), then threshold.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

_B0, _B1, _B2, _B3 = (-5 * np.pi / 8, -3 * np.pi / 8, 3 * np.pi / 8, 5 * np.pi / 8)


def differential_phase(symbols: jnp.ndarray) -> jnp.ndarray:
    """dphi[n] = angle(x[n+1] * conj(x[n])); length N-1 along last axis."""
    z = symbols[..., 1:] * jnp.conj(symbols[..., :-1])
    return jnp.arctan2(jnp.imag(z), jnp.real(z))


def quantize_phase_ref(dphi: jnp.ndarray) -> jnp.ndarray:
    """Map phase differences to dibit symbols 0..3 per the reference bins
    (processor.py:152-161; see module quirk note)."""
    sym = jnp.full(dphi.shape, 3, dtype=jnp.uint8)
    sym = jnp.where((dphi >= _B0) & (dphi < _B1), jnp.uint8(2), sym)
    sym = jnp.where((dphi >= _B1) & (dphi < _B2), jnp.uint8(0), sym)
    sym = jnp.where((dphi >= _B2) & (dphi < _B3), jnp.uint8(1), sym)
    return sym


def quantize_phase_etsi(dphi: jnp.ndarray) -> jnp.ndarray:
    """Maximum-margin quantizer for true pi/4-DQPSK transitions."""
    msb = (dphi < 0).astype(jnp.uint8)
    lsb = (jnp.abs(dphi) > jnp.pi / 2).astype(jnp.uint8)
    return (msb * 2 + lsb).astype(jnp.uint8)


# backward-compatible alias: the "reference bins" quantizer
quantize_phase = quantize_phase_ref

# tan(3pi/8) = 1 + sqrt(2); tan(pi/8) = sqrt(2) - 1
_T38 = 1.0 + np.sqrt(2.0)
_T18 = np.sqrt(2.0) - 1.0


def quantize_z_ref(zr: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
    """Reference-bin quantizer directly from z = x[n]*conj(x[n-1]) real/imag
    parts — sector comparisons instead of atan2 (transcendental-free; also
    the path for backends without complex support):

        bin 0: |phi| <  3pi/8  <=>  zr > 0  and |zi| <= zr*tan(3pi/8)
        bin 1: |phi - pi/2| < pi/8  <=>  zi > 0 and |zr| < zi*tan(pi/8)
        bin 2: |phi + pi/2| < pi/8  <=>  zi < 0 and |zr| < -zi*tan(pi/8)
        bin 3: otherwise (the reference's wrap-to-3 behavior included)
    """
    azr = jnp.abs(zr)
    azi = jnp.abs(zi)
    s0 = (zr > 0) & (azi <= zr * _T38)
    s1 = (zi > 0) & (azr < zi * _T18)
    s2 = (zi < 0) & (azr < -zi * _T18)
    sym = jnp.full(zr.shape, 3, jnp.uint8)
    sym = jnp.where(s2, jnp.uint8(2), sym)
    sym = jnp.where(s1, jnp.uint8(1), sym)
    sym = jnp.where(s0, jnp.uint8(0), sym)
    return sym


def quantize_z_etsi(zr: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
    """Maximum-margin quantizer from z parts: boundaries at {0, +-pi/2, pi}
    reduce to pure sign tests (msb = zi<0, lsb = zr<0)."""
    msb = (zi < 0).astype(jnp.uint8)
    lsb = (zr < 0).astype(jnp.uint8)
    return (msb * 2 + lsb).astype(jnp.uint8)


def demodulate_hard(symbols: jnp.ndarray, profile: str = "ref") -> jnp.ndarray:
    """Hard-decision demod: complex symbol stream -> uint8 dibits (len N-1).

    The reference normalizes by max |x| first (processor.py:124-127); that is
    phase-invariant so decisions are unaffected and we skip it.
    """
    dphi = differential_phase(symbols)
    if profile == "etsi":
        return quantize_phase_etsi(dphi)
    return quantize_phase_ref(dphi)


class SoftDemod(NamedTuple):
    symbols: jnp.ndarray     # uint8 hard decisions
    dphi: jnp.ndarray        # raw phase differences (radians)
    magnitude: jnp.ndarray   # |z| — confidence proxy
    soft_bits: jnp.ndarray   # (..., N-1, 2) float32 in [-1, 1], +1 == bit 1


def demodulate_soft(symbols: jnp.ndarray) -> SoftDemod:
    """Soft-output demod for the `etsi` profile / voice soft bits.

    Soft bit definition: with dphi in (-pi, pi],
      msb = -sin(dphi - 0) style LLR approximations:
        bit1 (MSB) distinguishes {2,3} (dphi<0) from {0,1} (dphi>0)
        bit0 (LSB) distinguishes {1,3} (|dphi|>pi/2) from {0,2} (|dphi|<pi/2)
    """
    z = symbols[..., 1:] * jnp.conj(symbols[..., :-1])
    dphi = jnp.arctan2(jnp.imag(z), jnp.real(z))
    mag = jnp.abs(z)
    hard = quantize_phase_etsi(dphi)
    msb = -jnp.sin(dphi)          # >0 when dphi<0 (bits 1x)
    lsb = -jnp.cos(dphi)          # >0 when |dphi|>pi/2 (bits x1)
    soft = jnp.stack([msb, lsb], axis=-1).astype(jnp.float32)
    return SoftDemod(hard, dphi.astype(jnp.float32),
                     mag.astype(jnp.float32), soft)


def symbols_to_bits(symbols: jnp.ndarray) -> jnp.ndarray:
    """Dibits 0..3 -> interleaved bit stream (MSB first), device-side.

    Matches decoder.py:140-169 for the 0-3 input format (the live path; the
    0-7 8-PSK fold only triggers on legacy inputs and lives host-side in
    core/decoder.py).
    """
    s = symbols.astype(jnp.int32) & 3
    bits = jnp.stack([(s >> 1) & 1, s & 1], axis=-1)
    return bits.reshape(*s.shape[:-1], s.shape[-1] * 2).astype(jnp.uint8)
