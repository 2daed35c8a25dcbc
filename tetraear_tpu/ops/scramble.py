"""TETRA scrambling (ETSI EN 300 392-2 §8.2.5).

The scrambling sequence comes from a 32-bit LFSR whose taps are the TETRA
polynomial; the initial state is the 30-bit extended colour code (MCC 10 |
MNC 14 | colour code 6) prefixed with two 1-bits.  BSCH uses the all-zeros
colour code (plus the prefix).

Sequence generation is sequential -> precomputed host-side per seed
(cached) and XORed on device; descrambling == scrambling.

The reference implements no scrambling at all (its protocol parser operates
on raw bits, protocol.py:300 "we do not do full channel decoding"); this is
part of the `etsi` profile's full-chain capability.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# Feedback taps of the TETRA scrambler polynomial (degree 32): the new bit
# is the XOR of these state positions (1-indexed exponents of p(x)).
_TAPS = (32, 26, 23, 22, 16, 12, 11, 10, 8, 7, 5, 4, 2, 1)


def extended_colour_code(mcc: int, mnc: int, colour_code: int) -> int:
    """30-bit extended colour code: MCC(10) | MNC(14) | CC(6)."""
    return ((mcc & 0x3FF) << 20) | ((mnc & 0x3FFF) << 6) | (colour_code & 0x3F)


@functools.lru_cache(maxsize=256)
def scrambling_sequence(ecc30: int, length: int) -> np.ndarray:
    """Generate `length` scrambling bits for a 30-bit extended colour code.

    LFSR state p[1..32] = [e1..e30, 1, 1]; output bit = p[32] each step;
    feedback = XOR of tap positions.
    """
    state = [(ecc30 >> (29 - i)) & 1 for i in range(30)] + [1, 1]
    out = np.empty(length, dtype=np.uint8)
    for n in range(length):
        out[n] = state[31]
        fb = 0
        for t in _TAPS:
            fb ^= state[t - 1]
        state = [fb] + state[:31]
    return out


def scramble(bits: jnp.ndarray, ecc30: int = 0) -> jnp.ndarray:
    """XOR bits (..., N) with the scrambling sequence (device op).

    ecc30=0 gives the BSCH/broadcast sequence (colour code unknown)."""
    seq = jnp.asarray(scrambling_sequence(ecc30, bits.shape[-1]))
    return (bits ^ seq).astype(bits.dtype)


descramble = scramble  # XOR is its own inverse


def scramble_soft(llrs: jnp.ndarray, ecc30: int = 0) -> jnp.ndarray:
    """Descramble soft bits: flip LLR sign where the sequence bit is 1."""
    seq = jnp.asarray(scrambling_sequence(ecc30, llrs.shape[-1]).astype(np.float32))
    return llrs * (1.0 - 2.0 * seq)
