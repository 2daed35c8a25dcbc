"""TETRA block interleaving (ETSI EN 300 392-2 §8.2.4).

Block interleaver over K bits: output position i carries input position
k(i) = (a * i) mod K (1-indexed in the spec; 0-indexed here with the same
residue structure).  Standard (K, a) pairs:

    BSCH        K=120,  a=11
    SCH/HD, BNCH, STCH  K=216, a=101
    SCH/F       K=432,  a=103
    TCH/4.8,7.2 use an additional N-block inter-burst interleaver (not yet
    implemented; single-burst path covers control/signalling channels).

Interleave/de-interleave are pure gathers with precomputed index vectors —
free on TPU (fused into surrounding ops by XLA).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

BLOCK_PARAMS = {
    "BSCH": (120, 11),
    "SCH/HD": (216, 101),
    "BNCH": (216, 101),
    "STCH": (216, 101),
    "SCH/F": (432, 103),
}


@functools.lru_cache(maxsize=32)
def _perm(k: int, a: int) -> np.ndarray:
    """perm[i] = source index of interleaved position i.

    Spec (1-indexed): b(i) = c(k) with i = (a*k) mod K ... equivalently the
    interleaved stream at position (a*k) mod K holds input bit k."""
    i = (a * (np.arange(k, dtype=np.int64) + 1)) % k      # spec arithmetic
    perm = np.empty(k, dtype=np.int64)
    perm[i] = np.arange(k)
    return perm


@functools.lru_cache(maxsize=32)
def _inv_perm(k: int, a: int) -> np.ndarray:
    perm = _perm(k, a)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(k)
    return inv


def interleave(bits: jnp.ndarray, channel: str = "SCH/F") -> jnp.ndarray:
    k, a = BLOCK_PARAMS[channel]
    assert bits.shape[-1] == k, (bits.shape, k)
    return bits[..., jnp.asarray(_perm(k, a))]


def deinterleave(bits: jnp.ndarray, channel: str = "SCH/F") -> jnp.ndarray:
    k, a = BLOCK_PARAMS[channel]
    assert bits.shape[-1] == k, (bits.shape, k)
    return bits[..., jnp.asarray(_inv_perm(k, a))]
