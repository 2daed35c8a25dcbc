"""Digital down-conversion: frequency shift (processor.py:85-100)."""

from __future__ import annotations

import jax.numpy as jnp


def frequency_shift(x: jnp.ndarray, freq_offset_hz, sample_rate_hz: float,
                    start_index=0) -> jnp.ndarray:
    """Multiply by exp(-j*2*pi*f*t) with t = (start_index + arange(N)) / fs.

    ``freq_offset_hz`` may be a traced scalar (AFC).  ``start_index`` lets a
    streaming caller keep oscillator phase continuous across blocks (the
    reference restarts t at 0 each chunk — pass 0 for ref parity).
    """
    n = x.shape[-1]
    t = (start_index + jnp.arange(n, dtype=jnp.float32)) / jnp.float32(sample_rate_hz)
    osc = jnp.exp(-2j * jnp.pi * jnp.asarray(freq_offset_hz, jnp.float32) * t)
    return (x * osc).astype(jnp.complex64)
