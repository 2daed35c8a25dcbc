"""Pod-scale sharded receive step (BASELINE config 5).

The full multi-carrier pipeline under `shard_map` over a (carrier, time)
mesh:

* wideband IQ is sharded along `time` (replicated over `carrier`);
* carrier offsets are sharded along `carrier`;
* each shard extends its block with overlap-save halos exchanged via
  `ppermute` (parallel/halo.py), so filtering/timing/demod on the shard
  interior is *identical* to the unsharded program;
* per-carrier symbol-timing metrics are `psum`-ed over the time axis so
  every time shard picks the same (global) sampling phase — the reference's
  whole-block argmax (processor.py:186-215) done as a collective;
* the differential demod's previous-symbol state crosses shard boundaries
  with a single-element ppermute carry (processor.py:131 state, SURVEY §5.7);
* outputs come back sharded: each time shard emits its extended bit/score
  segment; the host (or a later device stage) stitches by dropping halo
  overlap.

Shard-size contract: the local block length T and halo H must be multiples
of decim*sps (130 at reference rates) so the decimation grid and symbol
phase grid stay globally aligned across shards.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tetraear_tpu.config import ReceiverConfig
from tetraear_tpu.ops import channelizer, dqpsk, fir, sync
from tetraear_tpu.parallel.halo import extend_with_halo, carry_last
from tetraear_tpu.parallel.mesh import CARRIER_AXIS, TIME_AXIS


class ShardedResult(NamedTuple):
    bits: jnp.ndarray        # (C, n_time, B_ext) uint8 — extended segments
    sync_corr: jnp.ndarray   # (C, n_time, B_ext-21) float32
    best_phase: jnp.ndarray  # (C, n_time) int32 (same value on every shard)


def _shard_step(x_local: jnp.ndarray, offsets_local: jnp.ndarray,
                cfg: ReceiverConfig, halo: int):
    """Runs on one device: (T,) local wideband + (C_local,) offsets."""
    decim = cfg.decimation_factor
    sps = cfg.ref_samples_per_symbol
    t_local = x_local.shape[-1]
    assert t_local % (decim * sps) == 0 and halo % (decim * sps) == 0

    taps_d = jnp.asarray(fir.design_decimation_fir(
        decim, cfg.decim_fir_taps_per_phase))
    cutoff = (cfg.channel_bandwidth_hz / 2) / (cfg.intermediate_rate_hz / 2)
    taps_c = jnp.asarray(fir.design_channel_fir(cfg.channel_fir_taps, cutoff))

    # --- overlap-save: pull neighbour samples, keep mixer phase global ----
    ext = extend_with_halo(x_local, halo, halo, TIME_AXIS)     # (T+2H,)
    t_idx = lax.axis_index(TIME_AXIS)
    global_start = t_idx.astype(jnp.int32) * t_local - halo

    y = channelizer.channelize(ext, offsets_local, cfg.sample_rate_hz,
                               decim, taps=taps_d, start_index=global_start)
    y = fir.fir_filter_same(y, taps_c)                          # (Cl, (T+2H)/D)

    # --- global best-phase: psum per-carrier phase power over time --------
    h_dec = halo // decim
    interior = y[:, h_dec:h_dec + t_local // decim]
    m_int = interior.shape[-1] // sps
    grid = interior[:, :m_int * sps].reshape(interior.shape[0], m_int, sps)
    phase_power = jnp.sum(jnp.abs(grid) ** 2, axis=1)           # (Cl, sps)
    phase_power = lax.psum(phase_power, TIME_AXIS)
    best = jnp.argmax(phase_power, axis=-1).astype(jnp.int32)   # (Cl,)

    # --- extract symbols on the global grid over the extended block ------
    ext_dec_len = y.shape[-1]
    m_ext = ext_dec_len // sps - 1
    idx = best[:, None] + jnp.arange(m_ext, dtype=jnp.int32)[None, :] * sps
    symbols = jnp.take_along_axis(y, idx, axis=-1)              # (Cl, M_ext)

    # --- differential demod with cross-shard previous-symbol carry -------
    # halo regions already overlap neighbours, so the extended segment's
    # first symbol has in-block context except on the stream's first shard;
    # carry_last additionally wires exact symbol state for pipeline modes.
    prev = carry_last(symbols, TIME_AXIS)                       # (Cl,)
    seeded = jnp.concatenate([prev[:, None], symbols], axis=-1)
    hard_all = dqpsk.demodulate_hard(seeded, profile="ref")     # (Cl, M_ext)
    hard = hard_all[:, 1:]                                      # drop seed diff
    bits = dqpsk.symbols_to_bits(hard)                          # (Cl, 2*(M_ext-1))
    corr = sync.best_correlation(bits)

    return (bits[:, None, :], corr[:, None, :],
            jnp.broadcast_to(best[:, None], (best.shape[0], 1)))


def build_sharded_step(mesh: Mesh, cfg: ReceiverConfig | None = None,
                       halo: int | None = None):
    """Compile the full sharded receive step for `mesh`.

    Returns fn(x, offsets) with x: (T_total,) complex64 (T_total divisible
    by n_time * decim * sps) and offsets: (C,) float32 (C divisible by
    n_carrier).
    """
    cfg = cfg or ReceiverConfig()
    step = cfg.decimation_factor * cfg.ref_samples_per_symbol
    if halo is None:
        # cover both FIR group delays + ~128 symbols of sync/frame span
        halo = 132 * step
    assert halo % step == 0

    fn = jax.shard_map(
        functools.partial(_shard_step, cfg=cfg, halo=halo),
        mesh=mesh,
        in_specs=(P(TIME_AXIS), P(CARRIER_AXIS)),
        out_specs=(P(CARRIER_AXIS, TIME_AXIS, None),
                   P(CARRIER_AXIS, TIME_AXIS, None),
                   P(CARRIER_AXIS, TIME_AXIS)),
        check_vma=False,
    )

    @jax.jit
    def run(x, offsets):
        return ShardedResult(*fn(x, offsets))

    return run


def shard_inputs(mesh: Mesh, x: np.ndarray, offsets: np.ndarray):
    """Device_put the inputs with the layout build_sharded_step expects."""
    xs = jax.device_put(jnp.asarray(x, jnp.complex64),
                        NamedSharding(mesh, P(TIME_AXIS)))
    offs = jax.device_put(jnp.asarray(offsets, jnp.float32),
                          NamedSharding(mesh, P(CARRIER_AXIS)))
    return xs, offs
