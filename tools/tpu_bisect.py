#!/usr/bin/env python3
"""Bisect which pipeline stage trips the remote backend's UNIMPLEMENTED.

Trivial programs execute on this container's axon backend while the
receive pipeline fails with a bare `UNIMPLEMENTED: TPU backend error`
(no diagnostics).  This tool runs the single-carrier chain cumulatively,
stage by stage, each ending in a watchdogged f32 scalar-digest pull (the
only real sync on this backend; complex D2H is itself UNIMPLEMENTED), so
the first failing stage names the offending op class.

Usage: python tools/tpu_bisect.py [--n 266240] [--budget 120]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048 * 130)
    ap.add_argument("--budget", type=float, default=120.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tetraear_tpu.config import ReceiverConfig
    from tetraear_tpu.ops import ddc, dqpsk, fir, sync, timing
    from tetraear_tpu.utils.backend import (device_measure_lock,
                                            pull_with_watchdog)

    # serialize against bench.py / bench_watch (single tunneled chip)
    _lock = device_measure_lock()
    _lock.__enter__()

    cfg = ReceiverConfig()
    decim = cfg.decimation_factor
    inter_rate = cfg.intermediate_rate_hz
    cutoff = (cfg.channel_bandwidth_hz / 2) / (inter_rate / 2)
    taps_d = jnp.asarray(fir.design_decimation_fir(
        decim, cfg.decim_fir_taps_per_phase))
    taps_c = jnp.asarray(fir.design_channel_fir(cfg.channel_fir_taps, cutoff))

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(args.n) + 1j * rng.standard_normal(args.n)
         ).astype(np.complex64) * 0.1

    def stage(name, fn):
        """jit fn, run on the default backend, digest-pull under watchdog."""
        try:
            g = jax.jit(lambda a: fn(a))
            out = g(jnp.asarray(x))
            leaves = jax.tree_util.tree_leaves(out)
            digs = []
            for lv in leaves:
                lv = lv if hasattr(lv, "dtype") else jnp.asarray(lv)
                if jnp.issubdtype(lv.dtype, jnp.complexfloating):
                    digs.append(jnp.sum(jnp.abs(lv)).astype(jnp.float32))
                else:
                    digs.append(jnp.sum(lv.astype(jnp.float32)))
            dig = jax.jit(lambda *d: sum(d))(*digs)
            v = pull_with_watchdog(lambda: float(np.asarray(dig)),
                                   timeout_s=args.budget, what=name)
            print(f"OK    {name:28s} digest={v:.4f}", flush=True)
            return True
        except Exception as e:
            print(f"FAIL  {name:28s} {str(e).splitlines()[0][:90]}",
                  flush=True)
            return False

    def chain_to(k):
        """Cumulative pipeline prefix of depth k."""
        def run(a):
            y = fir.fir_decimate(a, taps_d, decim) if k >= 1 else a
            if k >= 2:
                y = ddc.frequency_shift(y, jnp.float32(3e3), inter_rate)
            if k >= 3:
                y = fir.fir_filter_same(y, taps_c)
            if k == 3.5:
                return y
            ts = timing.best_phase_pick(y, cfg.ref_samples_per_symbol) \
                if k >= 4 else None
            if k == 4:
                return ts
            hard = dqpsk.demodulate_hard(ts.symbols, profile="ref") \
                if k >= 5 else None
            if k == 5:
                return hard
            bits = dqpsk.symbols_to_bits(hard)
            if k == 6:
                return bits
            return sync.best_correlation(bits)
        return run

    stage("h2d_identity", lambda a: a)
    stage("abs_sum_only", lambda a: jnp.sum(jnp.abs(a)))
    for k, name in [(1, "fir_decimate"), (2, "+freq_shift"),
                    (3, "+fir_filter_same"), (4, "+best_phase_pick"),
                    (5, "+demod_hard"), (6, "+symbols_to_bits"),
                    (7, "+sync_correlation")]:
        stage(f"chain{k}_{name}", chain_to(k))

    # isolated op probes for whatever failed above
    y0 = np.asarray((rng.standard_normal(args.n // decim)
                     + 1j * rng.standard_normal(args.n // decim))
                    ).astype(np.complex64)
    stage("iso_conv_valid", lambda a: jnp.convolve(
        jnp.abs(a[: args.n // decim]), jnp.abs(taps_c), mode="valid"))
    stage("iso_exp_mix", lambda a: jnp.sum(jnp.abs(
        a * jnp.exp(-2j * jnp.pi * 3e3
                    * jnp.arange(a.shape[0]) / inter_rate))))
    stage("iso_argmax", lambda a: jnp.argmax(jnp.abs(a)).astype(jnp.float32))
    stage("iso_reshape_strided", lambda a: jnp.sum(jnp.abs(
        a[: (a.shape[0] // 130) * 130].reshape(-1, 130)[:, 0])))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
