#!/usr/bin/env python3
"""Per-stage device timing of the multicarrier pipeline at bench scale.

Times each cumulative prefix of the 16-carrier program with sync-verified
digest pulls, so the per-stage cost (the difference between consecutive
prefixes) is real device time, not dispatch.  Run in a healthy window
(tools/tpu_health.py) — one UNIMPLEMENTED poisons the process.

Usage: python tools/tpu_profile_stages.py [--carriers 16] [--scale 2]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--carriers", type=int, default=16)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--budget", type=float, default=300.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # serialize against bench.py / bench_watch (single tunneled chip)
    from tetraear_tpu.utils.backend import device_measure_lock
    _lock = device_measure_lock(); _lock.__enter__()

    from tetraear_tpu.config import ReceiverConfig
    from tetraear_tpu.ops import ddc, dqpsk, fir, sync, timing
    from tetraear_tpu.ops import channelizer
    from tetraear_tpu.models.multicarrier import extract_candidates
    from tetraear_tpu.utils.backend import pull_with_watchdog, put_complex

    cfg = ReceiverConfig()
    step = cfg.decimation_factor * cfg.ref_samples_per_symbol
    n = (8000 * step * args.scale // 96) * 96
    decim, inter = cfg.decimation_factor, cfg.intermediate_rate_hz
    cutoff = (cfg.channel_bandwidth_hz / 2) / (inter / 2)
    taps_d = jnp.asarray(fir.design_decimation_fir(
        decim, cfg.decim_fir_taps_per_phase))
    taps_c = jnp.asarray(fir.design_channel_fir(cfg.channel_fir_taps,
                                                cutoff))
    rng = np.random.default_rng(0)
    offsets = ((np.arange(args.carriers) - args.carriers // 2) * 25e3
               ).astype(np.float32)
    x = put_complex(((rng.standard_normal(n) + 1j * rng.standard_normal(n))
                     * 0.1).astype(np.complex64))
    od = jax.device_put(jnp.asarray(offsets))

    def chain(k):
        def run(xc, offs):
            y = channelizer.mix_to_baseband(xc, offs, cfg.sample_rate_hz,
                                            start_index=jnp.int32(0))
            if k == 1:
                return jnp.sum(jnp.abs(y))
            y = fir.fir_decimate(y, taps_d, decim)
            if k == 2:
                return jnp.sum(jnp.abs(y))
            y = fir.fir_filter_same(y, taps_c)
            if k == 3:
                return jnp.sum(jnp.abs(y))
            ts = timing.best_phase_pick(y, cfg.ref_samples_per_symbol)
            if k == 4:
                return (jnp.sum(jnp.abs(ts.symbols))
                        + ts.count.sum().astype(jnp.float32))
            hard = dqpsk.demodulate_hard(ts.symbols, profile="ref")
            bits = dqpsk.symbols_to_bits(hard)
            if k == 5:
                return jnp.sum(bits.astype(jnp.float32))
            corr = sync.best_correlation(bits)
            if k == 6:
                return jnp.sum(corr)
            valid_bits = jnp.maximum(ts.count - 1, 0) * 2
            pos, ccorr, valid, frames, crc_ok = extract_candidates(
                bits, corr, valid_bits, 64, 0.80)
            return (jnp.sum(ccorr) + jnp.sum(crc_ok.astype(jnp.float32))
                    + jnp.sum(valid.astype(jnp.float32)))
        return jax.jit(run)

    names = ["ddc_bank(mixer)", "+fir_decimate", "+channel_fir",
             "+best_phase_pick", "+demod+bits", "+sync_corr",
             "+candidates+crc"]
    prev = 0.0
    for k, name in enumerate(names, start=1):
        fn = chain(k)
        try:
            pull_with_watchdog(lambda: float(np.asarray(fn(x, od))),
                               timeout_s=args.budget, what=name)  # compile
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = fn(x, od)
            v = pull_with_watchdog(lambda: float(np.asarray(out)),
                                   timeout_s=args.budget, what=name)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:22s} {dt*1e3:8.1f} ms/blk  (+{(dt-prev)*1e3:7.1f} "
                  f"ms stage)  -> {n/dt/1e6:7.1f} MS/s  digest={v:.1f}",
                  flush=True)
            prev = dt
        except Exception as e:
            print(f"{name:22s} FAIL {str(e).splitlines()[0][:70]}",
                  flush=True)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
